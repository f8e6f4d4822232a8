"""Column expressions: a small analyzable AST for the lazy query planner.

``col("v") * 2 > col("lo")`` builds an :class:`Expr` tree instead of
computing anything. The tree knows two things a raw lambda cannot tell us:

  - ``columns``: exactly which columns it reads — what makes projection
    pruning through the logical plan (``plan.py``) possible, the optimizer
    lever that actually matters on this engine (every relational operator
    is one variadic sort whose cost is proportional to the number of
    operand words it carries; see ``plan.py``'s cost model);
  - ``evaluate(table)``: how to compute it, elementwise ``jnp`` ops over
    the named columns — identical semantics eager (``Table``) and sharded
    (``DistTable``: elementwise ops map over shards untouched).

The surface is deliberately closed (literals, columns, arithmetic,
comparisons, boolean algebra, ``where``, ``cast``, scalar math
(``abs/floor/ceil/round/sign/sqrt/exp/log*/pow``), ``like`` over
string columns, and an explicit ``udf`` escape hatch that still declares
its column reads) so every node stays analyzable and printable by
``LazyTable.explain()``.

The reference crate has no expression layer (it is sort-only,
src/radix_sort/mod.rs); this belongs to the north-star query-engine
surface (BASELINE.json).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["Expr", "col", "lit", "where", "udf"]

# binary op name -> (callable, printable symbol)
_BINOPS = {
    "add": (lambda a, b: a + b, "+"),
    "sub": (lambda a, b: a - b, "-"),
    "mul": (lambda a, b: a * b, "*"),
    "truediv": (lambda a, b: a / b, "/"),
    "floordiv": (lambda a, b: a // b, "//"),
    "mod": (lambda a, b: a % b, "%"),
    "eq": (lambda a, b: a == b, "=="),
    "ne": (lambda a, b: a != b, "!="),
    "lt": (lambda a, b: a < b, "<"),
    "le": (lambda a, b: a <= b, "<="),
    "gt": (lambda a, b: a > b, ">"),
    "ge": (lambda a, b: a >= b, ">="),
    "and": (lambda a, b: a & b, "&"),
    "or": (lambda a, b: a | b, "|"),
    "xor": (lambda a, b: a ^ b, "^"),
    "lshift": (lambda a, b: a << b, "<<"),
    "rshift": (lambda a, b: a >> b, ">>"),
    "min": (jnp.minimum, "min"),
    "max": (jnp.maximum, "max"),
    "pow": (jnp.power, "pow"),
}

_UNOPS = {
    "neg": (lambda a: -a, "-"),
    "invert": (lambda a: ~a, "~"),
    "abs": (jnp.abs, "abs"),
    "floor": (jnp.floor, "floor"),
    "ceil": (jnp.ceil, "ceil"),
    # round-half-to-even (IEEE default), like np.round — SQL dialects vary
    "round": (jnp.round, "round"),
    "sign": (jnp.sign, "sign"),
    "sqrt": (jnp.sqrt, "sqrt"),
    "exp": (jnp.exp, "exp"),
    "log": (jnp.log, "log"),
    "log10": (jnp.log10, "log10"),
    "log2": (jnp.log2, "log2"),
}


class Expr:
    """One node of a column-expression tree.

    ``kind`` is one of ``col | lit | bin | un | cast | where | udf``;
    ``args`` holds the operands (child ``Expr`` nodes and/or python
    values). Build trees with :func:`col` / :func:`lit` and operators —
    never construct nodes directly.
    """

    __slots__ = ("kind", "args")

    def __init__(self, kind, args):
        self.kind = kind
        self.args = tuple(args)

    # -- analysis ---------------------------------------------------------

    @property
    def columns(self) -> frozenset:
        """Names of every column this expression reads."""
        if self.kind == "col":
            return frozenset((self.args[0],))
        if self.kind == "lit":
            return frozenset()
        if self.kind == "udf":
            return frozenset(self.args[2])
        out = frozenset()
        for a in self.args:
            if isinstance(a, Expr):
                out |= a.columns
        return out

    def rename(self, mapping) -> "Expr":
        """The same expression reading renamed columns (for pushing
        filters through ``rename`` nodes)."""
        if self.kind == "col":
            return Expr("col", (mapping.get(self.args[0], self.args[0]),))
        if self.kind == "lit":
            return self
        if self.kind == "udf":
            fn, label, cols = self.args
            return Expr("udf", (fn, label,
                                tuple(mapping.get(c, c) for c in cols)))
        return Expr(
            self.kind,
            tuple(a.rename(mapping) if isinstance(a, Expr) else a
                  for a in self.args),
        )

    # -- evaluation -------------------------------------------------------

    def evaluate(self, table):
        """Compute against anything supporting ``table[name]``."""
        k = self.kind
        if k == "col":
            return table[self.args[0]]
        if k == "lit":
            return self.args[0]
        if k == "bin":
            op, a, b = self.args
            if op not in _COMPARES:
                _reject_string_arith(op, (a, b), table)
            op, av, bv = _resolve_string_compare(op, a, b, table)
            return _BINOPS[op][0](av, bv)
        if k == "un":
            op, a = self.args
            _reject_string_arith(op, (a,), table)
            return _UNOPS[op][0](_ev(a, table))
        if k == "cast":
            a, dt = self.args
            return _ev(a, table).astype(dt)
        if k == "where":
            c, a, b = self.args
            return jnp.where(_ev(c, table), _ev(a, table), _ev(b, table))
        if k == "udf":
            fn, _, cols = self.args
            return fn(*(table[c] for c in cols))
        if k == "like":
            a, pattern = self.args
            name = _str_col_name(a, table)
            if name is None:
                raise TypeError(
                    f"LIKE requires a string column, got {a!r} (numeric "
                    f"columns and computed expressions have no character "
                    f"patterns)"
                )
            from radix_sort_tpu import strings as S
            # the pattern evaluates on the host vocabulary; on device the
            # predicate is one gather of the per-code mask
            mask = S.like_mask(table.dictionary(name), pattern)
            return jnp.asarray(mask)[table[name]]
        raise AssertionError(f"unknown Expr kind {k!r}")

    # -- operators --------------------------------------------------------

    def _bin(self, op, other, swap=False):
        other = other if isinstance(other, Expr) else lit(other)
        a, b = (other, self) if swap else (self, other)
        return Expr("bin", (op, a, b))

    def __add__(self, o):
        return self._bin("add", o)

    def __radd__(self, o):
        return self._bin("add", o, swap=True)

    def __sub__(self, o):
        return self._bin("sub", o)

    def __rsub__(self, o):
        return self._bin("sub", o, swap=True)

    def __mul__(self, o):
        return self._bin("mul", o)

    def __rmul__(self, o):
        return self._bin("mul", o, swap=True)

    def __truediv__(self, o):
        return self._bin("truediv", o)

    def __rtruediv__(self, o):
        return self._bin("truediv", o, swap=True)

    def __floordiv__(self, o):
        return self._bin("floordiv", o)

    def __rfloordiv__(self, o):
        return self._bin("floordiv", o, swap=True)

    def __mod__(self, o):
        return self._bin("mod", o)

    def __rmod__(self, o):
        return self._bin("mod", o, swap=True)

    def __lshift__(self, o):
        return self._bin("lshift", o)

    def __rshift__(self, o):
        return self._bin("rshift", o)

    def __eq__(self, o):  # noqa: D105 — Expr equality builds a node
        return self._bin("eq", o)

    def __ne__(self, o):
        return self._bin("ne", o)

    def __lt__(self, o):
        return self._bin("lt", o)

    def __le__(self, o):
        return self._bin("le", o)

    def __gt__(self, o):
        return self._bin("gt", o)

    def __ge__(self, o):
        return self._bin("ge", o)

    def __and__(self, o):
        return self._bin("and", o)

    def __rand__(self, o):
        return self._bin("and", o, swap=True)

    def __or__(self, o):
        return self._bin("or", o)

    def __ror__(self, o):
        return self._bin("or", o, swap=True)

    def __xor__(self, o):
        return self._bin("xor", o)

    def __rxor__(self, o):
        return self._bin("xor", o, swap=True)

    def __neg__(self):
        return Expr("un", ("neg", self))

    def __invert__(self):
        return Expr("un", ("invert", self))

    def __hash__(self):  # __eq__ is overloaded; hash by identity
        return id(self)

    def __bool__(self):
        raise TypeError(
            "an Expr has no truth value (it is a deferred column "
            "expression); combine predicates with & | ~, not and/or/not"
        )

    def abs(self) -> "Expr":
        return Expr("un", ("abs", self))

    def floor(self) -> "Expr":
        return Expr("un", ("floor", self))

    def ceil(self) -> "Expr":
        return Expr("un", ("ceil", self))

    def round(self) -> "Expr":
        """Round half-to-even (np.round semantics)."""
        return Expr("un", ("round", self))

    def sign(self) -> "Expr":
        return Expr("un", ("sign", self))

    def sqrt(self) -> "Expr":
        return Expr("un", ("sqrt", self))

    def exp(self) -> "Expr":
        return Expr("un", ("exp", self))

    def log(self) -> "Expr":
        """Natural logarithm."""
        return Expr("un", ("log", self))

    def log10(self) -> "Expr":
        return Expr("un", ("log10", self))

    def log2(self) -> "Expr":
        return Expr("un", ("log2", self))

    def pow(self, o) -> "Expr":
        return self._bin("pow", o)

    def __pow__(self, o):
        return self._bin("pow", o)

    def __rpow__(self, o):
        return self._bin("pow", o, swap=True)

    def cast(self, dtype) -> "Expr":
        return Expr("cast", (self, np.dtype(dtype)))

    def minimum(self, o) -> "Expr":
        return self._bin("min", o)

    def maximum(self, o) -> "Expr":
        return self._bin("max", o)

    def like(self, pattern: str) -> "Expr":
        """SQL LIKE over a dictionary-encoded string column: ``%`` = any
        run, ``_`` = one char, backslash escapes. Evaluates against the
        host-side vocabulary; one mask gather on device."""
        return Expr("like", (self, str(pattern)))

    def isin(self, values) -> "Expr":
        """Membership in a small static value list (ORed equalities)."""
        vals = list(values)
        if not vals:
            return lit(False)
        out = self == vals[0]
        for v in vals[1:]:
            out = out | (self == v)
        return out

    # -- display ----------------------------------------------------------

    def __repr__(self):
        k = self.kind
        if k == "col":
            return f"col({self.args[0]!r})"
        if k == "lit":
            return repr(self.args[0])
        if k == "bin":
            op, a, b = self.args
            sym = _BINOPS[op][1]
            if sym in ("min", "max", "pow"):
                return f"{sym}({a!r}, {b!r})"
            return f"({a!r} {sym} {b!r})"
        if k == "un":
            op, a = self.args
            sym = _UNOPS[op][1]
            return f"{sym}{a!r}" if sym in ("-", "~") else f"{sym}({a!r})"
        if k == "cast":
            a, dt = self.args
            return f"{a!r}.cast({dt.name})"
        if k == "where":
            c, a, b = self.args
            return f"where({c!r}, {a!r}, {b!r})"
        if k == "udf":
            _, label, cols = self.args
            return f"udf({label}, columns={sorted(cols)})"
        if k == "like":
            a, pattern = self.args
            return f"{a!r}.like({pattern!r})"
        return f"Expr({k})"


def _ev(x, table):
    return x.evaluate(table) if isinstance(x, Expr) else x


# mirrored comparison for swapping operand order: lit OP col == col OP' lit
_MIRROR = {"eq": "eq", "ne": "ne", "lt": "gt", "le": "ge",
           "gt": "lt", "ge": "le"}
_COMPARES = frozenset(_MIRROR)


def _str_col_name(x, table):
    """Column name if ``x`` is col() of a string column of ``table``."""
    if (isinstance(x, Expr) and x.kind == "col"
            and getattr(table, "is_string", lambda n: False)(x.args[0])):
        return x.args[0]
    return None


def _is_str_lit(x):
    return (isinstance(x, Expr) and x.kind == "lit"
            and isinstance(x.args[0], (str, bytes)))


def _reject_string_arith(op, operands, table):
    """Arithmetic/bit ops over dictionary-encoded string columns would
    silently compute on uint32 codes; refuse (mirrors the mixed-operand
    check in :func:`_resolve_string_compare`)."""
    for x in operands:
        name = _str_col_name(x, table)
        if name is not None:
            raise TypeError(
                f"operator {op!r} is not defined for string column "
                f"{name!r} (it would compute on dictionary codes, not "
                f"string values); only comparisons against str literals "
                f"or other string columns are supported"
            )


def _resolve_string_compare(op, a, b, table):
    """Make comparisons over dictionary-encoded string columns correct.

    col(s) OP "literal": the literal resolves against the column's sorted
    vocabulary — equality via code lookup (absent values equal nothing);
    ordering via the literal's boundary rank (code < left-rank <=> value <
    literal; side/op adjust for <=/>). col(s1) OP col(s2): the two
    vocabularies unify and both code columns remap so one code space
    carries the total order. Everything else evaluates untouched."""
    if op in _COMPARES and _is_str_lit(a) and not _is_str_lit(b):
        # mirror so the column is on the left
        op, a, b = _MIRROR[op], b, a
    an = _str_col_name(a, table)
    if op in _COMPARES and an is not None and _is_str_lit(b):
        from radix_sort_tpu import strings as S
        vocab = table.dictionary(an)
        s = b.args[0]
        s = s.decode() if isinstance(s, bytes) else s
        codes = table[an]
        if op in ("eq", "ne"):
            return op, codes, jnp.uint32(S.lookup(vocab, s))
        side = "left" if op in ("lt", "ge") else "right"
        bound = jnp.uint32(np.searchsorted(vocab, s, side=side))
        new_op = "lt" if op in ("lt", "le") else "ge"
        return new_op, codes, bound
    bn = _str_col_name(b, table)
    if op in _COMPARES and (an is not None) != (bn is not None):
        other = b if an is not None else a
        # device code arrays/scalars (the t.code() escape hatch) pass
        # through; Python number literals and numeric expressions are
        # meaningless against dictionary codes
        is_code = (isinstance(other, Expr) and other.kind == "lit"
                   and not isinstance(other.args[0], (bool, int, float)))
        if not is_code:
            raise TypeError(
                f"comparing string column {an or bn!r} against a "
                f"non-string operand (dictionary codes vs numbers would "
                f"be meaningless); compare against a str literal or a "
                f"code from Table.code()"
            )
    if op in _COMPARES and an is not None and bn is not None:
        from radix_sort_tpu import strings as S
        _, ra, rb = S.unify(table.dictionary(an), table.dictionary(bn))
        return op, jnp.asarray(ra)[table[an]], jnp.asarray(rb)[table[bn]]
    return op, _ev(a, table), _ev(b, table)


def col(name: str) -> Expr:
    """Reference a column by name."""
    return Expr("col", (str(name),))


def lit(value) -> Expr:
    """A literal scalar (or array) operand."""
    return Expr("lit", (value,))


def where(cond, a, b) -> Expr:
    """Elementwise ``cond ? a : b`` (SQL ``CASE WHEN``)."""
    mk = lambda x: x if isinstance(x, Expr) else lit(x)
    return Expr("where", (mk(cond), mk(a), mk(b)))


def udf(fn, columns, label: str = "udf") -> Expr:
    """Escape hatch: an arbitrary elementwise function of the named
    columns — ``fn(*arrays) -> array``. Unlike a raw lambda at the plan
    level, the column reads are DECLARED, so projection pruning still
    works through it."""
    return Expr("udf", (fn, str(label), tuple(str(c) for c in columns)))
