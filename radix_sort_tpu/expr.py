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
string columns, NULL handling (``is_null`` / ``coalesce`` / ``nullif``
/ the ``null()`` literal), and an explicit ``udf`` escape hatch that
still declares its column reads) so every node stays analyzable and
printable by ``LazyTable.explain()``.

NULL semantics (nulls.py): every node evaluates through
:meth:`Expr.evaluate_masked`, returning ``(values, null_mask_or_None)``.
Arithmetic, comparisons and scalar functions are null-propagating (any
NULL operand makes the result NULL — the SQL rule); ``&`` and ``|``
follow Kleene three-valued logic (``TRUE OR NULL`` is TRUE, ``FALSE AND
NULL`` is FALSE); ``where``/CASE treats a NULL condition as false (SQL
CASE). ``Table.filter`` keeps a row only when the predicate is known
TRUE. Masked values are canonicalized to 0 (the engine invariant).

The reference crate has no expression layer (it is sort-only,
src/radix_sort/mod.rs); this belongs to the north-star query-engine
surface (BASELINE.json).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["Expr", "col", "lit", "where", "udf", "coalesce", "nullif",
           "null"]

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
        """Compute against anything supporting ``table[name]``. NULL
        masks are dropped — use :meth:`evaluate_masked` to keep them."""
        return self.evaluate_masked(table)[0]

    def evaluate_masked(self, table):
        """Compute ``(values, null_mask)`` — the mask is a bool array
        (True = NULL) or None when no operand is nullable. Values are
        canonicalized to 0 under the mask for boolean results; other
        dtypes may carry garbage under masked slots (the mask is the
        truth — consumers must honor it)."""
        k = self.kind
        if k == "col":
            name = self.args[0]
            getm = getattr(table, "null_mask", None)
            return table[name], (getm(name) if getm is not None else None)
        if k == "lit":
            return self.args[0], None
        if k == "nulllit":
            # a typed-less NULL scalar: canonical value False (a 0-d bool
            # array: acts as 0 in arithmetic, stays bool through Kleene
            # and/or) and mask True (0-d array, not Python bool — `~True`
            # is -2 and would poison downstream logic)
            return jnp.asarray(False), jnp.asarray(True)
        if k == "bin":
            op, a, b = self.args
            if op not in _COMPARES:
                _reject_string_arith(op, (a, b), table)
            # evaluate each child exactly ONCE — values and mask together.
            # (A mask re-walk here would make deep chains O(2^depth) in
            # both trace time and eager compute.)
            av, am = _ev_masked(a, table)
            bv, bm = _ev_masked(b, table)
            if op in ("and", "or"):
                return _kleene(op, av, am, bv, bm)
            op2, av, bv = _resolve_string_compare(op, a, av, b, bv, table)
            m = _mor(am, bm)
            v = _BINOPS[op2][0](av, bv)
            if m is not None:
                # v can be a Python scalar (two literal operands)
                v = jnp.asarray(v)
                if v.dtype == jnp.bool_:
                    v = v & ~m
            return v, m
        if k == "un":
            op, a = self.args
            _reject_string_arith(op, (a,), table)
            av, am = _ev_masked(a, table)
            v = _UNOPS[op][0](av)
            if am is not None and op == "invert" and v.dtype == jnp.bool_:
                v = v & ~am
            return v, am
        if k == "cast":
            a, dt = self.args
            av, am = _ev_masked(a, table)
            return av.astype(dt), am
        if k == "where":
            c, a, b = self.args
            cv, cm = _ev_masked(c, table)
            av, am = _ev_masked(a, table)
            bv, bm = _ev_masked(b, table)
            take_a = cv if cm is None else (cv & ~cm)  # SQL CASE: NULL
            v = jnp.where(take_a, av, bv)              # condition = false
            if am is None and bm is None:
                return v, None
            m = jnp.where(take_a,
                          am if am is not None else False,
                          bm if bm is not None else False)
            return v, m
        if k == "isnull":
            (a,) = self.args
            av, am = _ev_masked(a, table)
            if am is None:
                return jnp.zeros(jnp.shape(av), jnp.bool_), None
            return jnp.broadcast_to(am, jnp.shape(av)), None
        if k == "coalesce":
            v, m = _ev_masked(self.args[0], table)
            for nxt in self.args[1:]:
                if m is None:
                    break
                nv, nm = _ev_masked(nxt, table)
                v = jnp.where(m, nv, v)
                m = None if nm is None else (m & nm)
            return v, m
        if k == "nullif":
            a, b = self.args
            av, am = _ev_masked(a, table)
            bv, bm = _ev_masked(b, table)
            eq = av == bv
            if am is not None:
                eq = eq & ~am   # unknown comparison -> keep a (SQL CASE)
            if bm is not None:
                eq = eq & ~bm
            m = eq if am is None else (am | eq)
            z = jnp.zeros((), av.dtype) if hasattr(av, "dtype") else 0
            return jnp.where(m, z, av), m
        if k == "udf":
            fn, _, cols = self.args
            getm = getattr(table, "null_mask", None)
            m = None
            if getm is not None:
                for c in cols:  # scalar functions propagate NULL (SQL)
                    m = _mor(m, getm(c))
            return fn(*(table[c] for c in cols)), m
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
            v = jnp.asarray(mask)[table[name]]
            m = _mask_of(a, table)
            return (v if m is None else (v & ~m)), m
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

    def is_null(self) -> "Expr":
        """SQL ``IS NULL`` — a (never-null) bool column."""
        return Expr("isnull", (self,))

    def is_not_null(self) -> "Expr":
        """SQL ``IS NOT NULL``."""
        return Expr("un", ("invert", Expr("isnull", (self,))))

    def fill_null(self, value) -> "Expr":
        """Replace NULLs with ``value`` (``COALESCE(self, value)``)."""
        return coalesce(self, value)

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
        if k == "isnull":
            return f"{self.args[0]!r}.is_null()"
        if k == "coalesce":
            return f"coalesce({', '.join(repr(a) for a in self.args)})"
        if k == "nullif":
            return f"nullif({self.args[0]!r}, {self.args[1]!r})"
        if k == "nulllit":
            return "NULL"
        return f"Expr({k})"


def _ev_masked(x, table):
    if isinstance(x, Expr):
        return x.evaluate_masked(table)
    return x, None


def _mask_of(x, table):
    """The null mask of a LEAF operand (col/lit). Only call this on leaf
    nodes — on an interior node it would re-evaluate the whole subtree a
    second time (the O(2^depth) trap the bin branch avoids by evaluating
    each child exactly once)."""
    assert not isinstance(x, Expr) or x.kind in ("col", "lit"), x.kind
    return _ev_masked(x, table)[1]


def _mor(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a | b


def _kleene(op, av, am, bv, bm):
    """Three-valued AND/OR: known-false dominates AND, known-true
    dominates OR; values are canonicalized False under the mask."""
    if am is None and bm is None:
        return (av & bv if op == "and" else av | bv), None
    amk = am if am is not None else jnp.asarray(False)
    bmk = bm if bm is not None else jnp.asarray(False)
    if op == "and":
        value = (av & ~amk) & (bv & ~bmk)
        known_false = (~amk & ~av) | (~bmk & ~bv)
        mask = (amk | bmk) & ~known_false
    else:
        value = (av & ~amk) | (bv & ~bmk)
        mask = (amk | bmk) & ~value
    return value, mask


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


def _resolve_string_compare(op, a, av, b, bv, table):
    """Make comparisons over dictionary-encoded string columns correct.

    Takes the already-evaluated operand values ``av``/``bv`` alongside
    the Expr nodes (the nodes are consulted only for string-column /
    string-literal detection — never re-evaluated, so the caller's
    evaluate-each-child-once contract holds).

    col(s) OP "literal": the literal resolves against the column's sorted
    vocabulary — equality via code lookup (absent values equal nothing);
    ordering via the literal's boundary rank (code < left-rank <=> value <
    literal; side/op adjust for <=/>). col(s1) OP col(s2): the two
    vocabularies unify and both code columns remap so one code space
    carries the total order. Everything else passes through untouched."""
    if op in _COMPARES and _is_str_lit(a) and not _is_str_lit(b):
        # mirror so the column is on the left
        op, a, b, av, bv = _MIRROR[op], b, a, bv, av
    an = _str_col_name(a, table)
    if op in _COMPARES and an is not None and _is_str_lit(b):
        from radix_sort_tpu import strings as S
        vocab = table.dictionary(an)
        s = b.args[0]
        s = s.decode() if isinstance(s, bytes) else s
        codes = av  # a col node's value IS the code column
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
        return op, jnp.asarray(ra)[av], jnp.asarray(rb)[bv]
    return op, av, bv


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
    works through it. NULL-propagating: the result is NULL wherever any
    read column is NULL (the SQL scalar-function rule)."""
    return Expr("udf", (fn, str(label), tuple(str(c) for c in columns)))


def coalesce(*exprs) -> Expr:
    """SQL ``COALESCE``: the first non-NULL operand, elementwise."""
    if not exprs:
        raise ValueError("coalesce needs at least one operand")
    mk = lambda x: x if isinstance(x, Expr) else lit(x)
    return Expr("coalesce", tuple(mk(x) for x in exprs))


def nullif(a, b) -> Expr:
    """SQL ``NULLIF(a, b)``: NULL where ``a == b``, else ``a``."""
    mk = lambda x: x if isinstance(x, Expr) else lit(x)
    return Expr("nullif", (mk(a), mk(b)))


def null() -> Expr:
    """The SQL ``NULL`` literal (untyped; broadcasts in CASE/COALESCE)."""
    return Expr("nulllit", ())
