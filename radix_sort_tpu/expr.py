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
           "null", "concat"]

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
            elif (_is_string_valued(a, table) or _is_string_valued(b, table)
                  or _is_str_lit(a) or _is_str_lit(b)):
                return _string_compare(op, a, b, table)
            # evaluate each child exactly ONCE — values and mask together.
            # (A mask re-walk here would make deep chains O(2^depth) in
            # both trace time and eager compute.)
            av, am = _ev_masked(a, table)
            bv, bm = _ev_masked(b, table)
            if op in ("and", "or"):
                return _kleene(op, av, am, bv, bm)
            m = _mor(am, bm)
            v = _BINOPS[op][0](av, bv)
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
            if _is_string_valued(a, table):
                # parse the (small, host-side) vocabulary once, gather
                # by code — unparseable values come back NULL (TRY_CAST
                # semantics; a strict error would have to fire even for
                # vocabulary entries no row references)
                sub = _ev_str_chain(a, table)
                codes, vals, m = sub
                parsed, bad = _parse_vocab(vals, dt)
                v = jnp.asarray(parsed)[codes]
                m = _mor(m, jnp.asarray(bad)[codes])
                return jnp.where(m, jnp.zeros((), v.dtype), v), m
            av, am = _ev_masked(a, table)
            return av.astype(dt), am
        if k in ("strfn", "concat"):
            codes, _vocab, m = self.string_result(table)
            return codes, m
        if k in ("strnum", "strbool"):
            fname, child, params = self.args
            sub = _ev_str_chain(child, table)
            if sub is None:
                raise TypeError(
                    f"{fname.upper()} needs a string-valued argument (a "
                    f"string column or string expression), got {child!r}"
                )
            codes, vals, m = sub
            fns = _S().STR_NUM_FNS if k == "strnum" else _S().STR_BOOL_FNS
            v = jnp.asarray(fns[fname](vals, *params))[codes]
            if k == "strbool" and m is not None:
                v = v & ~m
            return v, m
        if k == "datefn":
            from radix_sort_tpu import dates as D

            fname, child, params = self.args
            if _is_string_valued(child, table):
                raise TypeError(
                    f"{fname.upper()} needs an epoch-days integer "
                    f"column, got a string column"
                )
            av, am = _ev_masked(child, table)
            av = jnp.asarray(av)
            is_ts = av.dtype == jnp.int64  # epoch-us timestamp column
            if fname == "add_time":
                days, us = params
                if av.dtype == jnp.int64:
                    return av + (days * D.US_PER_DAY + us), am
                if us:
                    raise TypeError(
                        "a sub-day INTERVAL needs an int64 "
                        "epoch-microseconds timestamp column (a DATE "
                        "has no time of day)"
                    )
                return av + days, am
            if fname in D.TS_NUM_FNS:
                if not is_ts:
                    raise TypeError(
                        f"{fname.upper()} needs an int64 "
                        f"epoch-microseconds timestamp column, got "
                        f"{av.dtype} (a DATE has no time of day)"
                    )
                return D.TS_NUM_FNS[fname](av), am
            if fname == "trunc":
                v = (D.trunc_us(params[0], av) if is_ts
                     else D.trunc_days(params[0], av))
            elif fname == "add_months":
                if is_ts:
                    days = D.ts_days(av)
                    tod = av - days.astype(jnp.int64) * D.US_PER_DAY
                    v = (D.add_months(days, params[0]).astype(jnp.int64)
                         * D.US_PER_DAY + tod)
                else:
                    v = D.add_months(av, params[0])
            else:
                v = D.DATE_NUM_FNS[fname](
                    D.ts_days(av) if is_ts else av)
            return v, am
        if k == "where":
            c, a, b = self.args
            if _is_string_valued(a, table) or _is_string_valued(b, table):
                sr = self.string_result(table)
                if sr is None:
                    raise TypeError(
                        "CASE/where over strings needs BOTH branches "
                        "string-valued (or NULL / string literals)"
                    )
                return sr[0], sr[2]
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
            if any(_is_string_valued(a, table) for a in self.args):
                sr = self.string_result(table)
                if sr is None:
                    raise TypeError(
                        "COALESCE over strings needs every operand "
                        "string-valued (or NULL / string literals)"
                    )
                return sr[0], sr[2]
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
            sub = _ev_str_chain(a, table)
            if sub is None:
                raise TypeError(
                    f"LIKE requires a string column, got {a!r} (numeric "
                    f"columns and numeric expressions have no character "
                    f"patterns)"
                )
            codes, vals, m = sub
            # the pattern evaluates on the host per-code values; on device
            # the predicate is one gather of the per-code mask
            mask = _S().like_mask(vals, pattern)
            v = jnp.asarray(mask)[codes]
            return (v if m is None else (v & ~m)), m
        raise AssertionError(f"unknown Expr kind {k!r}")

    def string_result(self, table):
        """``(codes, vocab, mask)`` when this expression is string-valued
        — a string column, a string-function/CONCAT chain, or CASE /
        COALESCE over strings — else None. ``codes`` index the SORTED
        host ``vocab`` (order-preserving, ``""`` at index 0), so the
        triple is exactly what :class:`strings.DictColumn` carries and
        facades attach as the output column's dictionary."""
        S = _S()
        k = self.kind
        if k == "col":
            name = _str_col_name(self, table)
            if name is None:
                return None
            getm = getattr(table, "null_mask", None)
            return (table[name], np.asarray(table.dictionary(name)),
                    getm(name) if getm is not None else None)
        if k in ("strfn", "concat"):
            codes, vals, m = _ev_str_chain(self, table)
            vocab, mapping = S.revocab(vals)
            return jnp.asarray(mapping)[codes], vocab, m
        if k == "lit" and isinstance(self.args[0], (str, bytes)):
            s = _lit_str(self)
            vocab, mapping = S.revocab(np.array([s], dtype=np.str_))
            return jnp.asarray(mapping)[0], vocab, None
        if k == "nulllit":
            # NULL in a string CASE/COALESCE branch: code 0 = "" + mask
            return (jnp.uint32(0), np.array([""], dtype=np.str_),
                    jnp.asarray(True))
        if k == "where":
            c, a, b = self.args
            ar = a.string_result(table) if isinstance(a, Expr) else None
            br = b.string_result(table) if isinstance(b, Expr) else None
            if ar is None or br is None:
                return None
            union, ra, rb = S.unify(ar[1], br[1])
            cv, cm = _ev_masked(c, table)
            take_a = cv if cm is None else (cv & ~cm)
            v = jnp.where(take_a, jnp.asarray(ra)[ar[0]],
                          jnp.asarray(rb)[br[0]])
            am, bm = ar[2], br[2]
            if am is None and bm is None:
                return v, union, None
            m = jnp.where(take_a,
                          am if am is not None else False,
                          bm if bm is not None else False)
            return jnp.where(m, jnp.uint32(0), v), union, m
        if k == "coalesce":
            rs = [a.string_result(table) if isinstance(a, Expr) else None
                  for a in self.args]
            if any(r is None for r in rs):
                return None
            union = rs[0][1]
            for r in rs[1:]:
                union = np.union1d(union, r[1])
            v, m = None, None
            for codes, vocab, am in rs:
                remap = np.searchsorted(union, vocab).astype(np.uint32)
                cv = jnp.asarray(remap)[codes]
                if v is None:
                    v, m = cv, am
                    continue
                if m is None:
                    break  # earlier operand never NULL
                v = jnp.where(m, cv, v)
                m = None if am is None else (m & am)
            if m is not None:
                v = jnp.where(m, jnp.uint32(0), v)
            return v, union, m
        return None

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

    # -- string functions (host vocabulary transforms; one device gather) --

    def _strfn(self, fname, *params) -> "Expr":
        return Expr("strfn", (fname, self, tuple(params)))

    def upper(self) -> "Expr":
        return self._strfn("upper")

    def lower(self) -> "Expr":
        return self._strfn("lower")

    def trim(self, chars: str = " ") -> "Expr":
        """SQL TRIM: strip ``chars`` (default spaces) from both ends."""
        return self._strfn("trim", str(chars))

    def ltrim(self, chars: str = " ") -> "Expr":
        return self._strfn("ltrim", str(chars))

    def rtrim(self, chars: str = " ") -> "Expr":
        return self._strfn("rtrim", str(chars))

    def substr(self, start: int, length=None) -> "Expr":
        """SQL SUBSTR: 1-based ``start``; to the end if no ``length``."""
        if length is None:
            return self._strfn("substr", int(start))
        return self._strfn("substr", int(start), int(length))

    def replace(self, old: str, new: str) -> "Expr":
        return self._strfn("replace", str(old), str(new))

    def left(self, n: int) -> "Expr":
        return self._strfn("left", int(n))

    def right(self, n: int) -> "Expr":
        return self._strfn("right", int(n))

    def reverse(self) -> "Expr":
        return self._strfn("reverse")

    def lpad(self, width: int, fill: str = " ") -> "Expr":
        """SQL LPAD: pad/truncate to ``width`` characters."""
        return self._strfn("lpad", int(width), str(fill))

    def rpad(self, width: int, fill: str = " ") -> "Expr":
        return self._strfn("rpad", int(width), str(fill))

    def length(self) -> "Expr":
        """Character count (int32)."""
        return Expr("strnum", ("length", self, ()))

    def strpos(self, sub: str) -> "Expr":
        """SQL STRPOS: 1-based position of ``sub``, 0 when absent."""
        return Expr("strnum", ("strpos", self, (str(sub),)))

    def starts_with(self, prefix: str) -> "Expr":
        return Expr("strbool", ("starts_with", self, (str(prefix),)))

    def ends_with(self, suffix: str) -> "Expr":
        return Expr("strbool", ("ends_with", self, (str(suffix),)))

    def contains(self, sub: str) -> "Expr":
        return Expr("strbool", ("contains", self, (str(sub),)))

    def concat(self, *others) -> "Expr":
        """String concatenation (SQL ``||``): this value then each of
        ``others`` (string expressions or literals)."""
        return concat(self, *others)

    # -- date functions (operand = int32 epoch days; dates.py) ------------

    def _datefn(self, fname, *params) -> "Expr":
        return Expr("datefn", (fname, self, tuple(params)))

    def year(self) -> "Expr":
        """Civil year of an epoch-days value (int32)."""
        return self._datefn("year")

    def month(self) -> "Expr":
        return self._datefn("month")

    def day(self) -> "Expr":
        return self._datefn("day")

    def day_of_week(self) -> "Expr":
        """ISO day of week: 1 = Monday ... 7 = Sunday."""
        return self._datefn("dow")

    def day_of_year(self) -> "Expr":
        return self._datefn("doy")

    def week(self) -> "Expr":
        """ISO-8601 week number."""
        return self._datefn("week")

    def quarter(self) -> "Expr":
        return self._datefn("quarter")

    def date_trunc(self, unit: str) -> "Expr":
        """Start of ``unit`` (year/quarter/month/week/day) as epoch
        days."""
        return self._datefn("trunc", str(unit).lower())

    def add_months(self, n: int) -> "Expr":
        """SQL INTERVAL MONTH arithmetic (day clamped to month end)."""
        return self._datefn("add_months", int(n))

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
        if k in ("strfn", "strnum", "strbool", "datefn"):
            fname, a, params = self.args
            ps = "".join(f", {p!r}" for p in params)
            return f"{a!r}.{fname}({ps[2:] if ps else ''})"
        if k == "concat":
            return f"concat({', '.join(repr(a) for a in self.args)})"
        return f"Expr({k})"


def _parse_vocab(vals, dt):
    """Parse a vocabulary's string values to ``dt``: ``(parsed, bad)``
    numpy arrays — ``bad`` flags unparseable entries (they become 0 and
    NULL after the code gather). Integer targets accept optional sign
    and digits; floats take Python float syntax; bool accepts
    true/false/t/f/1/0 (case-insensitive)."""
    dt = np.dtype(dt)
    parsed = np.zeros(len(vals), dt)
    bad = np.zeros(len(vals), bool)
    for i, raw in enumerate(vals):
        s = str(raw).strip()
        try:
            if dt.kind == "b":
                low = s.lower()
                if low in ("true", "t", "1"):
                    parsed[i] = True
                elif low in ("false", "f", "0"):
                    parsed[i] = False
                else:
                    raise ValueError(s)
            elif dt.kind in ("i", "u"):
                parsed[i] = dt.type(int(s, 10))
            else:
                parsed[i] = dt.type(float(s))
        except (ValueError, OverflowError):
            bad[i] = True
    return parsed, bad


def _ev_masked(x, table):
    if isinstance(x, Expr):
        return x.evaluate_masked(table)
    return x, None


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


def _S():
    from radix_sort_tpu import strings as S
    return S


def _str_col_name(x, table):
    """Column name if ``x`` is col() of a string column of ``table``."""
    if (isinstance(x, Expr) and x.kind == "col"
            and getattr(table, "is_string", lambda n: False)(x.args[0])):
        return x.args[0]
    return None


def _is_str_lit(x):
    return (isinstance(x, Expr) and x.kind == "lit"
            and isinstance(x.args[0], (str, bytes)))


def _lit_str(x):
    s = x.args[0]
    return s.decode() if isinstance(s, bytes) else s


def _is_string_valued(x, table):
    """True when ``x`` evaluates to dictionary-encoded string values: a
    string column, a string function / CONCAT chain, or CASE / COALESCE
    whose branches are string-valued. Structural — nothing evaluates."""
    if not isinstance(x, Expr):
        return False
    k = x.kind
    if k == "col":
        return _str_col_name(x, table) is not None
    if k in ("strfn", "concat"):
        return True
    if k == "where":
        return (_is_string_valued(x.args[1], table)
                or _is_string_valued(x.args[2], table))
    if k == "coalesce":
        return any(_is_string_valued(a, table) for a in x.args)
    return False


def _ev_str_chain(x, table):
    """Resolve a string-valued expression into ``(codes, vals, mask)``:
    ``codes`` is a device ``uint32`` array of dictionary codes, ``vals``
    a host numpy string array POSITIONAL BY CODE (``vals[c]`` is the
    string value of code ``c`` — unsorted, possibly duplicated), ``mask``
    the null mask or None. All function composition happens on the
    (small) host ``vals`` array; the only device work a consumer pays is
    one gather by ``codes``. Returns None when ``x`` is not
    string-valued."""
    if not isinstance(x, Expr):
        return None
    k = x.kind
    if k == "col":
        name = _str_col_name(x, table)
        if name is None:
            return None
        getm = getattr(table, "null_mask", None)
        return (table[name], np.asarray(table.dictionary(name)),
                getm(name) if getm is not None else None)
    if k == "strfn":
        fname, child, params = x.args
        sub = _ev_str_chain(child, table)
        if sub is None:
            raise TypeError(
                f"{fname.upper()} needs a string-valued argument (a "
                f"string column or string expression), got {child!r}"
            )
        codes, vals, m = sub
        return codes, _S().STR_FNS[fname](vals, *params), m
    if k == "concat":
        chains, parts = [], []
        for p in x.args:
            if _is_str_lit(p):
                parts.append(_lit_str(p))
                continue
            sub = _ev_str_chain(p, table)
            if sub is None:
                raise TypeError(
                    f"CONCAT/|| operands must be string-valued or string "
                    f"literals, got {p!r}"
                )
            chains.append(sub)
            parts.append(len(chains) - 1)
        if not chains:  # all-literal concat (normally folded by
            s = "".join(parts)  # concat(); defensive)
            return jnp.uint32(0), np.array([s], dtype=np.str_), None
        # fold the parts left to right over a running (codes, vals,
        # mask). Chains sharing the running base code array combine
        # positionally on the host values (w || '-' || UPPER(w)); a
        # DIFFERENT column combines via the dictionary CROSS PRODUCT —
        # vals grows to |left| * |right| (every combination, realized or
        # not) and codes become codes * |right| + codes2 with one extra
        # device multiply-add, so the device cost stays one gather.
        codes, vals, m = None, np.array([""], dtype=np.str_), None
        for s in parts:
            if not isinstance(s, int):
                vals = np.char.add(vals, s)
                continue
            c2, v2, m2 = chains[s]
            v2 = np.asarray(v2, dtype=np.str_)
            if codes is None:
                codes = c2
                vals = np.char.add(vals, v2)
            elif c2 is codes:
                vals = np.char.add(vals, v2)
            else:
                k1, k2 = vals.shape[0], v2.shape[0]
                if k1 * k2 > (1 << 20):
                    raise TypeError(
                        f"CONCAT over different string columns builds "
                        f"the dictionary cross product; {k1} x {k2} "
                        f"distinct values exceeds the 2^20 bound — "
                        f"reduce the vocabularies or concatenate after "
                        f"aggregation"
                    )
                vals = np.char.add(np.repeat(vals, k2),
                                   np.tile(v2, k1))
                codes = codes * jnp.uint32(k2) + c2
            m = _mor(m, m2)
        return codes, vals, m
    if k == "lit" and isinstance(x.args[0], (str, bytes)):
        return jnp.uint32(0), np.array([_lit_str(x)], dtype=np.str_), None
    if k in ("where", "coalesce", "nulllit"):
        sr = x.string_result(table)
        if sr is not None:
            return sr  # a sorted vocab is a valid positional vals array
    return None


def _string_compare(op, a, b, table):
    """Comparison where at least one side is string-valued (or a string
    literal). Returns ``(values, mask)``.

    chain OP "literal": the literal resolves against the chain's output
    vocabulary — equality via code lookup (absent values equal nothing);
    ordering via the literal's boundary rank (code < left-rank <=> value
    < literal; side/op adjust for <=/>). chain OP chain: the two output
    vocabularies unify and both code columns remap so one code space
    carries the total order. A device code scalar (the ``Table.code()``
    escape hatch) passes through as a plain code comparison."""
    S = _S()
    if _is_str_lit(a) and _is_str_lit(b):
        v = jnp.asarray(_BINOPS[op][0](_lit_str(a), _lit_str(b)))
        return v, None
    if _is_str_lit(a) or (not _is_string_valued(a, table)
                          and _is_string_valued(b, table)):
        op, a, b = _MIRROR[op], b, a  # string chain on the left
    ar = a.string_result(table) if isinstance(a, Expr) else None
    if ar is None:  # e.g. numeric column vs a string literal
        raise TypeError(
            f"comparing a string literal against non-string operand "
            f"{a!r} (it has no dictionary to resolve the literal in)"
        )
    codes, vocab, am = ar
    if _is_str_lit(b):
        s = _lit_str(b)
        if op in ("eq", "ne"):
            v = _BINOPS[op][0](codes, jnp.uint32(S.lookup(vocab, s)))
        else:
            side = "left" if op in ("lt", "ge") else "right"
            bound = jnp.uint32(np.searchsorted(vocab, s, side=side))
            # lt/le <=> code < (left|right) bound; ge/gt <=> code >= bound
            v = _BINOPS["lt" if op in ("lt", "le") else "ge"][0](
                codes, bound)
        m = am
        return (v if m is None else (v & ~m)), m
    if _is_string_valued(b, table):
        br = b.string_result(table)
        _, ra, rb = S.unify(vocab, br[1])
        v = _BINOPS[op][0](jnp.asarray(ra)[codes], jnp.asarray(rb)[br[0]])
        m = _mor(am, br[2])
        return (v if m is None else (v & ~m)), m
    # string side vs non-string side: device code arrays/scalars (the
    # Table.code() escape hatch) pass through; Python number literals and
    # numeric expressions are meaningless against dictionary codes
    is_code = (isinstance(b, Expr) and b.kind == "lit"
               and not isinstance(b.args[0], (bool, int, float)))
    if not is_code:
        raise TypeError(
            f"comparing a string column/expression against a non-string "
            f"operand {b!r} (dictionary codes vs numbers would be "
            f"meaningless); compare against a str literal or a code from "
            f"Table.code()"
        )
    v = _BINOPS[op][0](codes, b.args[0])
    m = am
    return (v if m is None else (v & ~m)), m


def _reject_string_arith(op, operands, table):
    """Arithmetic/bit ops over dictionary-encoded string values would
    silently compute on uint32 codes; refuse."""
    for x in operands:
        if _is_string_valued(x, table):
            name = _str_col_name(x, table)
            what = (f"string column {name!r}" if name is not None
                    else f"string expression {x!r}")
            raise TypeError(
                f"operator {op!r} is not defined for {what} (it would "
                f"compute on dictionary codes, not string values); only "
                f"comparisons, LIKE, || and the string functions are "
                f"supported"
            )


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


def concat(*parts) -> Expr:
    """SQL ``||`` / CONCAT over string expressions and literals. At most
    one operand may be a string COLUMN chain (the result stays a single
    dictionary transform); pure-literal concats fold to a literal."""
    if not parts:
        raise ValueError("concat needs at least one operand")
    mk = lambda x: x if isinstance(x, Expr) else lit(x)
    flat = []
    for p in parts:
        p = mk(p)
        if isinstance(p, Expr) and p.kind == "concat":
            flat.extend(p.args)  # a || b || c parses left-nested
        else:
            flat.append(p)
    if all(_is_str_lit(p) for p in flat):
        return lit("".join(_lit_str(p) for p in flat))
    return Expr("concat", tuple(flat))
