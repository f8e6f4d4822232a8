"""SQL frontend: compile a SQL SELECT into a :class:`LazyTable` plan.

``sql(query, tables)`` parses a practical SQL subset and compiles it onto
the lazy planner (plan.py), so every query rides the engine's optimizer
(filter fusion, ORDER BY+LIMIT -> top_k, projection pruning) and executes
as the same static-shape variadic-sort pipeline as the native API —
single-chip (``Table``) or MPP (``DistTable``) depending on what you
register. String literals compare against dictionary-encoded columns
through the string-aware expression layer (expr.py / strings.py).

Supported grammar::

    SELECT [DISTINCT] item [, item ...]
    FROM name
    [ [INNER|LEFT|RIGHT|FULL [OUTER]|SEMI|ANTI] JOIN name
          ON a.k = b.k [AND ...] ]*
    [WHERE expr] [GROUP BY cols] [HAVING expr]
    [ORDER BY col [ASC|DESC], ...] [LIMIT n]

    item  := * | expr [[AS] alias] | agg(expr) [[AS] alias]
    agg   := SUM COUNT AVG MEAN MIN MAX MEDIAN MODE VAR VARIANCE STD
             STDDEV FIRST LAST ARGMIN ARGMAX BOOL_AND BOOL_OR
             COUNT(*) COUNT(DISTINCT x)
    expr  := literals ('s', 1, 2.5), columns, + - * / %,
             = != <> < <= > >=, AND OR NOT, [NOT] IN (...),
             [NOT] BETWEEN a AND b, ABS(x),
             CASE WHEN c THEN a [WHEN ...] [ELSE b] END

Engine capacity knobs (static shapes) ride keyword arguments:
``sql(q, tables, capacity=..., max_groups=...)`` — join verbs receive the
join-ish knobs, aggregate/distinct theirs.

The reference crate is sort-only (src/radix_sort/mod.rs); a SQL surface
belongs to the north-star query-engine scope (BASELINE.json).
"""

from __future__ import annotations

import re

from radix_sort_tpu.expr import Expr, col, lit, where

__all__ = ["sql", "SqlError"]


class SqlError(ValueError):
    """A SQL parse or compile error, with position context."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
      (?P<num>\d+\.\d*|\.\d+|\d+)
    | (?P<str>'(?:[^']|'')*')
    | (?P<id>[A-Za-z_][A-Za-z_0-9]*)
    | (?P<op><=|>=|!=|<>|=|<|>|\(|\)|,|\*|\+|-|/|%|\.)
    )""",
    re.X,
)

_KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "WHERE", "GROUP", "BY", "HAVING",
    "ORDER", "LIMIT", "AS", "AND", "OR", "NOT", "IN", "BETWEEN", "ASC",
    "DESC", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "OUTER", "SEMI",
    "ANTI", "ON", "CASE", "WHEN", "THEN", "ELSE", "END", "IS", "NULL",
}

_AGG_FNS = {
    "SUM": "sum", "COUNT": "count", "AVG": "mean", "MEAN": "mean",
    "MIN": "min", "MAX": "max", "MEDIAN": "median", "MODE": "mode",
    "VAR": "var", "VARIANCE": "var", "STD": "std", "STDDEV": "std",
    "FIRST": "first", "LAST": "last", "ARGMIN": "argmin",
    "ARGMAX": "argmax", "BOOL_AND": "all", "BOOL_OR": "any",
}

# verb-specific capacity knobs routed from sql(**kwargs)
_JOIN_KNOBS = ("capacity", "capacity_per_shard", "exchange_capacity_factor")
_AGG_KNOBS = ("max_groups", "exchange_capacity_factor")
_DISTINCT_KNOBS = ("max_unique",)


def _tokenize(q: str):
    toks, pos = [], 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == m.start():
            if q[pos:].strip() == "":
                break
            raise SqlError(f"cannot tokenize SQL at: {q[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            text = m.group("num")
            toks.append(("num", float(text) if "." in text else int(text)))
        elif m.lastgroup == "str":
            toks.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "id":
            word = m.group("id")
            if word.upper() in _KEYWORDS:
                toks.append(("kw", word.upper()))
            else:
                toks.append(("id", word))
        else:
            toks.append(("op", m.group("op")))
    toks.append(("end", None))
    return toks


class _Parser:
    def __init__(self, q: str):
        self.q = q
        self.toks = _tokenize(q)
        self.i = 0

    # -- token plumbing -----------------------------------------------------

    def peek(self, k=0):
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self):
        t = self.toks[self.i]
        self.i = min(self.i + 1, len(self.toks) - 1)
        return t

    def at_kw(self, *kws):
        t = self.peek()
        return t[0] == "kw" and t[1] in kws

    def eat_kw(self, *kws):
        if self.at_kw(*kws):
            return self.next()[1]
        return None

    def expect_kw(self, kw):
        if not self.eat_kw(kw):
            raise SqlError(f"expected {kw} near {self.peek()[1]!r}")

    def at_op(self, *ops):
        t = self.peek()
        return t[0] == "op" and t[1] in ops

    def eat_op(self, *ops):
        if self.at_op(*ops):
            return self.next()[1]
        return None

    def expect_op(self, op):
        if not self.eat_op(op):
            raise SqlError(f"expected {op!r} near {self.peek()[1]!r}")

    def ident(self, what="identifier"):
        t = self.next()
        if t[0] != "id":
            raise SqlError(f"expected {what}, got {t[1]!r}")
        return t[1]

    # -- expressions ----------------------------------------------------------

    def parse_expr(self) -> Expr:
        return self._or()

    def _or(self):
        e = self._and()
        while self.eat_kw("OR"):
            e = e | self._and()
        return e

    def _and(self):
        e = self._not()
        while self.eat_kw("AND"):
            e = e & self._not()
        return e

    def _not(self):
        if self.eat_kw("NOT"):
            return ~self._not()
        return self._cmp()

    def _cmp(self):
        e = self._add()
        neg = bool(self.eat_kw("NOT"))
        if self.eat_kw("IN"):
            self.expect_op("(")
            vals = [self._literal()]
            while self.eat_op(","):
                vals.append(self._literal())
            self.expect_op(")")
            out = e.isin(vals)
            return ~out if neg else out
        if self.eat_kw("BETWEEN"):
            lo = self._add()
            self.expect_kw("AND")
            hi = self._add()
            out = (e >= lo) & (e <= hi)
            return ~out if neg else out
        if neg:
            raise SqlError("NOT must precede IN or BETWEEN here")
        op = self.eat_op("=", "!=", "<>", "<=", ">=", "<", ">")
        if op is None:
            return e
        rhs = self._add()
        return {
            "=": lambda a, b: a == b,
            "!=": lambda a, b: a != b,
            "<>": lambda a, b: a != b,
            "<": lambda a, b: a < b,
            "<=": lambda a, b: a <= b,
            ">": lambda a, b: a > b,
            ">=": lambda a, b: a >= b,
        }[op](e, rhs)

    def _literal(self):
        t = self.next()
        if t[0] in ("num", "str"):
            return t[1]
        raise SqlError(f"expected a literal, got {t[1]!r}")

    def _add(self):
        e = self._mul()
        while True:
            op = self.eat_op("+", "-")
            if op is None:
                return e
            e = e + self._mul() if op == "+" else e - self._mul()

    def _mul(self):
        e = self._unary()
        while True:
            op = self.eat_op("*", "/", "%")
            if op is None:
                return e
            rhs = self._unary()
            e = (e * rhs if op == "*"
                 else e / rhs if op == "/" else e % rhs)

    def _unary(self):
        if self.eat_op("-"):
            return -self._unary()
        return self._primary()

    def _primary(self):
        t = self.peek()
        if t[0] == "num" or t[0] == "str":
            self.next()
            return lit(t[1])
        if self.eat_op("("):
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if self.at_kw("CASE"):
            return self._case()
        if t[0] == "id":
            name = self.ident()
            if self.at_op("."):
                # qualified name: the planner has one merged namespace;
                # resolve to the bare column (join suffixes rename
                # collisions — address those by the suffixed name)
                self.next()
                name = self.ident("column after '.'")
            if self.at_op("("):
                return self._call(name)
            return col(name)
        raise SqlError(f"unexpected token {t[1]!r} in expression")

    def _call(self, name) -> Expr:
        fn = name.upper()
        self.expect_op("(")
        if fn == "ABS":
            e = self.parse_expr()
            self.expect_op(")")
            return e.abs()
        if fn in _AGG_FNS:
            raise SqlError(
                f"aggregate {fn} is only allowed as a top-level SELECT "
                f"item (optionally aliased), not inside an expression"
            )
        raise SqlError(f"unknown function {name!r}")

    def _case(self) -> Expr:
        self.expect_kw("CASE")
        arms = []
        while self.eat_kw("WHEN"):
            c = self.parse_expr()
            self.expect_kw("THEN")
            v = self.parse_expr()
            arms.append((c, v))
        if not arms:
            raise SqlError("CASE needs at least one WHEN arm")
        default = self.parse_expr() if self.eat_kw("ELSE") else lit(0)
        self.expect_kw("END")
        out = default
        for c, v in reversed(arms):
            out = where(c, v, out)
        return out

    # -- select items ---------------------------------------------------------

    def parse_item(self):
        """One SELECT item -> ("star",) | ("agg", agg, arg_col, alias)
        | ("expr", Expr, alias)."""
        if self.eat_op("*"):
            return ("star",)
        t = self.peek()
        if (t[0] == "id" and t[1].upper() in _AGG_FNS
                and self.peek(1) == ("op", "(")):
            fname = self.next()[1].upper()
            agg = _AGG_FNS[fname]
            self.expect_op("(")
            argname = None
            if fname == "COUNT" and self.eat_op("*"):
                pass
            else:
                if self.eat_kw("DISTINCT"):
                    if fname != "COUNT":
                        raise SqlError("DISTINCT only inside COUNT(...)")
                    agg = "count_distinct"
                argname = self.ident("column name")
                if self.at_op("."):
                    self.next()
                    argname = self.ident("column after '.'")
            self.expect_op(")")
            alias = self._alias()
            if alias is None:
                alias = agg if argname is None else f"{agg}_{argname}"
            return ("agg", agg, argname, alias)
        e = self.parse_expr()
        alias = self._alias()
        if alias is None:
            if e.kind == "col":
                alias = e.args[0]
            else:
                raise SqlError(
                    f"computed SELECT item needs an alias (AS name): {e!r}"
                )
        return ("expr", e, alias)

    def _alias(self):
        if self.eat_kw("AS"):
            return self.ident("alias")
        if self.peek()[0] == "id":
            return self.ident()
        return None


def _route(kwargs, names):
    return {k: v for k, v in kwargs.items() if k in names}


def sql(query: str, tables, **kwargs):
    """Compile ``query`` against ``tables`` (dict name -> Table/DistTable/
    LazyTable) into a :class:`LazyTable`. Call ``.collect()`` to run (or
    ``.explain()`` to inspect the optimized plan). Capacity knobs for the
    static-shape verbs pass through ``kwargs`` (``capacity``/
    ``capacity_per_shard`` for joins, ``max_groups`` for GROUP BY,
    ``max_unique`` for DISTINCT)."""
    p = _Parser(query)
    p.expect_kw("SELECT")
    distinct = bool(p.eat_kw("DISTINCT"))
    items = [p.parse_item()]
    while p.eat_op(","):
        items.append(p.parse_item())
    p.expect_kw("FROM")
    from_name = p.ident("table name")

    def _lazy(name):
        if name not in tables:
            raise SqlError(f"unknown table {name!r} (registered: "
                           f"{sorted(tables)})")
        t = tables[name]
        return t if hasattr(t, "collect") else t.lazy()

    lt = _lazy(from_name)

    # JOIN clauses
    while True:
        how = None
        if p.at_kw("JOIN"):
            how = "inner"
        for kw, h in (("INNER", "inner"), ("LEFT", "left"),
                      ("RIGHT", "right"), ("FULL", "full"),
                      ("SEMI", "semi"), ("ANTI", "anti")):
            if how is None and p.at_kw(kw):
                p.next()
                p.eat_kw("OUTER")
                how = h
        if how is None:
            break
        p.expect_kw("JOIN")
        rname = p.ident("table name")
        p.expect_kw("ON")
        on = []
        while True:
            a = p.ident("join column")
            if p.eat_op("."):
                a = p.ident("column after '.'")
            p.expect_op("=")
            b = p.ident("join column")
            if p.eat_op("."):
                b = p.ident("column after '.'")
            if a != b:
                raise SqlError(
                    f"equi-join keys must share a column name on both "
                    f"sides (got {a!r} = {b!r}); rename one side first"
                )
            on.append(a)
            if not p.eat_kw("AND"):
                break
        lt = lt.join(_lazy(rname), on, how=how,
                     **_route(kwargs, _JOIN_KNOBS))

    if p.eat_kw("WHERE"):
        lt = lt.filter(p.parse_expr())

    group_by = []
    if p.eat_kw("GROUP"):
        p.expect_kw("BY")
        while True:
            g = p.ident("group column")
            if p.eat_op("."):
                g = p.ident("column after '.'")
            group_by.append(g)
            if not p.eat_op(","):
                break

    having = p.parse_expr() if p.eat_kw("HAVING") else None

    order_by, order_desc = [], []
    if p.eat_kw("ORDER"):
        p.expect_kw("BY")
        while True:
            o = p.ident("order column")
            if p.eat_op("."):
                o = p.ident("column after '.'")
            order_by.append(o)
            d = p.eat_kw("ASC", "DESC")
            order_desc.append(d == "DESC")
            if not p.eat_op(","):
                break

    limit = None
    if p.eat_kw("LIMIT"):
        t = p.next()
        if t[0] != "num" or not isinstance(t[1], int):
            raise SqlError(f"LIMIT needs an integer, got {t[1]!r}")
        limit = t[1]

    if p.peek()[0] != "end":
        raise SqlError(f"unexpected trailing input near {p.peek()[1]!r}")

    has_aggs = any(it[0] == "agg" for it in items)
    if has_aggs or group_by:
        aggs, out_names = {}, []
        for it in items:
            if it[0] == "star":
                raise SqlError("SELECT * cannot mix with GROUP BY — name "
                               "the group keys and aggregates")
            if it[0] == "agg":
                _, agg, argname, alias = it
                aggs[alias] = (agg,) if argname is None else (agg, argname)
                out_names.append(alias)
            else:
                _, e, alias = it
                if e.kind != "col" or e.args[0] not in group_by:
                    raise SqlError(
                        f"non-aggregate SELECT item {alias!r} must be a "
                        f"GROUP BY key"
                    )
                if alias != e.args[0]:
                    raise SqlError(
                        "aliasing a group key in SELECT is not supported; "
                        "rename after the query"
                    )
                out_names.append(e.args[0])
        lt = lt.aggregate(group_by, aggs, **_route(kwargs, _AGG_KNOBS))
        if having is not None:
            lt = lt.filter(having)
        lt = lt.select(*out_names)
    else:
        if having is not None:
            raise SqlError("HAVING needs GROUP BY or aggregates")
        derived = {}
        names = []
        star = False
        for it in items:
            if it[0] == "star":
                star = True
                continue
            _, e, alias = it
            if e.kind == "col" and e.args[0] == alias:
                names.append(alias)
            else:
                derived[alias] = e
                names.append(alias)
        if derived:
            lt = lt.with_columns(**derived)
        if not star:
            lt = lt.select(*names)
        if distinct:
            lt = lt.distinct(subset=None if star else names,
                             **_route(kwargs, _DISTINCT_KNOBS))

    if order_by:
        lt = lt.sort_by(order_by, descending=order_desc)
    if limit is not None:
        lt = lt.limit(limit)
    return lt
