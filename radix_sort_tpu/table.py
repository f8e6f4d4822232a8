"""Table: a named-column relational facade over the query operators.

The engine's operators (ops/query.py, ops/relational.py, ops/window.py,
ops/sort.py) work on positional column arrays and follow the static-shape
convention: data-dependent result sizes come back as (padded arrays...,
count). ``Table`` packages that convention behind a small relation API —
named columns, chained filter / sort_by / aggregate / join / window /
distinct / top_k — so a pipeline reads like the SQL it implements while
remaining one jittable expression end to end (the composed example in
examples/query_demo.py is the positional equivalent).

Validity model: a Table is ``num_rows`` static rows of which the FIRST
``count`` are valid (``count=None`` means all). Operators that cannot skip
rows get validity woven in the engine way — an extra leading key word:

  - sorts order by (invalid-flag, keys...), so valid rows stay a prefix;
  - group-bys/distincts group by (invalid-flag, keys...): junk groups sort
    after all valid groups and are excluded from the output count;
  - joins key on per-side flags (left-invalid=1, right-invalid=2) so
    padding never matches anything, with a post-filter for the
    left/anti variants that would otherwise emit unmatched padding;
  - windows partition on (invalid-flag, partition keys...), fencing junk
    rows into their own partitions.

Everything stays traced — no host round trip, no dynamic shapes; ``count``
is an int32 scalar that downstream ops thread through. Materialize with
``to_numpy()`` (eager only).

String columns are dictionary-encoded (strings.py): host string data in
the constructor becomes uint32 codes on device + a sorted host-side
vocabulary, so every operator — sorts, group-bys, joins (with automatic
cross-table dictionary unification), distinct, min/max, windows — runs on
the codes with lexicographically correct results; ``to_numpy`` decodes.

The reference crate is sort-only (src/radix_sort/mod.rs); this layer is
part of the north-star query-engine surface (BASELINE.json).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

import radix_sort_tpu as rst
from radix_sort_tpu import keys as K
from radix_sort_tpu import strings as S
from radix_sort_tpu.ops import query as Q

__all__ = ["Table"]

# aggregations that are arithmetic over the value domain — meaningless on
# dictionary codes (order-based / identity-based ones are fine: codes are
# order-preserving)
_NUMERIC_ONLY_AGGS = ("sum", "mean", "var", "std", "any", "all")
# window ops whose output is a value from the input column (the output
# column inherits the source column's dictionary)
_VALUE_PRESERVING_WINDOW = (
    "lag", "lead", "first_value", "last_value", "nth_value",
    "min", "max", "cummin", "cummax", "rolling_min", "rolling_max",
)


def _as_list(x):
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


class Table:
    """An immutable relation: equal-length named columns + a valid-row
    count (the static-shape convention; rows [0, count) are the data)."""

    def __init__(self, columns, count=None, dictionaries=None):
        cols = dict(columns)
        if not cols:
            raise ValueError("a Table needs at least one column")
        dicts = dict(dictionaries) if dictionaries else {}
        n = None
        for name, c in cols.items():
            if name not in dicts and S.is_string_data(c):
                # dictionary-encode host string data: uint32 codes on
                # device, sorted vocabulary on host (order-preserving)
                codes, vocab = S.encode(c)
                dicts[name] = vocab
                c = codes
            c = jnp.asarray(c)
            if c.ndim != 1:
                raise ValueError(f"column {name!r} must be 1-D, got {c.shape}")
            if n is None:
                n = c.shape[0]
            elif c.shape[0] != n:
                raise ValueError(
                    f"column {name!r} has length {c.shape[0]}, expected {n}"
                )
            cols[name] = c
        self._cols = cols
        self._n = n
        self._count = None if count is None else jnp.asarray(count, jnp.int32)
        self._dicts = {k: v for k, v in dicts.items() if k in cols}

    @classmethod
    def from_csv(cls, path: str, *, delimiter: str = ",",
                 dtypes=None) -> "Table":
        """Read a headered CSV into a Table (text columns are
        dictionary-encoded automatically; see utils/io.read_csv)."""
        from radix_sort_tpu.utils.io import read_csv

        return cls(read_csv(path, delimiter=delimiter, dtypes=dtypes))

    # ---- introspection -------------------------------------------------

    @property
    def num_rows(self) -> int:
        """Static row capacity (valid rows + padding)."""
        return self._n

    @property
    def count(self):
        """Valid-row count: an int32 scalar, or None when all rows are
        valid (then it equals ``num_rows``)."""
        return self._count

    @property
    def column_names(self):
        return list(self._cols)

    def __getitem__(self, name: str) -> jnp.ndarray:
        return self._cols[name]

    def __contains__(self, name: str) -> bool:
        return name in self._cols

    def __repr__(self):
        cnt = "all" if self._count is None else "traced"
        return (f"Table({self._n} rows [{cnt} valid], "
                f"columns={list(self._cols)})")

    def valid_mask(self) -> jnp.ndarray:
        """Bool mask of the valid prefix."""
        if self._count is None:
            return jnp.ones((self._n,), jnp.bool_)
        return jnp.arange(self._n, dtype=jnp.int32) < self._count

    def _flag(self):
        """Leading validity key word: 0 valid, 1 invalid (None when the
        whole table is valid)."""
        if self._count is None:
            return None
        return (~self.valid_mask()).astype(jnp.uint32)

    def _resolve(self, cols):
        """Column names -> arrays (arrays pass through)."""
        out = []
        for c in _as_list(cols):
            out.append(self._cols[c] if isinstance(c, str) else jnp.asarray(c))
        return out

    # ---- string columns --------------------------------------------------

    def is_string(self, name: str) -> bool:
        """True if ``name`` is a dictionary-encoded string column."""
        return name in self._dicts

    def dictionary(self, name: str) -> np.ndarray:
        """The sorted host-side vocabulary of a string column
        (``vocab[code]`` is the value; index 0 is always ``""``)."""
        return self._dicts[name]

    def code(self, name: str, value):
        """The uint32 code(s) of string value(s) under ``name``'s
        dictionary; absent values get a sentinel equal to no real code.
        Use in filters: ``t.filter(t["city"] == t.code("city", "nyc"))``."""
        return jnp.asarray(S.lookup(self._dicts[name], value))

    def decode(self, name: str, codes=None) -> np.ndarray:
        """Decode a code array (default: the column itself) against
        ``name``'s dictionary (eager: fetches to host)."""
        if codes is None:
            codes = self._cols[name]
        return S.decode(np.asarray(codes), self._dicts[name])

    def _subdicts(self, names):
        return {n: self._dicts[n] for n in names if n in self._dicts}

    def _no_string(self, col, what: str):
        if isinstance(col, str) and col in self._dicts:
            raise TypeError(
                f"{what} is arithmetic over values and is undefined on "
                f"string column {col!r} (dictionary codes); use an "
                f"order/identity-based op (min/max/first/last/...) or the "
                f"raw codes explicitly"
            )

    # ---- projection ----------------------------------------------------

    def select(self, *names) -> "Table":
        return Table({n: self._cols[n] for n in names}, self._count,
                     dictionaries=self._subdicts(names))

    def drop(self, *names) -> "Table":
        keep = {n: c for n, c in self._cols.items() if n not in names}
        return Table(keep, self._count, dictionaries=self._subdicts(keep))

    def rename(self, mapping) -> "Table":
        return Table(
            {mapping.get(n, n): c for n, c in self._cols.items()},
            self._count,
            dictionaries={mapping.get(n, n): d
                          for n, d in self._dicts.items()},
        )

    def with_columns(self, **named) -> "Table":
        cols = dict(self._cols)
        dicts = dict(self._dicts)
        for n, c in named.items():
            if S.is_string_data(c):
                codes, vocab = S.encode(c)
                dicts[n] = vocab
                c = codes
            else:
                dicts.pop(n, None)  # replaced by a numeric column
            c = jnp.asarray(c)
            if c.shape[0] != self._n:
                raise ValueError(
                    f"column {n!r} has length {c.shape[0]}, expected {self._n}"
                )
            cols[n] = c
        return Table(cols, self._count, dictionaries=dicts)

    # ---- relational operators ------------------------------------------

    def filter(self, mask) -> "Table":
        """Rows where ``mask`` holds (a bool column or a callable taking
        this Table), compacted to the front in original order."""
        if callable(mask):
            mask = mask(self)
        mask = jnp.asarray(mask)
        if self._count is not None:
            mask = mask & self.valid_mask()
        *out, cnt = rst.filter(mask, *self._cols.values())
        return Table(dict(zip(self._cols, out)), cnt,
                     dictionaries=self._dicts)

    def sort_by(self, by, descending=False) -> "Table":
        """Stable sort of the valid rows by one or more columns (every
        other column rides the one variadic sort; padding stays last).
        ``descending`` is a bool or a per-column list."""
        by = _as_list(by)
        desc = ([descending] * len(by)
                if isinstance(descending, bool) else list(descending))
        if len(desc) != len(by):
            raise ValueError("descending list must match the by list")
        key_cols = self._resolve(by)
        limbs = []
        for c, d in zip(key_cols, desc):
            limbs.extend(~w if d else w for w in K.encode_limbs(c))
        flag = self._flag()
        if flag is not None:
            limbs = [flag, *limbs]
        out = Q._stable_sort(
            [*limbs, *self._cols.values()], num_keys=len(limbs)
        )
        data = out[len(limbs):]
        return Table(dict(zip(self._cols, data)), self._count,
                     dictionaries=self._dicts)

    def distinct(self, subset=None) -> "Table":
        """Distinct rows over ``subset`` columns (default: all columns),
        ascending lexicographically. Non-subset columns are dropped (their
        per-group representative would be arbitrary)."""
        names = _as_list(subset) or list(self._cols)
        key_cols = self._resolve(names)
        flag = self._flag()
        uk, _, num = rst.unique(
            [flag, *key_cols] if flag is not None else
            (key_cols if len(key_cols) > 1 else key_cols[0])
        )
        uks = list(uk) if isinstance(uk, (list, tuple)) else [uk]
        if flag is not None:
            fcol, uks = uks[0], uks[1:]
            pos = jnp.arange(uks[0].shape[0], dtype=jnp.int32)
            num = jnp.sum(((pos < num) & (fcol == 0)).astype(jnp.int32))
        return Table(dict(zip(names, uks)), num,
                     dictionaries=self._subdicts(names))

    def aggregate(self, by, aggs) -> "Table":
        """GROUP BY ``by`` (a column name/list, or None for one global
        group over the valid rows) computing ``aggs``: a dict of output
        name -> ``(agg, column)`` with agg in sum/count/min/max/mean/
        any/all/first/last/median/mode/var/std/count_distinct/argmin/
        argmax (``"count"`` alone also works). One shared key sort
        computes every aggregate (the engine's multi-aggregate;
        median/mode/count_distinct/argmin/argmax each add one
        (key, value) sort). ``argmin``/``argmax`` report positions in
        this table's row numbering."""
        by = _as_list(by)
        if not aggs:
            if not by:
                raise ValueError("aggregate needs group keys or aggs")
            return self.distinct(by)  # GROUP BY with no aggregates
        key_cols = self._resolve(by)
        if not key_cols:
            key_cols = [jnp.zeros((self._n,), jnp.uint32)]
        flag = self._flag()
        keys_arg = [flag, *key_cols] if flag is not None else key_cols
        names, val_cols, agg_list, out_dicts = [], [], [], {}
        for out_name, spec in aggs.items():
            if isinstance(spec, str):
                agg, col = spec, None
            else:
                agg, col = spec[0], (spec[1] if len(spec) > 1 else None)
            if col is None:
                if agg != "count":
                    raise ValueError(
                        f"{out_name!r}: {agg!r} needs a value column"
                    )
                col = keys_arg[-1]  # count ignores values
            if agg in _NUMERIC_ONLY_AGGS:
                self._no_string(col, f"{out_name!r}: {agg}")
            elif (isinstance(col, str) and col in self._dicts
                  and (agg in ("min", "max", "first", "last", "mode",
                               "median")
                       or agg.startswith("quantile:"))):
                # value-typed output: inherits the source dictionary
                out_dicts[out_name] = self._dicts[col]
            names.append(out_name)
            val_cols.append(self._resolve(col)[0])
            agg_list.append(agg)
        uk, outs, cnt = rst.hash_aggregate(keys_arg, val_cols, agg_list)
        uks = list(uk)
        if flag is not None:
            fcol, uks = uks[0], uks[1:]
            pos = jnp.arange(self._n, dtype=jnp.int32)
            cnt = jnp.sum(((pos < cnt) & (fcol == 0)).astype(jnp.int32))
        cols = dict(zip(by, uks[:len(by)]))  # drops the dummy global key
        cols.update(zip(names, outs))
        return Table(cols, cnt,
                     dictionaries={**self._subdicts(by), **out_dicts})

    def join(self, other: "Table", on, *, capacity: int | None = None,
             how: str = "inner", suffix: str = "_r"):
        """Equi-join with ``other`` on the shared ``on`` column(s).

        Returns ``(Table, overflow)``. Result columns: the ``on`` keys,
        this table's other columns, and (for inner/left/right/full)
        ``other``'s other columns — renamed with ``suffix`` on collision;
        semi/anti emit left columns only (SQL semantics). Rows order by left
        row then right sorted position (right joins: by right row then left
        sorted position; full joins: the left-join rows then the unmatched
        right rows); unmatched rows carry zeros in the other side's columns.
        ``capacity`` bounds the static result size; ``overflow`` is True if
        the true result was larger (rows [0, count) are exact regardless).
        Semi/anti joins emit at most one row per left row, so ``capacity``
        defaults to this table's row count (always exact); the expanding
        joins require it."""
        if capacity is None:
            if how in ("semi", "anti"):
                capacity = self._n
            else:
                raise TypeError(
                    f"join(how={how!r}) needs an explicit capacity= (the "
                    f"static result size bound); only semi/anti joins have "
                    f"a natural default"
                )
        on = _as_list(on)
        lk, rk, key_dicts = [], [], {}
        for name in on:
            lc = self._resolve(name)[0]
            rc = other._resolve(name)[0]
            if isinstance(name, str) and (
                    (name in self._dicts) != (name in other._dicts)):
                raise TypeError(
                    f"join key {name!r} is a string column on one side "
                    f"only — encode both sides or neither"
                )
            if isinstance(name, str) and name in self._dicts:
                # unify the two dictionaries (host) and remap codes into
                # the shared order-preserving space (one small gather)
                union, ra, rb = S.unify(
                    self._dicts[name], other._dicts[name]
                )
                lc = jnp.asarray(ra)[lc]
                rc = jnp.asarray(rb)[rc]
                key_dicts[name] = union
            lk.append(lc)
            rk.append(rc)
        lflag, rflag = self._flag(), other._flag()
        if lflag is not None or rflag is not None:
            # per-side flag words: padding never equals anything (left 1,
            # right 2, valid 0)
            lf = (lflag if lflag is not None
                  else jnp.zeros((self._n,), jnp.uint32))
            rf = ((rflag * jnp.uint32(2)) if rflag is not None
                  else jnp.zeros((other._n,), jnp.uint32))
            lk, rk = [lf, *lk], [rf, *rk]
            flagged = True
        else:
            flagged = False
        # both sides 1-based so 0 = "no row" works for every variant
        # (full/right joins emit rows with no left match)
        lidx1 = jnp.arange(self._n, dtype=jnp.int32) + 1
        ridx1 = jnp.arange(other._n, dtype=jnp.int32) + 1
        jk, jl, jr, cnt, ovf = rst.hash_join(
            lk, lidx1, rk, ridx1, capacity=capacity, how=how
        )
        jks = list(jk) if isinstance(jk, (list, tuple)) else [jk]
        if flagged:
            fcol, jks = jks[0], jks[1:]
        valid = jnp.arange(capacity, dtype=jnp.int32) < cnt
        if flagged and how in ("left", "anti", "right", "full"):
            # unmatched padding rows emit under these variants; drop them
            keep = valid & (fcol == 0)
            *packed, cnt = rst.filter(keep, *jks, jl, jr)
            jks, jl, jr = packed[:-2], packed[-2], packed[-1]
            valid = jnp.arange(capacity, dtype=jnp.int32) < cnt

        cols = dict(zip(on, jks))
        dicts = dict(key_dicts)
        matched_l = valid & (jl > 0)
        lg = jnp.clip(jl - 1, 0, self._n - 1)
        for name, c in self._cols.items():
            if name in on:
                continue
            cols[name] = jnp.where(matched_l, c[lg], 0)
            if name in self._dicts:
                dicts[name] = self._dicts[name]
        if how in ("inner", "left", "right", "full"):
            matched = valid & (jr > 0)
            rg = jnp.clip(jr - 1, 0, other._n - 1)
            for name, c in other._cols.items():
                if name in on:
                    continue
                out_name = name + suffix if name in cols else name
                cols[out_name] = jnp.where(matched, c[rg], 0)
                if name in other._dicts:
                    dicts[out_name] = other._dicts[name]
        return Table(cols, cnt, dictionaries=dicts), ovf

    def join_asof(self, other: "Table", on, *, direction: str = "backward",
                  tolerance=None, suffix: str = "_r",
                  matched_col: str | None = None) -> "Table":
        """ASOF join (pandas ``merge_asof`` semantics): align each valid row
        with ``other``'s nearest valid row on the shared ``on`` column
        (``direction``: backward/forward/nearest; optional ``tolerance``).

        Row-aligned: the result keeps this table's rows and count and adds
        ``other``'s non-key columns (``suffix`` on collision), zero-filled
        where unmatched; ``matched_col`` (optional name) adds the bool
        match-indicator column. Padding rows on either side never match —
        ``other``'s padding is excluded from candidacy entirely."""
        (lk,) = self._resolve([on])
        (rk,) = other._resolve([on])
        if isinstance(on, str) and (
                (on in self._dicts) != (on in other._dicts)):
            raise TypeError(
                f"asof key {on!r} is a string column on one side only"
            )
        if isinstance(on, str) and on in self._dicts:
            _, ra, rb = S.unify(self._dicts[on], other._dicts[on])
            lk = jnp.asarray(ra)[lk]
            rk = jnp.asarray(rb)[rk]
        rvalid = None if other._count is None else other.valid_mask()
        ridx = jnp.arange(other._n, dtype=jnp.int32)
        _, matched, rpos = rst.join_asof(
            lk, rk, ridx, direction=direction, tolerance=tolerance,
            right_valid=rvalid,
        )
        if self._count is not None:
            matched = matched & self.valid_mask()
        rg = jnp.clip(rpos, 0, other._n - 1)
        cols = dict(self._cols)
        dicts = dict(self._dicts)
        for name, c in other._cols.items():
            if name == on:
                continue
            out_name = name + suffix if name in cols else name
            cols[out_name] = jnp.where(matched, c[rg], 0)
            if name in other._dicts:
                dicts[out_name] = other._dicts[name]
        if matched_col is not None:
            cols[matched_col] = matched
        return Table(cols, self._count, dictionaries=dicts)

    def _set_op(self, other: "Table", subset, want) -> "Table":
        names = _as_list(subset) or list(self._cols)
        a_cols = self._resolve(names)
        b_cols = other._resolve(names)
        out_dicts = {}
        for i, name in enumerate(names):
            if not isinstance(name, str):
                continue
            if (name in self._dicts) != (name in other._dicts):
                raise TypeError(
                    f"set-op column {name!r} is a string column on one "
                    f"side only"
                )
            if name in self._dicts:
                union, ra, rb = S.unify(
                    self._dicts[name], other._dicts[name]
                )
                a_cols[i] = jnp.asarray(ra)[a_cols[i]]
                b_cols[i] = jnp.asarray(rb)[b_cols[i]]
                out_dicts[name] = union
        from radix_sort_tpu.ops import relational
        keys_out, count = relational._set_op(
            a_cols if len(a_cols) > 1 else a_cols[0],
            b_cols if len(b_cols) > 1 else b_cols[0],
            want,
            a_valid=None if self._count is None else self.valid_mask(),
            b_valid=None if other._count is None else other.valid_mask(),
        )
        kouts = (list(keys_out) if isinstance(keys_out, (list, tuple))
                 else [keys_out])
        return Table(dict(zip(names, kouts)), count, dictionaries=out_dicts)

    def union(self, other: "Table", subset=None) -> "Table":
        """SQL ``UNION`` (distinct) over ``subset`` columns (default: all of
        this table's columns; both tables need them with matching dtypes).
        Padding rows on either side contribute nothing."""
        return self._set_op(other, subset, lambda ha, hb: ha | hb)

    def intersect(self, other: "Table", subset=None) -> "Table":
        """SQL ``INTERSECT``: distinct rows present in both tables."""
        return self._set_op(other, subset, lambda ha, hb: ha & hb)

    def difference(self, other: "Table", subset=None) -> "Table":
        """SQL ``EXCEPT``: distinct rows of this table absent from
        ``other``."""
        return self._set_op(other, subset, lambda ha, hb: ha & ~hb)

    def window(self, ops, *, partition_by=None, order_by=None,
               descending=None) -> "Table":
        """Add window-function columns: ``ops`` is a dict of output name ->
        spec per :func:`radix_sort_tpu.window`, with column NAMES in place
        of value arrays (e.g. ``{"rn": "row_number", "s": ("sum", "v"),
        "prev": ("lag", "v", 1)}``). ``descending`` flips ``order_by``
        direction (one bool, or one per order column). Padding rows are
        fenced into their own partitions and never affect valid results."""
        specs = []
        out_dicts = {}
        for out_name, spec in ops.items():
            if isinstance(spec, str):
                specs.append(spec)
            else:
                spec = list(spec)
                # value-less parameterized ops (ntile, rolling_count) carry
                # ints after the name, not a value column
                if spec[0] not in ("ntile", "rolling_count"):
                    if (isinstance(spec[1], str) and spec[1] in self._dicts):
                        if spec[0] in _VALUE_PRESERVING_WINDOW:
                            out_dicts[out_name] = self._dicts[spec[1]]
                        else:
                            self._no_string(
                                spec[1], f"window op {spec[0]!r}"
                            )
                    spec[1] = self._resolve(spec[1])[0]
                specs.append(tuple(spec))
        p_cols = self._resolve(partition_by)
        flag = self._flag()
        if flag is not None:
            p_cols = [flag, *p_cols]
        outs = rst.window(
            specs,
            partition_by=p_cols or None,
            order_by=self._resolve(order_by) or None,
            descending=descending,
        )
        if isinstance(outs, jnp.ndarray):
            outs = [outs]
        res = self.with_columns(**dict(zip(ops, outs)))
        if out_dicts:
            res = Table(res._cols, res._count,
                        dictionaries={**res._dicts, **out_dicts})
        return res

    def top_k(self, k: int, by, largest: bool = True) -> "Table":
        """The ``k`` rows with extreme ``by`` keys (ORDER BY ... LIMIT k):
        result rows sorted by key (descending for ``largest``), ties by
        input position. All other columns are co-selected. ``k`` beyond
        the row count clamps (LIMIT semantics: all rows, sorted)."""
        k = min(int(k), self._n)
        by = _as_list(by)
        key_cols = self._resolve(by)
        keys_arg = list(key_cols)
        flag = self._flag()
        if flag is not None:
            # leading indicator that makes VALID rows win either direction
            ind = (self.valid_mask().astype(jnp.uint32) if largest
                   else flag)
            keys_arg = [ind, *keys_arg]
        others = list(self._cols)
        out = rst.top_k(
            keys_arg if len(keys_arg) > 1 else keys_arg[0],
            k,
            *[self._cols[n] for n in others],
            largest=largest,
        )
        sel_arrays = out[1:]
        cols = dict(zip(others, sel_arrays))
        cnt = None if self._count is None else jnp.minimum(
            self._count, jnp.int32(k)
        )
        return Table(cols, cnt, dictionaries=self._dicts)

    def unnest(self, counts, total_size: int):
        """UNNEST / explode: valid row i emits ``counts[i]`` copies of
        every column, in row order, into a static ``total_size`` result
        (the relation form of :func:`radix_sort_tpu.repeat`; the expansion
        index is computed once and shared by all columns).

        Returns ``(Table, overflow)``: ``overflow`` is True if the true
        expansion exceeds ``total_size`` (rows [0, count) exact
        regardless). Padding rows emit nothing."""
        (c,) = self._resolve([counts])
        if self._count is not None:
            c = jnp.where(self.valid_mask(), c, 0)
        outs, cnt, ovf = Q._expand_rows(
            list(self._cols.values()), c, total_size
        )
        return Table(dict(zip(self._cols, outs)), cnt,
                     dictionaries=self._dicts), ovf

    def limit(self, k: int, offset: int = 0) -> "Table":
        """Valid rows [offset, offset+k) (static slice; valid rows are a
        prefix, so OFFSET is a start shift)."""
        off = min(int(offset), self._n)
        k = max(0, min(int(k), self._n - off))
        cols = {n: c[off:off + k] for n, c in self._cols.items()}
        cnt = (jnp.int32(k) if self._count is None
               else jnp.clip(self._count - off, 0, k).astype(jnp.int32))
        return Table(cols, cnt, dictionaries=self._dicts)

    def concat(self, other: "Table") -> "Table":
        """UNION ALL: this table's valid rows followed by ``other``'s (same
        column names/dtypes; a stable validity sort re-packs the combined
        valid rows into a prefix)."""
        if list(self._cols) != list(other._cols):
            raise ValueError("concat needs identical column names")
        for n, c in self._cols.items():
            if np.dtype(c.dtype) != np.dtype(other._cols[n].dtype):
                raise ValueError(f"column {n!r} dtypes differ")
            if (n in self._dicts) != (n in other._dicts):
                raise TypeError(
                    f"column {n!r} is a string column on one side only"
                )
        out_dicts, remapped = {}, {}
        for n in self._dicts:
            union, ra, rb = S.unify(self._dicts[n], other._dicts[n])
            remapped[n] = (jnp.asarray(ra)[self._cols[n]],
                           jnp.asarray(rb)[other._cols[n]])
            out_dicts[n] = union
        cols = {
            n: (jnp.concatenate(remapped[n]) if n in remapped
                else jnp.concatenate([c, other._cols[n]]))
            for n, c in self._cols.items()
        }
        if self._count is None and other._count is None:
            return Table(cols, dictionaries=out_dicts)
        flag = jnp.concatenate([
            (~self.valid_mask()).astype(jnp.uint32),
            (~other.valid_mask()).astype(jnp.uint32),
        ])
        out = Q._stable_sort([flag, *cols.values()], num_keys=1)
        total = (
            (self._count if self._count is not None else jnp.int32(self._n))
            + (other._count if other._count is not None
               else jnp.int32(other._n))
        )
        return Table(dict(zip(cols, out[1:])), total,
                     dictionaries=out_dicts)

    def quantiles(self, column, qs, *, method: str = "lower"):
        """Exact quantiles of a column's valid rows (see
        :func:`radix_sort_tpu.quantiles`). With padding present this sorts
        (validity, column) and picks ranks inside the valid prefix."""
        if isinstance(column, str) and column in self._dicts:
            raise TypeError(
                f"quantiles on string column {column!r}: quantiles of "
                f"dictionary codes would be surprising — take them on "
                f"t[{column!r}] and decode(..) explicitly if intended"
            )
        (col,) = self._resolve([column])
        if self._count is None:
            return rst.quantiles(col, qs, method=method)
        # order by (valid-first, value); rank r of the valid prefix is row r
        flag = self._flag()
        limbs = K.encode_limbs(col)
        out = Q._stable_sort([flag, *limbs], num_keys=1 + len(limbs))
        svals = K.decode_limbs(list(out[1:]), col.dtype)
        # static ranks against the dynamic count: scale inside the trace
        qs = [float(q) for q in qs]
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile points must be in [0, 1], got {q}")
        from radix_sort_tpu.ops.relational import QUANTILE_METHODS
        if method not in QUANTILE_METHODS:
            raise ValueError(
                f"method must be one of {QUANTILE_METHODS}, got {method!r}"
            )
        x = jnp.asarray(qs, jnp.float32) * (self._count - 1).astype(
            jnp.float32
        )
        if method == "lower":
            r = jnp.floor(x)
        elif method == "higher":
            r = jnp.ceil(x)
        else:
            r = jnp.floor(x + 0.5)
        idx = jnp.clip(r.astype(jnp.int32), 0,
                       jnp.maximum(self._count - 1, 0))
        return svals[idx]

    # ---- deferred execution ---------------------------------------------

    def lazy(self):
        """A :class:`~radix_sort_tpu.plan.LazyTable` rooted at this table:
        record the pipeline as a logical plan, optimize (filter/sort/window
        fusion, sort+limit -> top_k, projection pruning), execute on
        ``collect()``."""
        from radix_sort_tpu.plan import LazyTable, Source

        return LazyTable(Source(self))

    # ---- materialization ------------------------------------------------

    def to_numpy(self):
        """dict of numpy arrays holding ONLY the valid rows (eager only:
        fetches ``count`` to the host). String columns decode through
        their dictionaries back to numpy unicode arrays."""
        n = self._n if self._count is None else int(self._count)
        out = {}
        for name, col in self._cols.items():
            a = np.asarray(col[:n])
            if name in self._dicts:
                a = S.decode(a, self._dicts[name])
            out[name] = a
        return out
