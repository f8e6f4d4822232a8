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

import jax
import jax.numpy as jnp
import numpy as np

import radix_sort_tpu as rst
from radix_sort_tpu import dates as DT
from radix_sort_tpu import keys as K
from radix_sort_tpu import nulls as NL
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
    "range_min", "range_max",
)


def _as_list(x):
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


class Table:
    """An immutable relation: equal-length named columns + a valid-row
    count (the static-shape convention; rows [0, count) are the data)."""

    def __init__(self, columns, count=None, dictionaries=None,
                 null_masks=None):
        cols = dict(columns)
        if not cols:
            raise ValueError("a Table needs at least one column")
        dicts = dict(dictionaries) if dictionaries else {}
        masks = {n: m for n, m in (null_masks or {}).items()
                 if m is not None}
        n = None
        for name, c in list(cols.items()):
            if NL.is_mask_name(name):
                # internal path: a companion null-mask column inline
                cols[name] = jnp.asarray(c, jnp.bool_)
                continue
            if "\x00" in name:
                raise ValueError(f"column name {name!r} contains NUL")
            det = NL.detect(c)
            if det is not None:
                c, masks[name] = det  # np.ma / None-bearing host input
            if name not in dicts and S.is_string_data(c):
                # dictionary-encode host string data: uint32 codes on
                # device, sorted vocabulary on host (order-preserving)
                codes, vocab = S.encode(c)
                dicts[name] = vocab
                c = codes
            elif DT.is_datetime_data(c):
                # Arrow storage convention: date32 epoch days / int64
                # epoch microseconds (dates.py); decode via
                # dates.decode_days / decode_us
                c, unit = DT.encode_datetime64(c)
                if unit == "us" and not jax.config.jax_enable_x64:
                    raise TypeError(
                        f"column {name!r}: sub-day datetime64 needs "
                        f"int64 microseconds — enable jax_enable_x64, "
                        f"or pass day-resolution datetime64[D] data"
                    )
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
        if n is None:
            raise ValueError("a Table needs at least one data column "
                             "(only null-mask columns were given)")
        for name, c in cols.items():
            # inline mask columns skipped the first-pass length check
            # (n may not be known when they appear); validate them now so
            # a wrong-length mask fails here, not deep inside a kernel
            if NL.is_mask_name(name) and c.shape != (n,):
                raise ValueError(
                    f"null-mask column {name!r} has shape {c.shape}, "
                    f"expected ({n},)"
                )
        for name, m in masks.items():
            if name not in cols:
                raise ValueError(f"null mask for unknown column {name!r}")
            m = jnp.asarray(m, jnp.bool_)
            if m.shape != (n,):
                raise ValueError(
                    f"null mask for {name!r} has shape {m.shape}, "
                    f"expected ({n},)"
                )
            cols[NL.mask_name(name)] = m
        for name in list(cols):
            # the engine invariant: values are 0 wherever the mask is True
            # (what makes NULL==NULL grouping and null-safe sums work)
            mn = NL.mask_name(name)
            if not NL.is_mask_name(name) and mn in cols:
                cols[name] = jnp.where(
                    cols[mn], jnp.zeros((), cols[name].dtype), cols[name]
                )
        self._cols = cols
        self._n = n
        self._count = None if count is None else jnp.asarray(count, jnp.int32)
        self._dicts = {k: v for k, v in dicts.items() if k in cols}

    @classmethod
    def from_csv(cls, path: str, *, delimiter: str = ",",
                 dtypes=None) -> "Table":
        """Read a headered CSV into a Table. With the native C++ loader
        (native/csv_loader.cpp) string columns arrive ALREADY
        dictionary-encoded (codes + sorted vocabulary) and empty fields
        become SQL NULL masks — no per-row Python string work; without a
        compiler this falls back to the numpy path (utils/io.read_csv),
        which dictionary-encodes in the constructor."""
        from radix_sort_tpu.utils.io import read_csv, read_csv_encoded

        if not dtypes:
            try:
                cols, dicts, masks = read_csv_encoded(
                    path, delimiter=delimiter
                )
            except RuntimeError:
                pass
            else:
                return cls(cols, dictionaries=dicts,
                           null_masks=masks or None)
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
        return [n for n in self._cols if not NL.is_mask_name(n)]

    def __getitem__(self, name: str) -> jnp.ndarray:
        return self._cols[name]

    def __contains__(self, name: str) -> bool:
        return name in self._cols

    def __repr__(self):
        cnt = "all" if self._count is None else "traced"
        return (f"Table({self._n} rows [{cnt} valid], "
                f"columns={self.column_names})")

    # ---- NULLs (nulls.py: hidden companion mask columns) -----------------

    def is_nullable(self, name: str) -> bool:
        """True if ``name`` carries a null mask."""
        return NL.mask_name(name) in self._cols

    def null_mask(self, name: str):
        """The column's bool null mask (True = NULL), or None."""
        return self._cols.get(NL.mask_name(name))

    @property
    def nullable_columns(self):
        return [n for n in self.column_names if self.is_nullable(n)]

    def _key_words(self, ref, arr):
        """Key words of one sort/group key: the null-mask word first
        (NULL sorts as +infinity / groups with NULL), then the encoded
        value limbs. ``ref`` is the key's spec: a column name, a
        :class:`~radix_sort_tpu.nulls.MaskedColumn`, or a raw array."""
        m = self._mask_of_ref(ref)
        words = [] if m is None else [m.astype(jnp.uint32)]
        words.extend(K.encode_limbs(arr))
        return words, m is not None

    def _mask_of_ref(self, ref):
        if isinstance(ref, str):
            return self.null_mask(ref)
        if isinstance(ref, NL.MaskedColumn):
            return jnp.asarray(ref.mask, jnp.bool_)
        return None

    def _resolve_masked(self, cols):
        """Like :meth:`_resolve` but keeps the original refs (so callers
        can recover null masks) and canonicalizes masked values to 0."""
        refs = _as_list(cols)
        arrs = []
        for c in refs:
            if isinstance(c, str):
                arrs.append(self._cols[c])
            elif isinstance(c, NL.MaskedColumn):
                v = jnp.asarray(c.values)
                arrs.append(jnp.where(jnp.asarray(c.mask, jnp.bool_),
                                      jnp.zeros((), v.dtype), v))
            else:
                arrs.append(jnp.asarray(c))
        return arrs, refs

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
        cols = {}
        for n in names:
            cols[n] = self._cols[n]
            mn = NL.mask_name(n)
            if mn in self._cols:
                cols[mn] = self._cols[mn]
        return Table(cols, self._count, dictionaries=self._subdicts(names))

    def drop(self, *names) -> "Table":
        gone = set(names)
        keep = {
            n: c for n, c in self._cols.items()
            if (NL.base_name(n) if NL.is_mask_name(n) else n) not in gone
        }
        return Table(keep, self._count, dictionaries=self._subdicts(keep))

    def rename(self, mapping) -> "Table":
        def new(n):
            if NL.is_mask_name(n):
                b = NL.base_name(n)
                return NL.mask_name(mapping.get(b, b))
            return mapping.get(n, n)

        return Table(
            {new(n): c for n, c in self._cols.items()},
            self._count,
            dictionaries={mapping.get(n, n): d
                          for n, d in self._dicts.items()},
        )

    def with_columns(self, **named) -> "Table":
        from radix_sort_tpu.expr import Expr

        cols = dict(self._cols)
        dicts = dict(self._dicts)
        for n, c in named.items():
            if isinstance(c, Expr):
                # evaluate eagerly against this table (the lazy planner
                # routes here through plan._value the same way)
                sr = c.string_result(self)
                if sr is not None:
                    c = S.DictColumn(*sr)
                else:
                    v, em = c.evaluate_masked(self)
                    c = v if em is None else NL.MaskedColumn(v, em)
            m = None
            if isinstance(c, S.DictColumn):
                # a computed string column (UPPER(x), a || '-sfx', ...):
                # codes on device, output dictionary from the expression
                dicts[n] = c.vocab
                c, m = c.codes, c.mask
            else:
                det = NL.detect(c)
                if det is not None:
                    c, m = det
                if S.is_string_data(c):
                    codes, vocab = S.encode(c)
                    dicts[n] = vocab
                    c = codes
                else:
                    dicts.pop(n, None)  # replaced by a numeric column
            c = jnp.asarray(c)
            if c.ndim == 0:
                c = jnp.broadcast_to(c, (self._n,))  # NULL / str literal
            if c.shape[0] != self._n:
                raise ValueError(
                    f"column {n!r} has length {c.shape[0]}, expected {self._n}"
                )
            if m is not None:
                m = jnp.broadcast_to(jnp.asarray(m, jnp.bool_), (self._n,))
                cols[NL.mask_name(n)] = m
                c = jnp.where(m, jnp.zeros((), c.dtype), c)
            else:
                cols.pop(NL.mask_name(n), None)  # replaced, no longer null
            cols[n] = c
        return Table(cols, self._count, dictionaries=dicts)

    # ---- relational operators ------------------------------------------

    def _merged_flag(self, where=None):
        """The leading validity flag word with an optional WHERE
        predicate folded in (nonzero = excluded row), or None when every
        row participates."""
        flag = self._flag()
        if where is None:
            return flag
        w = (~self._eval_pred(where)).astype(jnp.uint32)
        return w if flag is None else (flag | w)

    def _eval_pred(self, mask):
        """A WHERE predicate (bool column, :class:`Expr`, or callable)
        -> a plain bool row mask; a nullable predicate keeps only rows
        where it is known TRUE (SQL WHERE semantics)."""
        from radix_sort_tpu.expr import Expr

        if isinstance(mask, Expr):
            v, m = mask.evaluate_masked(self)
            mask = v if m is None else (v & ~m)
        elif callable(mask):
            mask = mask(self)
        if isinstance(mask, NL.MaskedColumn):
            mask = jnp.asarray(mask.values) & ~jnp.asarray(mask.mask)
        mask = jnp.asarray(mask)
        if mask.ndim == 0:
            # all-scalar predicate (e.g. WHERE 1 = NULL): broadcast to rows
            mask = jnp.broadcast_to(mask, (self._n,))
        return mask

    def filter(self, mask) -> "Table":
        """Rows where ``mask`` holds (a bool column, an :class:`Expr`, or
        a callable taking this Table), compacted to the front in original
        order. A nullable predicate keeps only rows where it is known
        TRUE (SQL WHERE semantics)."""
        mask = self._eval_pred(mask)
        if self._count is not None:
            mask = mask & self.valid_mask()
        *out, cnt = rst.filter(mask, *self._cols.values())
        return Table(dict(zip(self._cols, out)), cnt,
                     dictionaries=self._dicts)

    def sort_by(self, by, descending=False, nulls_last=None) -> "Table":
        """Stable sort of the valid rows by one or more columns (every
        other column rides the one variadic sort; padding stays last).
        ``descending`` is a bool or a per-column list. NULL keys default
        to +infinity — last ascending, first descending (PostgreSQL);
        ``nulls_last`` (bool / per-column list of bool-or-None) overrides
        per key by complementing only the null-mask word."""
        by = _as_list(by)
        desc = ([descending] * len(by)
                if isinstance(descending, bool) else list(descending))
        if len(desc) != len(by):
            raise ValueError("descending list must match the by list")
        nlast = ([nulls_last] * len(by)
                 if nulls_last is None or isinstance(nulls_last, bool)
                 else list(nulls_last))
        if len(nlast) != len(by):
            raise ValueError("nulls_last list must match the by list")
        key_cols, by = self._resolve_masked(by)
        limbs = []
        for c, d, nl_, name in zip(key_cols, desc, nlast, by):
            words, has_mask = self._key_words(name, c)
            if has_mask:
                eff_last = (not d) if nl_ is None else bool(nl_)
                limbs.append(words[0] if eff_last else ~words[0])
                words = words[1:]
            limbs.extend(~w if d else w for w in words)
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
        ascending lexicographically (NULL last, one group per SQL
        semantics: NULL groups with NULL). Non-subset columns are dropped
        (their per-group representative would be arbitrary)."""
        names = _as_list(subset) or self.column_names
        key_cols, names = self._resolve_masked(names)
        flag = self._flag()
        keys_arg = [] if flag is None else [flag]
        has_mask = []
        for name, c in zip(names, key_cols):
            m = self._mask_of_ref(name)
            if m is not None:
                keys_arg.append(m.astype(jnp.uint32))
            has_mask.append(m is not None)
            keys_arg.append(c)
        uk, _, num = rst.unique(
            keys_arg if len(keys_arg) > 1 else keys_arg[0]
        )
        uks = list(uk) if isinstance(uk, (list, tuple)) else [uk]
        if flag is not None:
            fcol, uks = uks[0], uks[1:]
            pos = jnp.arange(uks[0].shape[0], dtype=jnp.int32)
            num = jnp.sum(((pos < num) & (fcol == 0)).astype(jnp.int32))
        cols, i = {}, 0
        for name, hm in zip(names, has_mask):
            if hm:
                cols[NL.mask_name(name)] = uks[i].astype(jnp.bool_)
                i += 1
            cols[name] = uks[i]
            i += 1
        return Table(cols, num, dictionaries=self._subdicts(names))

    def aggregate(self, by, aggs, *, where=None) -> "Table":
        """GROUP BY ``by`` (a column name/list, or None for one global
        group over the valid rows) computing ``aggs``: a dict of output
        name -> ``(agg, column)`` with agg in sum/count/min/max/mean/
        any/all/first/last/median/mode/var/std/count_distinct/argmin/
        argmax (``"count"`` alone also works). ``where`` (a predicate as
        :meth:`filter` takes) restricts the aggregated rows WITHOUT a
        separate compaction pass: excluded rows ride the key sort's
        leading validity flag word, so WHERE + GROUP BY costs one sort
        (the planner fuses Filter-under-Aggregate onto this). One shared
        key sort computes every aggregate (the engine's multi-aggregate;
        median/mode/count_distinct/argmin/argmax each add one
        (key, value) sort). ``argmin``/``argmax`` report positions in
        this table's row numbering."""
        by = _as_list(by)
        if not aggs:
            if not by:
                raise ValueError("aggregate needs group keys or aggs")
            base = self.filter(where) if where is not None else self
            return base.distinct(by)  # GROUP BY with no aggregates
        key_cols, by = self._resolve_masked(by)
        flag = self._merged_flag(where)
        keys_arg = [] if flag is None else [flag]
        key_has_mask = []
        if not key_cols:
            keys_arg.append(jnp.zeros((self._n,), jnp.uint32))
        for kname, kc in zip(by, key_cols):
            m = self._mask_of_ref(kname)
            if m is not None:
                keys_arg.append(m.astype(jnp.uint32))
            key_has_mask.append(m is not None)
            keys_arg.append(kc)
        names, val_cols, agg_list, post, out_dicts = \
            self._agg_plan(keys_arg, aggs)
        uk, outs, cnt = rst.hash_aggregate(keys_arg, val_cols, agg_list)
        return self._agg_finish(by, key_has_mask, post, out_dicts,
                                uk, outs, cnt, has_flag=flag is not None)

    def _agg_plan(self, keys_arg, aggs):
        """Parse an ``aggs`` dict into the engine multi-aggregate call
        (value columns + engine agg names, with the NULL-skipping
        rewrites) and the post-processing plan — shared by
        :meth:`aggregate` and the grouping-sets prefix-chain path."""
        names, val_cols, agg_list, out_dicts = [], [], [], {}
        # post-processing plan: (out_name, kind, value-slot indexes...)
        post, nonnull_slot = [], {}

        def _slot(agg, arr):
            val_cols.append(arr)
            agg_list.append(agg)
            return len(val_cols) - 1

        def _nonnull(m, key):
            # one shared non-null counter per distinct nullable column
            if key not in nonnull_slot:
                nonnull_slot[key] = _slot("sum", (~m).astype(jnp.int32))
            return nonnull_slot[key]

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
            if agg in _NUMERIC_ONLY_AGGS or \
                    agg.startswith("quantile_cont:"):
                self._no_string(col, f"{out_name!r}: {agg}")
            elif (isinstance(col, str) and col in self._dicts
                  and (agg in ("min", "max", "first", "last", "mode",
                               "median")
                       or agg.startswith("quantile:"))):
                # value-typed output: inherits the source dictionary
                out_dicts[out_name] = self._dicts[col]
            names.append(out_name)
            m = self._mask_of_ref(col)
            if isinstance(col, NL.MaskedColumn):
                arr = jnp.asarray(col.values)
                arr = jnp.where(m, jnp.zeros((), arr.dtype), arr)
                mkey = id(col)
            else:
                arr = self._resolve(col)[0]
                mkey = col if isinstance(col, str) else id(col)
            if m is None:
                post.append((out_name, "plain", _slot(agg, arr)))
                continue
            # NULL-skipping rewrites (values are 0 under the mask):
            if agg == "count":
                # COUNT(col): non-null rows only; never NULL itself
                post.append((out_name, "plain", _nonnull(m, mkey)))
            elif agg == "sum":
                post.append((out_name, "nullable", _slot("sum", arr),
                             _nonnull(m, mkey)))
            elif agg == "mean":
                ft = (jnp.float64 if arr.dtype == jnp.float64
                      else jnp.float32)
                post.append((out_name, "mean",
                             _slot("sum", arr.astype(ft)),
                             _nonnull(m, mkey)))
            elif agg == "min":
                filled = jnp.where(m, NL.dtype_max(arr.dtype), arr)
                post.append((out_name, "nullable", _slot("min", filled),
                             _nonnull(m, mkey)))
            elif agg == "max":
                filled = jnp.where(m, NL.dtype_min(arr.dtype), arr)
                post.append((out_name, "nullable", _slot("max", filled),
                             _nonnull(m, mkey)))
            elif agg == "any":
                post.append((out_name, "nullable", _slot("any", arr),
                             _nonnull(m, mkey)))
            elif agg == "all":
                filled = jnp.where(m, jnp.ones((), arr.dtype), arr)
                post.append((out_name, "nullable", _slot("all", filled),
                             _nonnull(m, mkey)))
            elif agg in ("first", "last"):
                # the value AND its nullness at the group's first/last row
                post.append((out_name, "pair", _slot(agg, arr),
                             _slot(agg, m.astype(jnp.int32))))
            else:
                raise TypeError(
                    f"{out_name!r}: aggregate {agg!r} over a NULLABLE "
                    f"column is not supported (holistic aggregates need "
                    f"non-null inputs here) — fill_null(...) or filter "
                    f"is_not_null() first"
                )
        return names, val_cols, agg_list, post, out_dicts

    def _agg_finish(self, by, key_has_mask, post, out_dicts, uk, outs,
                    cnt, *, has_flag):
        """Assemble an aggregated Table from the engine's padded
        ``(unique_keys, aggregates, count)`` outputs —
        :meth:`_agg_plan`'s counterpart."""
        uks, outs = list(uk), list(outs)
        if has_flag:
            fcol, uks = uks[0], uks[1:]
            pos = jnp.arange(self._n, dtype=jnp.int32)
            cnt = jnp.sum(((pos < cnt) & (fcol == 0)).astype(jnp.int32))
        cols, i = {}, 0
        for kname, hm in zip(by, key_has_mask):  # drops the dummy key
            if hm:
                cols[NL.mask_name(kname)] = uks[i].astype(jnp.bool_)
                i += 1
            cols[kname] = uks[i]
            i += 1
        for item in post:
            out_name, kind = item[0], item[1]
            if kind == "plain":
                cols[out_name] = outs[item[2]]
                continue
            if kind == "pair":
                v, mi = outs[item[2]], outs[item[3]]
                gm = mi != 0
            else:
                v, nn = outs[item[2]], outs[item[3]]
                gm = nn == 0  # all-NULL group -> NULL result (SQL)
                if kind == "mean":
                    denom = jnp.maximum(nn, 1).astype(v.dtype)
                    v = v / denom
            cols[out_name] = jnp.where(gm, jnp.zeros((), v.dtype), v)
            cols[NL.mask_name(out_name)] = gm
        return Table(cols, cnt,
                     dictionaries={**self._subdicts(by), **out_dicts})

    def aggregate_sets(self, sets, aggs, grouping=None, *,
                       where=None) -> "Table":
        """SQL GROUPING SETS (and its ROLLUP / CUBE shorthands): UNION
        ALL of one :meth:`aggregate` per grouping set over the same
        ``aggs``, with group keys absent from a set returned as typed
        NULL columns (masked; string keys keep their dictionary, so the
        rolled-up rows decode to ``""`` with the mask set). ``sets`` is
        an iterable of name lists (``[]``/``None`` = the grand total).
        ``grouping``: {out_name: key} adds the SQL ``GROUPING(key)``
        indicator column (int32: 0 = grouped in this row's set, 1 =
        rolled up). Every level is exact (holistic aggregations
        included): when all aggregations are segment-computable
        (sum/count/mean/min/max/any/all/var/std), subset-nested sets
        share ONE key sort per chain — a ROLLUP's levels are prefixes
        of one key list, so the whole rollup costs one n-row sort plus
        a cheap compaction per level (``hash_aggregate_levels``);
        order-dependent or (key,value)-sorted aggregations
        (first/last/median/mode/...) fall back to one independent
        aggregate per set.

        The reference crate is sort-only (src/radix_sort/mod.rs);
        grouping sets belong to the north-star query-engine surface."""
        sets = [list(_as_list(s)) if s else [] for s in sets]
        if not sets:
            raise ValueError("aggregate_sets needs at least one "
                             "grouping set")
        all_keys = list(dict.fromkeys(k for s in sets for k in s))
        grouping = dict(grouping or {})
        for gname, key in grouping.items():
            if key not in all_keys:
                raise ValueError(
                    f"GROUPING({key!r}) must reference a column of some "
                    f"grouping set (have {all_keys})"
                )
        order = [*all_keys, *aggs.keys(), *grouping.keys()]
        tables = self._aggregate_set_tables(sets, aggs, where=where)
        out = None
        for s in sets:
            t = tables[frozenset(s)]
            add = {}
            for k in all_keys:
                if k in s:
                    continue
                src = self._cols[k]
                zeros = jnp.zeros((t._n,), src.dtype)
                ones = jnp.ones((t._n,), jnp.bool_)
                if k in self._dicts:
                    add[k] = S.DictColumn(zeros.astype(jnp.uint32),
                                          self._dicts[k], ones)
                else:
                    add[k] = NL.MaskedColumn(zeros, ones)
            for gname, key in grouping.items():
                add[gname] = jnp.full((t._n,), 0 if key in s else 1,
                                      jnp.int32)
            if add:
                t = t.with_columns(**add)
            t = t.select(*order)
            out = t if out is None else out.concat(t)
        return out

    def _aggregate_set_tables(self, sets, aggs, where=None):
        """One aggregated Table per DISTINCT grouping set (keyed by
        frozenset). Subset-nested sets whose aggregations are all
        segment-computable are planned as prefix CHAINS: the chain's
        key columns are ordered innermost-out so every member is a
        leading prefix of the full key list, and one
        ``hash_aggregate_levels`` call (one shared sort) produces every
        level. Everything else takes one :meth:`aggregate` per set."""
        def _agg_name(spec):
            return spec if isinstance(spec, str) else spec[0]

        shareable = aggs and all(
            _agg_name(spec) in Q.LEVEL_AGGREGATIONS
            for spec in aggs.values()
        )
        uniq = {}
        for s in sets:
            uniq.setdefault(frozenset(s), list(s))
        chains = []
        if shareable:
            # greedy nesting: largest first; append to the first chain
            # whose current innermost set strictly contains this one
            for s in sorted(uniq.values(), key=len, reverse=True):
                for ch in chains:
                    if frozenset(s) < frozenset(ch[-1]):
                        ch.append(s)
                        break
                else:
                    chains.append([s])
        else:
            chains = [[s] for s in uniq.values()]
        tables = {}
        for ch in chains:
            if len(ch) == 1:
                tables[frozenset(ch[0])] = self.aggregate(
                    ch[0] or None, dict(aggs), where=where
                )
                continue
            full_by = []
            for s in reversed(ch):
                full_by.extend(k for k in s if k not in full_by)
            key_cols, by = self._resolve_masked(full_by)
            flag = self._merged_flag(where)
            keys_arg = [] if flag is None else [flag]
            key_has_mask = []
            level_at = [len(keys_arg)]  # keys_arg width per key prefix
            for kname, kc in zip(by, key_cols):
                m = self._mask_of_ref(kname)
                if m is not None:
                    keys_arg.append(m.astype(jnp.uint32))
                key_has_mask.append(m is not None)
                keys_arg.append(kc)
                level_at.append(len(keys_arg))
            names, val_cols, agg_list, post, out_dicts = \
                self._agg_plan(keys_arg, aggs)
            levels = rst.hash_aggregate_levels(
                keys_arg, val_cols, agg_list,
                [level_at[len(s)] for s in ch],
            )
            for s, (uk, louts, cnt) in zip(ch, levels):
                k = len(s)
                tables[frozenset(s)] = self._agg_finish(
                    by[:k], key_has_mask[:k], post, out_dicts,
                    uk, louts, cnt, has_flag=flag is not None,
                )
        return tables

    def _join_keys(self, other, on, lextra_null=None, rextra_null=None):
        """Shared join key prep: resolve the ``on`` columns on both sides
        (unifying string dictionaries), collect key NULL masks, and fold
        validity/NULL state into per-side leading flag words. Returns
        ``(lk, rk, key_dicts, lkey_masks, rkey_masks, flagged)``.
        ``lextra_null``/``rextra_null`` merge additional no-match masks
        into the flags (e.g. NULL band columns in :meth:`join_band`)."""
        lk, rk, key_dicts = [], [], {}
        lkey_masks, rkey_masks = {}, {}
        lnull, rnull = lextra_null, rextra_null
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
            if isinstance(name, str):
                lm = self.null_mask(name)
                rm = other.null_mask(name)
                if lm is not None:
                    lkey_masks[name] = lm
                    lnull = NL.merge_masks(lnull, lm)
                if rm is not None:
                    rkey_masks[name] = rm
                    rnull = NL.merge_masks(rnull, rm)
            lk.append(lc)
            rk.append(rc)
        lflag, rflag = self._flag(), other._flag()
        if (lflag is not None or rflag is not None
                or lnull is not None or rnull is not None):
            # per-side flag words: padding never equals anything (left 1,
            # right 2, valid 0); NULL keys never match either — not even
            # each other (SQL) — so they get their own per-side values
            # (left 3, right 4), kept distinct from padding so outer
            # joins can still EMIT them unmatched
            lf = jnp.zeros((self._n,), jnp.uint32)
            if lnull is not None:
                lf = jnp.where(lnull, jnp.uint32(3), lf)
            if lflag is not None:
                lf = jnp.where(lflag != 0, jnp.uint32(1), lf)
            rf = jnp.zeros((other._n,), jnp.uint32)
            if rnull is not None:
                rf = jnp.where(rnull, jnp.uint32(4), rf)
            if rflag is not None:
                rf = jnp.where(rflag != 0, jnp.uint32(2), rf)
            lk, rk = [lf, *lk], [rf, *rk]
            flagged = True
        else:
            flagged = False
        return lk, rk, key_dicts, lkey_masks, rkey_masks, flagged

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
        joins require it. ``how="lookup"`` is the inner join of a
        key-UNIQUE ``other`` at semi-join cost (each left row pairs with
        its first match); duplicate right keys DEGRADE at runtime to the
        exact inner-join expansion, so the result is always exact and
        ``overflow`` reports only a capacity excess."""
        if capacity is None:
            if how in ("semi", "anti", "lookup"):
                capacity = self._n
            else:
                raise TypeError(
                    f"join(how={how!r}) needs an explicit capacity= (the "
                    f"static result size bound); only semi/anti joins have "
                    f"a natural default"
                )
        on = _as_list(on)
        (lk, rk, key_dicts, lkey_masks, rkey_masks,
         flagged) = self._join_keys(other, on)
        if how == "lookup":
            # direct-ride assembly: the output rows ARE the matched left
            # rows in left order, each with its single right match — so
            # every payload column (and its null mask) rides the
            # lookup's one compaction sort instead of paying a
            # capacity-sized surrogate gather per column
            lvs, lspec = [], []
            for n in self._cols:
                if n in on or NL.is_mask_name(n):
                    continue
                lvs.append(self._cols[n])
                m = self.null_mask(n)
                lspec.append((n, m is not None))
                if m is not None:
                    lvs.append(m)
            rvs, rspec = [], []
            for n in other._cols:
                if n in on or NL.is_mask_name(n):
                    continue
                rvs.append(other._cols[n])
                m = other.null_mask(n)
                rspec.append((n, m is not None))
                if m is not None:
                    rvs.append(m)
            jk, jlv, jrv, cnt, ovf = rst.hash_join(
                lk, lvs or [jnp.zeros((self._n,), jnp.uint32)],
                rk, rvs or [jnp.zeros((other._n,), jnp.uint32)],
                capacity=capacity, how="lookup",
            )
            jks = list(jk) if isinstance(jk, (list, tuple)) else [jk]
            if flagged:
                jks = jks[1:]  # NULL/padding keys never match
            cols = dict(zip(on, jks))
            dicts = dict(key_dicts)
            i = 0
            for n, hm in lspec:
                cols[n] = jlv[i]
                i += 1
                if hm:
                    cols[NL.mask_name(n)] = jlv[i]
                    i += 1
                if n in self._dicts:
                    dicts[n] = self._dicts[n]
            i = 0
            for n, hm in rspec:
                out_name = n + suffix if n in cols else n
                cols[out_name] = jrv[i]
                i += 1
                if hm:
                    cols[NL.mask_name(out_name)] = jrv[i]
                    i += 1
                if n in other._dicts:
                    dicts[out_name] = other._dicts[n]
            return Table(cols, cnt, dictionaries=dicts), ovf
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
            # unmatched PADDING rows emit under these variants; drop them.
            # NULL-key rows (flags 3/4) are real rows — the variants that
            # emit their side unmatched keep them (SQL outer semantics)
            keep_f = fcol == 0
            if how in ("left", "anti", "full"):
                keep_f = keep_f | (fcol == 3)
            if how in ("right", "full"):
                keep_f = keep_f | (fcol == 4)
            keep = valid & keep_f
            *packed, cnt = rst.filter(keep, *jks, jl, jr)
            jks, jl, jr = packed[:-2], packed[-2], packed[-1]
            valid = jnp.arange(capacity, dtype=jnp.int32) < cnt

        cols = dict(zip(on, jks))
        dicts = dict(key_dicts)
        matched_l = valid & (jl > 0)
        lg = jnp.clip(jl - 1, 0, self._n - 1)
        matched = valid & (jr > 0)
        rg = jnp.clip(jr - 1, 0, other._n - 1)
        if lkey_masks or rkey_masks:
            # a key cell is NULL iff its emitting row's key was NULL
            for name in on:
                lm = lkey_masks.get(name)
                rm = rkey_masks.get(name)
                if lm is None and rm is None:
                    continue
                km = jnp.where(
                    matched_l,
                    lm[lg] if lm is not None else False,
                    jnp.where(matched,
                              rm[rg] if rm is not None else False,
                              False),
                )
                cols[NL.mask_name(name)] = km
        for name, c in self._cols.items():
            if name in on or NL.is_mask_name(name):
                continue
            cols[name] = jnp.where(matched_l, c[lg], 0)
            lm = self.null_mask(name)
            if lm is not None or how in ("right", "full"):
                # unmatched-left cells (right/full joins) are SQL NULL
                src = lm[lg] if lm is not None else jnp.zeros_like(matched_l)
                cols[NL.mask_name(name)] = jnp.where(matched_l, src, True)
            if name in self._dicts:
                dicts[name] = self._dicts[name]
        if how in ("inner", "left", "right", "full"):
            for name, c in other._cols.items():
                if name in on or NL.is_mask_name(name):
                    continue
                out_name = name + suffix if name in cols else name
                cols[out_name] = jnp.where(matched, c[rg], 0)
                rm = other.null_mask(name)
                if rm is not None or how in ("left", "full"):
                    # unmatched-right cells (left/full joins) are SQL NULL
                    src = rm[rg] if rm is not None else jnp.zeros_like(matched)
                    cols[NL.mask_name(out_name)] = jnp.where(matched, src,
                                                             True)
                if name in other._dicts:
                    dicts[out_name] = other._dicts[name]
        return Table(cols, cnt, dictionaries=dicts), ovf

    def join_band(self, other: "Table", left_on: str, op: str, right_on, *,
                  on=None, capacity: int | None = None, how: str = "inner",
                  suffix: str = "_r"):
        """Non-equi (band / theta / interval) join with ``other``.

        Rows pair where the optional shared equality key(s) ``on`` match
        AND the band predicate holds: ``self[left_on] op
        other[right_on]`` for ``op`` in "<", "<=", ">", ">=" (engine
        names lt/le/gt/ge also accepted), or for ``op="between"``
        ``other[lo] <= self[left_on] <= other[hi]`` with
        ``right_on=(lo, hi)``. Band columns must be numeric/date (not
        strings) and share a dtype per compared pair; NULL band values
        match nothing (SQL). Returns ``(Table, overflow)``.

        Result columns: the ``on`` keys once, this table's other
        columns, and (inner/left) ``other``'s other columns renamed with
        ``suffix`` on collision — both band columns appear. Rows order
        by left row then right band order. ``capacity`` bounds the
        static result (for "between" it must cover the CANDIDATE rows —
        a tight superset of the matches, exact when each equi group's
        intervals don't interleave; see ``ops.query.band_join``);
        ``overflow`` reports truncation. ``how``:
        "inner"/"left"/"semi"/"anti" (inequality ops; semi/anti default
        ``capacity`` to this table's rows, always exact) — "between" is
        inner-only. Evaluation is one right-side sort + merge-rank range
        probes + the shared expansion (ops/query.band_join); the
        reference crate has no joins (SURVEY §2.2)."""
        opn = {"<": "lt", "<=": "le", ">": "gt", ">=": "ge"}.get(op, op)
        if opn not in Q.BAND_OPS:
            raise ValueError(
                f"op must be one of <, <=, >, >=, between "
                f"(or lt/le/gt/ge), got {op!r}"
            )
        if capacity is None:
            if how in ("semi", "anti"):
                capacity = self._n
            else:
                raise TypeError(
                    f"join_band(how={how!r}) needs an explicit capacity= "
                    f"(the static result size bound); only semi/anti "
                    f"joins have a natural default"
                )
        on = _as_list(on)
        rb_names = (list(right_on) if opn == "between"
                    else [right_on])
        if opn == "between" and len(rb_names) != 2:
            raise ValueError(
                'op="between" needs right_on=(lo_col, hi_col)'
            )
        for nm, t in ((left_on, self), *((n, other) for n in rb_names)):
            if isinstance(nm, str) and nm in t._dicts:
                raise TypeError(
                    f"band column {nm!r} is a string column — band "
                    f"predicates need numeric/date columns"
                )
        lb = self._resolve(left_on)[0]
        rbs = [other._resolve(nm)[0] for nm in rb_names]
        # NULL band values match nothing: fold into the equi flag words
        lb_null = (self.null_mask(left_on)
                   if isinstance(left_on, str) else None)
        rb_null = None
        for nm in rb_names:
            if isinstance(nm, str):
                rb_null = NL.merge_masks(rb_null, other.null_mask(nm))
        (lk, rk, key_dicts, lkey_masks, rkey_masks,
         flagged) = self._join_keys(other, on, lb_null, rb_null)
        keys_l = lk[1:] if flagged else lk

        lidx1 = jnp.arange(self._n, dtype=jnp.int32) + 1
        ridx1 = jnp.arange(other._n, dtype=jnp.int32) + 1
        jl, jr, cnt, ovf = Q.band_join(
            lb, lidx1, rbs if opn == "between" else rbs[0], ridx1,
            op=opn, capacity=capacity, how=how,
            left_equi=lk or None, right_equi=rk or None,
        )
        valid = jnp.arange(capacity, dtype=jnp.int32) < cnt
        if flagged and how in ("left", "anti"):
            # these variants emit unmatched LEFT rows — drop emitted
            # padding rows, keep NULL-keyed real rows (SQL outer
            # semantics); every output row has a left source (jl > 0)
            fcol = lk[0][jnp.clip(jl - 1, 0, self._n - 1)]
            keep = valid & ((fcol == 0) | (fcol == 3))
            jl, jr, cnt = (*rst.filter(keep, jl, jr),)
            valid = jnp.arange(capacity, dtype=jnp.int32) < cnt

        cols = dict()
        dicts = dict(key_dicts)
        matched_l = valid & (jl > 0)
        lg = jnp.clip(jl - 1, 0, self._n - 1)
        matched = valid & (jr > 0)
        rg = jnp.clip(jr - 1, 0, other._n - 1)
        # the shared equality keys, once, from the left side (equal on
        # every matched row; how="left" unmatched rows keep left values)
        for name, kc in zip(on, keys_l):
            cols[name] = jnp.where(matched_l, kc[lg], 0)
            lm = lkey_masks.get(name)
            if lm is not None:
                cols[NL.mask_name(name)] = jnp.where(
                    matched_l, lm[lg], False
                )
        for name, c in self._cols.items():
            if name in on or NL.is_mask_name(name):
                continue
            cols[name] = jnp.where(matched_l, c[lg], 0)
            lm = self.null_mask(name)
            if lm is not None:
                cols[NL.mask_name(name)] = jnp.where(matched_l, lm[lg],
                                                     False)
            if name in self._dicts:
                dicts[name] = self._dicts[name]
        if how in ("inner", "left"):
            for name, c in other._cols.items():
                if name in on or NL.is_mask_name(name):
                    continue
                out_name = name + suffix if name in cols else name
                cols[out_name] = jnp.where(matched, c[rg], 0)
                rm = other.null_mask(name)
                if rm is not None or how == "left":
                    # unmatched-right cells (left joins) are SQL NULL
                    src = (rm[rg] if rm is not None
                           else jnp.zeros_like(matched))
                    cols[NL.mask_name(out_name)] = jnp.where(
                        matched, src, True
                    )
                if name in other._dicts:
                    dicts[out_name] = other._dicts[name]
        return Table(cols, cnt, dictionaries=dicts), ovf

    def cross_join(self, other: "Table", *, capacity: int | None = None,
                   suffix: str = "_r"):
        """CROSS JOIN: every (left, right) pair of valid rows, ordered by
        left row then right row. Returns ``(Table, overflow)``.

        A cross join is the equi join on a synthesized constant key, so
        validity flags, NULL masks, and capacity semantics all ride the
        standard :meth:`join` machinery. ``capacity`` defaults to
        ``num_rows * other.num_rows`` — the exact static size (mind HBM
        on large inputs; pass a smaller bound + check ``overflow`` to
        cap it)."""
        if capacity is None:
            capacity = self._n * other._n
        name = "__cross_key__"
        while name in self._cols or name in other._cols:
            name += "_"
        zl = self.with_columns(**{
            name: jnp.zeros((self._n,), jnp.uint32)})
        zr = other.with_columns(**{
            name: jnp.zeros((other._n,), jnp.uint32)})
        out, ovf = zl.join(zr, name, capacity=capacity, how="inner",
                           suffix=suffix)
        return out.drop(name), ovf

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
        rk_null = other.null_mask(on) if isinstance(on, str) else None
        if rk_null is not None:
            # NULL right keys are never match candidates
            rvalid = (~rk_null if rvalid is None else (rvalid & ~rk_null))
        lk_null = self.null_mask(on) if isinstance(on, str) else None
        ridx = jnp.arange(other._n, dtype=jnp.int32)
        _, matched, rpos = rst.join_asof(
            lk, rk, ridx, direction=direction, tolerance=tolerance,
            right_valid=rvalid,
        )
        if self._count is not None:
            matched = matched & self.valid_mask()
        if lk_null is not None:
            matched = matched & ~lk_null  # NULL query keys never match
        rg = jnp.clip(rpos, 0, other._n - 1)
        cols = dict(self._cols)
        dicts = dict(self._dicts)
        for name, c in other._cols.items():
            if name == on or NL.is_mask_name(name):
                continue
            out_name = name + suffix if name in cols else name
            cols[out_name] = jnp.where(matched, c[rg], 0)
            rm = other.null_mask(name)
            if rm is not None:
                # matched rows inherit the source cell's nullness;
                # unmatched stay zero-filled (documented contract — use
                # matched_col to distinguish)
                cols[NL.mask_name(out_name)] = jnp.where(matched, rm[rg],
                                                         False)
            if name in other._dicts:
                dicts[out_name] = other._dicts[name]
        if matched_col is not None:
            cols[matched_col] = matched
        return Table(cols, self._count, dictionaries=dicts)

    def _set_op(self, other: "Table", subset, want) -> "Table":
        names = _as_list(subset) or self.column_names
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
        # NULL rows compare equal to NULL rows in set ops (SQL DISTINCT
        # semantics): weave a mask word per nullable column
        a_keys, b_keys, has_mask = [], [], []
        for i, name in enumerate(names):
            am = (self.null_mask(name) if isinstance(name, str) else None)
            bm = (other.null_mask(name) if isinstance(name, str) else None)
            hm = am is not None or bm is not None
            if hm:
                a_keys.append(
                    am.astype(jnp.uint32) if am is not None
                    else jnp.zeros((self._n,), jnp.uint32))
                b_keys.append(
                    bm.astype(jnp.uint32) if bm is not None
                    else jnp.zeros((other._n,), jnp.uint32))
            has_mask.append(hm)
            a_keys.append(a_cols[i])
            b_keys.append(b_cols[i])
        from radix_sort_tpu.ops import relational
        keys_out, count = relational._set_op(
            a_keys if len(a_keys) > 1 else a_keys[0],
            b_keys if len(b_keys) > 1 else b_keys[0],
            want,
            a_valid=None if self._count is None else self.valid_mask(),
            b_valid=None if other._count is None else other.valid_mask(),
        )
        kouts = (list(keys_out) if isinstance(keys_out, (list, tuple))
                 else [keys_out])
        cols, i = {}, 0
        for name, hm in zip(names, has_mask):
            if hm:
                cols[NL.mask_name(name)] = kouts[i].astype(jnp.bool_)
                i += 1
            cols[name] = kouts[i]
            i += 1
        return Table(cols, count, dictionaries=out_dicts)

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
        mask_spec_of = {}  # out_name -> index of its parallel mask spec
        tail_specs = []    # the mask specs, appended after the real ones
        for out_name, spec in ops.items():
            if isinstance(spec, str):
                specs.append(spec)
            else:
                spec = list(spec)
                # value-less parameterized ops (ntile, rolling_count) carry
                # ints after the name, not a value column
                if spec[0] not in ("ntile", "rolling_count",
                                   "range_count"):
                    if (isinstance(spec[1], str) and spec[1] in self._dicts):
                        if spec[0] in _VALUE_PRESERVING_WINDOW:
                            out_dicts[out_name] = self._dicts[spec[1]]
                        else:
                            self._no_string(
                                spec[1], f"window op {spec[0]!r}"
                            )
                    vmask = self._mask_of_ref(spec[1])
                    spec[1] = self._resolve_masked([spec[1]])[0][0]
                    if vmask is not None:
                        if spec[0] not in ("lag", "lead", "first_value",
                                           "last_value", "nth_value"):
                            raise TypeError(
                                f"window op {spec[0]!r} over a NULLABLE "
                                f"value column is not supported (only the "
                                f"row-selection ops lag/lead/first_value/"
                                f"last_value/nth_value carry NULLs "
                                f"through) — fill_null(...) first"
                            )
                        # the selection op applied to the mask itself
                        # yields the selected cell's nullness; out-of-
                        # window fills are NULL (fill=1)
                        mspec = [spec[0], vmask.astype(jnp.int32),
                                 *spec[2:]]
                        if spec[0] in ("lag", "lead", "nth_value"):
                            if len(mspec) == 2:
                                mspec.append(1)  # default offset / k
                            mspec = mspec[:3] + [1]  # fill = NULL
                        mask_spec_of[out_name] = (len(ops)
                                                  + len(tail_specs))
                        tail_specs.append(tuple(mspec))
                specs.append(tuple(spec))
        specs.extend(tail_specs)
        p_cols, _prefs = self._resolve_masked(partition_by)
        pmasks = [
            self._mask_of_ref(c).astype(jnp.uint32)
            for c in _as_list(partition_by)
            if self._mask_of_ref(c) is not None
        ]
        if pmasks:
            # NULL partition keys form ONE partition together (SQL)
            p_cols = [*pmasks, *p_cols]
        flag = self._flag()
        if flag is not None:
            p_cols = [flag, *p_cols]
        ob = _as_list(order_by)
        o_cols, o_desc = [], None
        if any(self._mask_of_ref(c) is not None for c in ob):
            # weave a NULL word per nullable order column: NULL orders
            # as +infinity (last ascending, first descending)
            desc_in = ([descending] * len(ob)
                       if descending is None or isinstance(descending, bool)
                       else list(descending))
            o_desc = []
            for c, d in zip(ob, desc_in):
                m = self._mask_of_ref(c)
                d = bool(d) if d is not None else False
                if m is not None:
                    o_cols.append(m.astype(jnp.uint32))
                    o_desc.append(d)
                o_cols.append(self._resolve_masked([c])[0][0])
                o_desc.append(d)
        else:
            o_cols = self._resolve(ob)
            o_desc = descending
        outs = rst.window(
            specs,
            partition_by=p_cols or None,
            order_by=o_cols or None,
            descending=o_desc,
        )
        if isinstance(outs, jnp.ndarray):
            outs = [outs]
        new_cols = dict(zip(ops, outs))
        for out_name, idx in mask_spec_of.items():
            new_cols[out_name] = NL.MaskedColumn(new_cols[out_name],
                                                 outs[idx] != 0)
        res = self.with_columns(**new_cols)
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
        key_cols, by = self._resolve_masked(by)
        keys_arg = []
        for name, c in zip(by, key_cols):
            m = self._mask_of_ref(name)
            if m is not None:
                # NULL keys behave as +infinity: first for largest
                # (ORDER BY ... DESC LIMIT semantics), last otherwise
                keys_arg.append(m.astype(jnp.uint32))
            keys_arg.append(c)
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
        if self.column_names != other.column_names:
            raise ValueError("concat needs identical column names")
        for n in self.column_names:
            c = self._cols[n]
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
        cols = {}
        for n in self.column_names:
            cols[n] = (jnp.concatenate(remapped[n]) if n in remapped
                       else jnp.concatenate([self._cols[n],
                                             other._cols[n]]))
            am, bm = self.null_mask(n), other.null_mask(n)
            if am is not None or bm is not None:
                # a side without a mask contributes all-non-null
                cols[NL.mask_name(n)] = jnp.concatenate([
                    am if am is not None
                    else jnp.zeros((self._n,), jnp.bool_),
                    bm if bm is not None
                    else jnp.zeros((other._n,), jnp.bool_),
                ])
        if self._count is None and other._count is None:
            return Table(cols, dictionaries=out_dicts)
        # counted path: both sides are valid-PREFIX tables, so packing
        # needs no sort — slide other's prefix up against ours with one
        # dynamic roll and select by position (pure streaming; the
        # former stable validity sort paid a full comparator sort over
        # n_a + n_b rows per concat, which dominated e.g. ROLLUP
        # emission). Tail rows beyond the combined count are arbitrary,
        # as the padding convention allows.
        ca = (self._count if self._count is not None
              else jnp.int32(self._n))
        cb = (other._count if other._count is not None
              else jnp.int32(other._n))
        pos = jnp.arange(self._n + other._n, dtype=jnp.int32)
        shift = ca - jnp.int32(self._n)
        cols = {name: jnp.where(pos < ca, c, jnp.roll(c, shift))
                for name, c in cols.items()}
        return Table(cols, ca + cb, dictionaries=out_dicts)

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
        m = self.null_mask(column) if isinstance(column, str) else None
        if self._count is None and m is None:
            return rst.quantiles(col, qs, method=method)
        # order by (valid-and-non-null-first, value); rank r of the
        # kept prefix is row r — NULLs are excluded (SQL order statistics)
        keep = self.valid_mask()
        if m is not None:
            keep = keep & ~m
        flag = (~keep).astype(jnp.uint32)
        eff_count = jnp.sum(keep.astype(jnp.int32))
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
        x = jnp.asarray(qs, jnp.float32) * (eff_count - 1).astype(
            jnp.float32
        )
        if method == "lower":
            r = jnp.floor(x)
        elif method == "higher":
            r = jnp.ceil(x)
        else:
            r = jnp.floor(x + 0.5)
        idx = jnp.clip(r.astype(jnp.int32), 0,
                       jnp.maximum(eff_count - 1, 0))
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
        their dictionaries back to numpy unicode arrays. NULLABLE columns
        come back as ``np.ma.MaskedArray`` (mask True = NULL; the data
        under the mask is 0 / ``""``)."""
        n = self._n if self._count is None else int(self._count)
        out = {}
        for name, col in self._cols.items():
            if NL.is_mask_name(name):
                continue
            a = np.asarray(col[:n])
            if name in self._dicts:
                a = S.decode(a, self._dicts[name])
            m = self.null_mask(name)
            if m is not None:
                a = np.ma.MaskedArray(a, mask=np.asarray(m[:n]))
            out[name] = a
        return out
