"""DistTable: the distributed (MPP) relation facade over the parallel
operators.

The row-sharded counterpart of :class:`radix_sort_tpu.Table`: named
columns live sharded over a device mesh axis, every relational verb routes
to the corresponding ``parallel/`` operator (splitter-sampled exchanges,
two-phase/repartition aggregation plans, carry-chain windows), and the
static-shape convention generalizes to the MPP layout — each shard owns a
VALID PREFIX of its rows, described by one replicated ``(P,)`` counts
vector. Concatenating the shards' valid prefixes IS the relation, in a
deterministic global order.

Validity weaves in the engine way (an extra leading key word), exactly as
the single-chip Table:

  - sorts order by (invalid-flag, keys...): valid rows form a global
    prefix across shards, per-shard counts are recomputed from the sorted
    flags;
  - group-bys/distincts/set-ops key on (invalid-flag, keys...): junk
    groups sort after all valid groups and drop from the output count;
  - joins key on per-side flags so padding never matches, with the same
    unmatched-padding post-filter as the single-chip facade;
  - windows partition on (invalid-flag, partition keys...).

Reduction-shaped verbs (aggregate / distinct / top_k / set ops) return a
REPLICATED single-chip :class:`Table` — their results are group-sized, and
every shard holds them after the gather/combine phase (the MPP
"coordinator" result). Row-shaped verbs (filter / sort_by / join / window
/ concat) stay sharded and return a DistTable.

The reference crate is a single-process CPU sort
(src/radix_sort/mod.rs:61-176, threads over chunks); this layer is the
north-star query-engine surface (BASELINE.json) scaled over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radix_sort_tpu import dates as DT
from radix_sort_tpu import keys as K
from radix_sort_tpu import nulls as NL
from radix_sort_tpu import strings as S
from radix_sort_tpu.ops import query as Q
from radix_sort_tpu.parallel import dist_asof, dist_query, dist_sort
from radix_sort_tpu.parallel import dist_window as DW
from radix_sort_tpu.table import (
    Table, _as_list, _NUMERIC_ONLY_AGGS, _VALUE_PRESERVING_WINDOW,
)

__all__ = ["DistTable"]


class DistTable:
    """An immutable row-sharded relation over ``mesh``'s ``axis_name``:
    equal-length named columns (length divisible by the axis size) plus a
    per-shard valid-row counts vector (``None`` = every row valid). Shard
    d's rows are the contiguous block ``[d*rows_per_shard, (d+1)*...)``
    and its valid rows are that block's prefix of ``counts[d]``."""

    def __init__(self, columns, mesh: Mesh, counts=None,
                 axis_name: str = "x", dictionaries=None):
        cols = dict(columns)
        if not cols:
            raise ValueError("a DistTable needs at least one column")
        dicts = dict(dictionaries) if dictionaries else {}
        nshards = mesh.shape[axis_name]
        n = None
        for name, c in cols.items():
            if name not in dicts and S.is_string_data(c):
                # dictionary-encode on host; codes shard like any uint32
                # column, the vocabulary is replicated host state
                codes, vocab = S.encode(c)
                dicts[name] = vocab
                c = codes
            elif DT.is_datetime_data(c):
                # Arrow storage: date32 epoch days / int64 epoch us
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
        if n % nshards != 0:
            raise ValueError(
                f"row count {n} must divide the mesh axis ({nshards})"
            )
        self._cols = cols
        self._n = n
        self._mesh = mesh
        self._axis = axis_name
        self._P = nshards
        self._nl = n // nshards
        if counts is not None:
            counts = jnp.asarray(counts, jnp.int32)
            if counts.shape != (nshards,):
                raise ValueError(
                    f"counts must have shape ({nshards},), got {counts.shape}"
                )
        self._counts = counts
        self._dicts = {k: v for k, v in dicts.items() if k in cols}

    # ---- construction ---------------------------------------------------

    @classmethod
    def from_table(cls, table: Table, mesh: Mesh,
                   axis_name: str = "x") -> "DistTable":
        """Shard a single-chip :class:`Table` row-wise over the mesh. The
        table's valid prefix maps to per-shard prefix counts."""
        nshards = mesh.shape[axis_name]
        n = table.num_rows
        if n % nshards != 0:
            raise ValueError(
                f"row count {n} must divide the mesh axis ({nshards})"
            )
        nl = n // nshards
        sh = NamedSharding(mesh, P(axis_name))
        cols = {name: jax.device_put(table[name], sh)
                for name in table.column_names}
        if table.count is None:
            counts = None
        else:
            # global valid prefix -> per-shard prefix counts
            starts = jnp.arange(nshards, dtype=jnp.int32) * nl
            counts = jnp.clip(table.count - starts, 0, nl)
        return cls(cols, mesh, counts, axis_name,
                   dictionaries=table._dicts)

    # ---- introspection --------------------------------------------------

    @property
    def num_rows(self) -> int:
        """Static row capacity across all shards (valid + padding)."""
        return self._n

    @property
    def rows_per_shard(self) -> int:
        return self._nl

    @property
    def mesh(self) -> Mesh:
        return self._mesh

    @property
    def counts(self):
        """Per-shard valid-row counts: a replicated (P,) int32 vector, or
        None when every row is valid."""
        return self._counts

    @property
    def column_names(self):
        return list(self._cols)

    def __getitem__(self, name: str) -> jnp.ndarray:
        return self._cols[name]

    def __contains__(self, name: str) -> bool:
        return name in self._cols

    def __repr__(self):
        cnt = "all" if self._counts is None else "traced"
        return (f"DistTable({self._P} shards x {self._nl} rows "
                f"[{cnt} valid], columns={list(self._cols)})")

    def total_count(self):
        """Total valid rows: an int32 scalar (``num_rows`` when all
        valid)."""
        if self._counts is None:
            return jnp.int32(self._n)
        return jnp.sum(self._counts)

    def valid_mask(self) -> jnp.ndarray:
        """Bool mask of each shard's valid prefix (sharded like the
        columns)."""
        if self._counts is None:
            return jnp.ones((self._n,), jnp.bool_)
        i = jnp.arange(self._n, dtype=jnp.int32)
        return (i % self._nl) < self._counts[i // self._nl]

    def _flag(self):
        """Leading validity key word: 0 valid, 1 invalid (None when the
        whole table is valid)."""
        if self._counts is None:
            return None
        return (~self.valid_mask()).astype(jnp.uint32)

    def _resolve(self, cols):
        out = []
        for c in _as_list(cols):
            out.append(self._cols[c] if isinstance(c, str) else jnp.asarray(c))
        return out

    # ---- string columns (same model as Table: uint32 codes sharded on
    # device, one replicated host-side sorted vocabulary per column) ------

    def is_string(self, name: str) -> bool:
        return name in self._dicts

    def dictionary(self, name: str) -> np.ndarray:
        return self._dicts[name]

    def code(self, name: str, value):
        """uint32 code(s) of string value(s) under ``name``'s dictionary
        (absent values get a code equal to nothing)."""
        return jnp.asarray(S.lookup(self._dicts[name], value))

    def decode(self, name: str, codes=None) -> np.ndarray:
        if codes is None:
            codes = self._cols[name]
        return S.decode(np.asarray(codes), self._dicts[name])

    def _subdicts(self, names):
        return {n: self._dicts[n] for n in names if n in self._dicts}

    def _no_string(self, col, what: str):
        if isinstance(col, str) and col in self._dicts:
            raise TypeError(
                f"{what} is arithmetic over values and is undefined on "
                f"string column {col!r} (dictionary codes)"
            )

    def _unify_key(self, other, name, lc, rc, key_dicts):
        """Remap one string join/set key pair into the unified code
        space; records the union vocabulary in ``key_dicts``."""
        if isinstance(name, str) and (
                (name in self._dicts) != (name in other._dicts)):
            raise TypeError(
                f"key {name!r} is a string column on one side only"
            )
        if isinstance(name, str) and name in self._dicts:
            union, ra, rb = S.unify(self._dicts[name], other._dicts[name])
            lc = jnp.asarray(ra)[lc]
            rc = jnp.asarray(rb)[rc]
            key_dicts[name] = union
        return lc, rc

    def _counts_from_flags(self, flag_col, fill_counts, nl):
        """Per-shard valid counts after a (flag, ...) sort: count the
        flag==0 rows inside each shard's exchange prefix of
        ``fill_counts``."""
        i = jnp.arange(flag_col.shape[0], dtype=jnp.int32)
        in_prefix = (i % nl) < fill_counts[i // nl]
        ok = (in_prefix & (flag_col == 0)).astype(jnp.int32)
        return jax.ops.segment_sum(ok, i // nl, num_segments=self._P)

    # ---- projection -----------------------------------------------------

    def select(self, *names) -> "DistTable":
        return DistTable({n: self._cols[n] for n in names}, self._mesh,
                         self._counts, self._axis,
                         dictionaries=self._subdicts(names))

    def drop(self, *names) -> "DistTable":
        keep = {n: c for n, c in self._cols.items() if n not in names}
        return DistTable(keep, self._mesh, self._counts, self._axis,
                         dictionaries=self._subdicts(keep))

    def rename(self, mapping) -> "DistTable":
        return DistTable(
            {mapping.get(n, n): c for n, c in self._cols.items()},
            self._mesh, self._counts, self._axis,
            dictionaries={mapping.get(n, n): d
                          for n, d in self._dicts.items()},
        )

    def with_columns(self, **named) -> "DistTable":
        from radix_sort_tpu.expr import Expr

        cols = dict(self._cols)
        dicts = dict(self._dicts)
        for n, c in named.items():
            if isinstance(c, Expr):
                # evaluate eagerly against this relation (codes stay
                # sharded; vocabularies are host-replicated). DistTable
                # carries no null masks, so nullable results are
                # rejected by the DictColumn / MaskedColumn checks below
                sr = c.string_result(self)
                if sr is not None:
                    c = S.DictColumn(*sr)
                else:
                    v, em = c.evaluate_masked(self)
                    if em is not None:
                        raise ValueError(
                            "DistTable.with_columns cannot carry a "
                            "nullable expression result"
                        )
                    c = v
            if isinstance(c, S.DictColumn):
                # a computed string column: sharded codes + host vocab
                # (DistTable has no null masks; drop a None mask only)
                if c.mask is not None:
                    raise ValueError(
                        "DistTable.with_columns cannot carry a null mask"
                    )
                dicts[n] = c.vocab
                c = c.codes
            elif S.is_string_data(c):
                codes, vocab = S.encode(c)
                dicts[n] = vocab
                c = codes
            else:
                dicts.pop(n, None)
            c = jnp.asarray(c)
            if c.ndim == 0:
                c = jnp.broadcast_to(c, (self._n,))
            if c.shape[0] != self._n:
                raise ValueError(
                    f"column {n!r} has length {c.shape[0]}, expected {self._n}"
                )
            cols[n] = c
        return DistTable(cols, self._mesh, self._counts, self._axis,
                         dictionaries=dicts)

    # ---- row-shaped verbs (stay sharded) ---------------------------------

    def _eval_pred(self, mask):
        """A WHERE predicate (bool column, ``Expr``, or callable) -> a
        plain bool row mask (known-TRUE under SQL null semantics)."""
        from radix_sort_tpu.expr import Expr

        if isinstance(mask, Expr):
            v, m = mask.evaluate_masked(self)
            mask = v if m is None else (v & ~m)
        elif callable(mask):
            mask = mask(self)
        mask = jnp.asarray(mask)
        if mask.ndim == 0:
            mask = jnp.broadcast_to(mask, (self._n,))
        return mask

    def _merged_flag(self, where=None):
        """The leading validity flag word with an optional WHERE
        predicate folded in (nonzero = excluded), or None."""
        flag = self._flag()
        if where is None:
            return flag
        w = (~self._eval_pred(where)).astype(jnp.uint32)
        return w if flag is None else (flag | w)

    def filter(self, mask) -> "DistTable":
        """Rows where ``mask`` holds (a bool column, an ``Expr``, or a
        callable taking this DistTable), compacted to each shard's front
        in shard order — the global filtered relation in original
        order. A nullable predicate keeps only rows where it is known
        TRUE (SQL WHERE semantics), matching ``Table.filter``."""
        mask = self._eval_pred(mask)
        if self._counts is not None:
            mask = mask & self.valid_mask()
        *out, counts = dist_query.distributed_filter(
            mask, *self._cols.values(), mesh=self._mesh,
            axis_name=self._axis,
        )
        return DistTable(dict(zip(self._cols, out)), self._mesh, counts,
                         self._axis, dictionaries=self._dicts)

    def _flag_sorted(self, limbs, ndesc=None):
        """One distributed stable sort of every column by ``limbs`` (with
        the validity flag leading when present); returns the new DistTable.
        ``ndesc``: per-limb complement mask for descending columns."""
        if ndesc:
            limbs = [~w if d else w for w, d in zip(limbs, ndesc)]
        flag = self._flag()
        key_limbs = [flag, *limbs] if flag is not None else list(limbs)
        if not key_limbs:
            key_limbs = [jnp.zeros((self._n,), jnp.uint32)]
            flag = None
        ows, ovs, fill_counts, _ = dist_sort.distributed_sort_limbs(
            key_limbs, list(self._cols.values()), mesh=self._mesh,
            axis_name=self._axis,
        )
        ovs = list(ovs) if isinstance(ovs, (list, tuple)) else [ovs]
        cap = ovs[0].shape[0] // self._P
        if flag is not None:
            counts = self._counts_from_flags(ows[0], fill_counts, cap)
        else:
            counts = fill_counts
        return DistTable(dict(zip(self._cols, ovs)), self._mesh, counts,
                         self._axis, dictionaries=self._dicts)

    def sort_by(self, by, descending=False) -> "DistTable":
        """Globally stable sort of the valid rows by one or more columns
        over the composite-splitter exchange (balanced for any
        distribution); every other column rides the one sort. The result's
        row capacity grows to the exchange bound; valid rows form a global
        prefix across shards. ``descending`` is a bool or per-column
        list."""
        by = _as_list(by)
        desc = ([descending] * len(by)
                if isinstance(descending, bool) else list(descending))
        if len(desc) != len(by):
            raise ValueError("descending list must match the by list")
        key_cols = self._resolve(by)
        limbs, ndesc = [], []
        for c, d in zip(key_cols, desc):
            ws = K.encode_limbs(c)
            limbs.extend(ws)
            ndesc.extend([bool(d)] * len(ws))
        return self._flag_sorted(limbs, ndesc)

    def join(self, other: "DistTable", on, *,
             capacity_per_shard: int | None = None,
             how: str = "inner", suffix: str = "_r",
             exchange_capacity_factor: float = 2.0,
             assume_unique: bool = False):
        """Equi-join with ``other`` on the shared ``on`` column(s) — the
        co-partitioned MPP join: both sides route by one shared splitter
        sketch, each shard joins locally. Returns ``(DistTable, overflow)``
        with the same column conventions as :meth:`Table.join` (suffix on
        collision; unmatched sides zero-filled; semi/anti emit left columns
        only).

        ``how="lookup"`` is the BROADCAST lookup join: ``other`` must be a
        replicated single-chip :class:`Table` with key-unique rows (e.g.
        an aggregate keyed by the join key). Each shard probes the
        replicated side in place — membership + first-match rank gather +
        one per-shard compaction, NO exchange of this relation at all.
        A right side that is NOT key-unique raises TypeError (pairs
        beyond the first match would silently drop); ``assume_unique``
        skips that eager check — for callers that construct a key-unique
        right side by construction (the planner's eager-aggregation
        rewrite), avoiding its one host sync."""
        if how == "lookup":
            return self._join_lookup(other, on, suffix=suffix,
                                     assume_unique=assume_unique)
        if how not in Q.JOIN_HOWS:
            raise ValueError(
                f"how must be one of {Q.JOIN_HOWS}, got {how!r}"
            )
        if capacity_per_shard is None:
            if how in ("semi", "anti"):
                # semi/anti emit at most one row per exchanged left row,
                # so the exchange capacity is the natural bound
                capacity_per_shard = int(
                    exchange_capacity_factor * self.rows_per_shard
                )
            else:
                raise TypeError(
                    f"join(how={how!r}) needs an explicit "
                    f"capacity_per_shard= (the static per-shard result "
                    f"bound); only semi/anti joins have a natural default"
                )
        on = _as_list(on)
        lk, rk, key_dicts = [], [], {}
        for name, lc, rc in zip(on, self._resolve(on), other._resolve(on)):
            lc, rc = self._unify_key(other, name, lc, rc, key_dicts)
            lk.append(lc)
            rk.append(rc)
        lflag, rflag = self._flag(), other._flag()
        flagged = lflag is not None or rflag is not None
        if flagged:
            lf = (lflag if lflag is not None
                  else jnp.zeros((self._n,), jnp.uint32))
            rf = ((rflag * jnp.uint32(2)) if rflag is not None
                  else jnp.zeros((other._n,), jnp.uint32))
            lk, rk = [lf, *lk], [rf, *rk]
        l_other = [n for n in self._cols if n not in on]
        r_other = [n for n in other._cols if n not in on]
        # the join contract zero-fills the unmatched side's values, so the
        # data columns ride the exchange directly (no index gathers)
        lv = [self._cols[n] for n in l_other] or [
            jnp.zeros((self._n,), jnp.uint32)
        ]
        rv = [other._cols[n] for n in r_other] or [
            jnp.zeros((other._n,), jnp.uint32)
        ]
        jk, jl, jr, counts, ovf = dist_query.distributed_hash_join(
            lk, lv, rk, rv, self._mesh, self._axis,
            capacity_per_shard=capacity_per_shard,
            exchange_capacity_factor=exchange_capacity_factor, how=how,
        )
        jks = list(jk) if isinstance(jk, (list, tuple)) else [jk]
        jls = list(jl) if isinstance(jl, (list, tuple)) else [jl]
        jrs = list(jr) if isinstance(jr, (list, tuple)) else [jr]
        cols = {}
        dicts = dict(key_dicts)
        if flagged:
            fcol, jks = jks[0], jks[1:]
        cols.update(zip(on, jks))
        cols.update(zip(l_other, jls[:len(l_other)]))
        dicts.update(self._subdicts(l_other))
        if how in ("inner", "left", "right", "full"):
            for name, arr in zip(r_other, jrs[:len(r_other)]):
                out_name = name + suffix if name in cols else name
                cols[out_name] = arr
                if name in other._dicts:
                    dicts[out_name] = other._dicts[name]
        out = DistTable(cols, self._mesh, counts, self._axis,
                        dictionaries=dicts)
        if flagged and how in ("left", "anti", "right", "full"):
            # unmatched padding rows emit under these variants; drop them
            out = DistTable({**cols, "__flag": fcol}, self._mesh, counts,
                            self._axis, dictionaries=dicts)
            out = out.filter(lambda t: t["__flag"] == 0).drop("__flag")
        return out, ovf

    def _join_lookup(self, other, on, *, suffix="_r",
                     assume_unique=False):
        """Broadcast lookup join (see :meth:`join`): the replicated right
        side is sorted once by key (with a validity/NULL-key flag word
        when needed), every sharded left row binary-searches its first
        match (merge-rank at comparator rate over the global array), the
        matched rows compact per shard with one distributed filter.
        Returns ``(DistTable, dup)``. A non-key-unique right side raises
        TypeError eagerly (unless ``assume_unique``); under a trace,
        where the host check is impossible, ``dup`` reports it."""
        from radix_sort_tpu.table import Table

        if not isinstance(other, Table):
            raise TypeError(
                "lookup join needs a replicated single-chip Table right "
                "side (e.g. an aggregate keyed by the join key); got "
                f"{type(other).__name__}"
            )
        on = _as_list(on)
        if not all(isinstance(n, str) for n in on):
            raise TypeError("lookup join keys must be column names")
        lk, rk, key_dicts = [], [], {}
        for name in on:
            (lc,) = self._resolve([name])
            (rc,) = other._resolve([name])
            lc, rc = self._unify_key(other, name, lc, rc, key_dicts)
            lk.append(lc)
            rk.append(rc)
        rnames = [n for n in other._cols
                  if n not in on and not NL.is_mask_name(n)]
        for n in rnames:
            if other.null_mask(n) is not None:
                raise TypeError(
                    f"lookup join right column {n!r} carries a null "
                    f"mask — DistTable rows cannot hold NULLs; "
                    f"fill_null(...) the replicated side first"
                )
        lk_limbs, _ = Q._cols_to_limbs(lk)
        rk_limbs, _ = Q._cols_to_limbs(rk)
        # right flag word: padding rows and NULL keys never match
        rf = None
        if other._count is not None:
            rf = (~other.valid_mask()).astype(jnp.uint32)
        for name in on:
            m = other.null_mask(name)
            if m is not None:
                m = m.astype(jnp.uint32)
                rf = m if rf is None else (rf | m)
        if rf is not None:
            rk_limbs = [rf, *rk_limbs]
            lk_limbs = [jnp.zeros((self._n,), jnp.uint32), *lk_limbs]
        rvs = [other._cols[n] for n in rnames]
        out = Q._stable_sort([*rk_limbs, *rvs], num_keys=len(rk_limbs))
        rks = list(out[:len(rk_limbs)])
        rvs_s = list(out[len(rk_limbs):])
        lo, hi = Q.merge_rank_pair(rks, lk_limbs)
        matched = (hi > lo) & self.valid_mask()
        dup = jnp.any((hi - lo) > 1)
        if not assume_unique:
            try:
                dup_now = bool(dup)
            except jax.errors.TracerBoolConversionError:
                dup_now = None  # traced: the returned flag reports it
            if dup_now:
                raise TypeError(
                    "lookup join right side is not key-unique — pairs "
                    "beyond the first match per left row would drop. "
                    "Aggregate/distinct the right side on the join "
                    "keys first, or use the co-partitioned "
                    "how='inner' join."
                )
        safe = jnp.clip(lo, 0, max(other._n, 1) - 1)
        rv_g = [rv[safe] for rv in rvs_s]
        *outs, counts = dist_query.distributed_filter(
            matched, *self._cols.values(), *rv_g,
            mesh=self._mesh, axis_name=self._axis,
        )
        cols = dict(zip(self._cols, outs[:len(self._cols)]))
        dicts = dict(self._dicts)
        for n, arr in zip(rnames, outs[len(self._cols):]):
            out_name = n + suffix if n in cols else n
            cols[out_name] = arr
            if n in other._dicts:
                dicts[out_name] = other._dicts[n]
        return (
            DistTable(cols, self._mesh, counts, self._axis,
                      dictionaries=dicts),
            dup,
        )

    def join_band(self, other, left_on: str, op: str, right_on, *,
                  on=None, capacity_per_shard: int | None = None,
                  how: str = "inner", suffix: str = "_r"):
        """Broadcast non-equi (band) join: ``other`` must be a replicated
        single-chip :class:`Table` (interval/threshold dimensions — the
        same shape as the broadcast lookup join's right side). Every
        shard probes and expands against the replicated side IN PLACE
        (``ops.query.band_join`` per shard: merge-rank range probes +
        the shared expansion), so this relation is never exchanged.

        Same predicate surface as :meth:`Table.join_band` — ``op`` in
        "<", "<=", ">", ">=" (or lt/le/gt/ge) with a right column, or
        "between" with ``right_on=(lo, hi)``; ``on`` adds shared
        equality keys. ``how``: inner/left/semi/anti (between:
        inner-only). Returns ``(DistTable, overflow)``: each shard's
        result rows form its valid prefix (left-row-major within the
        shard), bounded by ``capacity_per_shard``; unmatched sides are
        zero-filled (the facade's join convention). ``overflow`` is True
        if ANY shard exceeded its capacity."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as PS

        from radix_sort_tpu.table import Table

        opn = {"<": "lt", "<=": "le", ">": "gt", ">=": "ge"}.get(op, op)
        if opn not in Q.BAND_OPS:
            raise ValueError(
                f"op must be one of <, <=, >, >=, between "
                f"(or lt/le/gt/ge), got {op!r}"
            )
        if not isinstance(other, Table):
            raise TypeError(
                "the broadcast band join needs a replicated single-chip "
                "Table right side (interval/threshold dimensions); for "
                "two sharded relations collect one side first"
            )
        if capacity_per_shard is None:
            if how in ("semi", "anti"):
                capacity_per_shard = self._nl
            else:
                raise TypeError(
                    f"join_band(how={how!r}) needs an explicit "
                    f"capacity_per_shard= (the static per-shard result "
                    f"bound); only semi/anti have a natural default"
                )
        on = _as_list(on)
        rb_names = (list(right_on) if opn == "between" else [right_on])
        if opn == "between" and len(rb_names) != 2:
            raise ValueError('op="between" needs right_on=(lo_col, hi_col)')
        for nm, t in ((left_on, self), *((n, other) for n in rb_names)):
            if isinstance(nm, str) and nm in t._dicts:
                raise TypeError(
                    f"band column {nm!r} is a string column — band "
                    f"predicates need numeric/date columns"
                )
        lb = self._resolve([left_on])[0]
        rbs = [other._resolve(nm)[0] for nm in rb_names]
        key_dicts = {}
        lk, rk = [], []
        rnull = None
        for name in on:
            (lc,) = self._resolve([name])
            (rc,) = other._resolve([name])
            lc, rc = self._unify_key(other, name, lc, rc, key_dicts)
            m = other.null_mask(name)
            if m is not None:
                rnull = NL.merge_masks(rnull, m)
            lk.append(lc)
            rk.append(rc)
        for nm in rb_names:
            if isinstance(nm, str):
                m = other.null_mask(nm)
                if m is not None:
                    rnull = NL.merge_masks(rnull, m)
        rnames = [n for n in other._cols
                  if n not in on and not NL.is_mask_name(n)]
        for n in rnames:
            if n in rb_names:
                # a nullable BAND column is fine: its NULL rows fold
                # into the right flag word (they match nothing, so no
                # masked cell can ever emit)
                continue
            if other.null_mask(n) is not None:
                raise TypeError(
                    f"band join right column {n!r} carries a null mask "
                    f"— DistTable rows cannot hold NULLs; "
                    f"fill_null(...) the replicated side first"
                )
        # per-side flag words, same values as Table._join_keys: valid 0,
        # left padding 1, RIGHT padding 2, right NULL keys 4 — distinct
        # per side so padding/NULL rows never equi-match anything
        # (a shared value here silently paired filtered-out rows;
        # caught in round-5 review)
        lflag = self._flag()
        rflag = None
        if rnull is not None or other._count is not None:
            rflag = jnp.zeros((other._n,), jnp.uint32)
            if rnull is not None:
                rflag = jnp.where(rnull, jnp.uint32(4), rflag)
            if other._count is not None:
                rflag = jnp.where(other.valid_mask(), rflag,
                                  jnp.uint32(2))
        flagged = lflag is not None or rflag is not None
        if flagged:
            lf = (jnp.zeros((self._n,), jnp.uint32) if lflag is None
                  else jnp.where(lflag != 0, jnp.uint32(1), jnp.uint32(0)))
            rf = (jnp.zeros((other._n,), jnp.uint32) if rflag is None
                  else rflag)
            lk, rk = [lf, *lk], [rf, *rk]

        l_payload_names = [n for n in self._cols]
        l_payloads = [self._cols[n] for n in l_payload_names]
        r_payloads = [other._cols[n] for n in rnames]
        nk = len(lk)
        nrb = len(rbs)
        n_r = other._n
        cap = capacity_per_shard
        include_right = how in ("inner", "left")
        # only LEFT padding rows can emit under these variants; a
        # right-side-only flag never needs the post-filter compaction
        flagged_keep = lflag is not None and how in ("left", "anti")

        def body(lb_s, *rest):
            lks = list(rest[:nk])
            lps = list(rest[nk:nk + len(l_payloads)])
            off = nk + len(l_payloads)
            rbs_r = list(rest[off:off + nrb])
            rks = list(rest[off + nrb:off + nrb + len(rk)])
            rps = list(rest[off + nrb + len(rk):])
            n_loc = lb_s.shape[0]
            lidx1 = jnp.arange(n_loc, dtype=jnp.int32) + 1
            ridx1 = jnp.arange(n_r, dtype=jnp.int32) + 1
            jl, jr, cnt, ovf = Q.band_join(
                lb_s, lidx1,
                tuple(rbs_r) if opn == "between" else rbs_r[0], ridx1,
                op=opn, capacity=cap, how=how,
                left_equi=lks or None, right_equi=rks or None,
            )
            valid = jnp.arange(cap, dtype=jnp.int32) < cnt
            if flagged_keep:
                # left/anti emit unmatched LEFT rows: drop padding rows,
                # keep real rows (every output row has a left source)
                fcol = lks[0][jnp.clip(jl - 1, 0, n_loc - 1)]
                keep = valid & (fcol == 0)
                jl, jr, cnt = (*Q.filter(keep, jl, jr),)
                cnt = cnt.astype(jnp.int32)
                valid = jnp.arange(cap, dtype=jnp.int32) < cnt
                # real rows are a valid PREFIX of the shard, so their
                # emissions precede every padding emission: a capacity
                # truncation lost real rows only if real rows alone
                # still fill the capacity — otherwise clear the flag
                ovf = ovf & (cnt >= cap)
            matched_l = valid & (jl > 0)
            lg = jnp.clip(jl - 1, 0, n_loc - 1)
            matched = valid & (jr > 0)
            rg = jnp.clip(jr - 1, 0, max(n_r, 1) - 1)
            outs = [jnp.where(matched_l, c[lg], 0) for c in lps]
            if include_right:
                outs += [jnp.where(matched, c[rg], 0) for c in rps]
            gcnt = jax.lax.all_gather(cnt.reshape(1), self._axis,
                                      tiled=True)
            govf = jax.lax.all_gather(
                ovf.reshape(1), self._axis, tiled=True)
            return (*outs, gcnt, govf)

        nout = len(l_payloads) + (len(r_payloads) if include_right else 0)
        fn = shard_map(
            body,
            mesh=self._mesh,
            in_specs=(
                (PS(self._axis),) * (1 + len(lk) + len(l_payloads))
                + (PS(),) * (nrb + len(rk) + len(r_payloads))
            ),
            out_specs=(PS(self._axis),) * nout + (PS(), PS()),
            check_vma=False,
        )
        out = fn(lb, *lk, *l_payloads, *rbs, *rk, *r_payloads)
        cols_out = list(out[:nout])
        counts = out[nout][: self._P]
        overflow = jnp.any(out[nout + 1][: self._P])

        cols = {}
        dicts = dict(key_dicts)
        for n, c in zip(l_payload_names, cols_out[:len(l_payloads)]):
            cols[n] = c
            if n in self._dicts:
                dicts[n] = self._dicts[n]
        if include_right:
            for n, c in zip(rnames, cols_out[len(l_payloads):]):
                out_name = n + suffix if n in cols else n
                cols[out_name] = c
                if n in other._dicts:
                    dicts[out_name] = other._dicts[n]
        return (
            DistTable(cols, self._mesh, counts, self._axis,
                      dictionaries=dicts),
            overflow,
        )

    def join_asof(self, other: "DistTable", on, *,
                  direction: str = "backward", tolerance=None,
                  suffix: str = "_r",
                  matched_col: str | None = None) -> "DistTable":
        """Distributed ASOF join, row-aligned with this table (pandas
        ``merge_asof`` semantics over the tagged-union exchange). ``other``
        must be fully valid (no padding) — filter/compact it first;
        this table's padding rows simply never match."""
        if other._counts is not None:
            raise ValueError(
                "join_asof needs a fully-valid right DistTable "
                "(materialize/compact it first)"
            )
        (lk,) = self._resolve([on])
        (rk,) = other._resolve([on])
        lk, rk = self._unify_key(other, on, lk, rk, {})
        ridx = jnp.arange(other._n, dtype=jnp.int32)
        _, matched, rpos = dist_asof.distributed_join_asof(
            lk, rk, ridx, self._mesh, self._axis,
            direction=direction, tolerance=tolerance, fill=-1,
        )
        if self._counts is not None:
            matched = matched & self.valid_mask()
        rg = jnp.clip(rpos, 0, other._n - 1)
        cols = dict(self._cols)
        dicts = dict(self._dicts)
        for name, c in other._cols.items():
            if name == on:
                continue
            out_name = name + suffix if name in cols else name
            # global-position gather: XLA inserts the cross-shard collective
            cols[out_name] = jnp.where(matched, c[rg], 0)
            if name in other._dicts:
                dicts[out_name] = other._dicts[name]
        if matched_col is not None:
            cols[matched_col] = matched
        return DistTable(cols, self._mesh, self._counts, self._axis,
                         dictionaries=dicts)

    def window(self, ops, *, partition_by=None, order_by=None,
               descending=None,
               capacity: int | None = None) -> "DistTable":
        """Add window-function columns over the MPP window plan (full
        single-chip spec surface; column NAMES in place of value arrays, as
        :meth:`Table.window`). Padding rows are fenced into their own
        partitions; results stay row-aligned and sharded."""
        specs = []
        out_dicts = {}
        for out_name, spec in ops.items():
            if isinstance(spec, str):
                specs.append(spec)
            else:
                spec = list(spec)
                if spec[0] not in ("ntile", "rolling_count",
                                   "range_count"):
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
        outs = DW.distributed_window(
            specs,
            partition_by=p_cols or None,
            order_by=self._resolve(order_by) or None,
            descending=descending,
            mesh=self._mesh, axis_name=self._axis, capacity=capacity,
        )
        if isinstance(outs, jnp.ndarray):
            outs = [outs]
        res = self.with_columns(**dict(zip(ops, outs)))
        if out_dicts:
            res = DistTable(res._cols, res._mesh, res._counts, res._axis,
                            dictionaries={**res._dicts, **out_dicts})
        return res

    def unnest(self, counts, total_size_per_shard: int):
        """UNNEST / explode: valid row i emits ``counts[i]`` copies of every
        column, in row order, into each shard's static
        ``total_size_per_shard`` rows (shard-local expansion — no wire
        traffic). Returns ``(DistTable, overflow)``; padding rows emit
        nothing."""
        (c,) = self._resolve([counts])
        if self._counts is not None:
            c = jnp.where(self.valid_mask(), c, 0)
        *outs, new_counts, ovf = dist_query.distributed_repeat(
            list(self._cols.values()), c, self._mesh, self._axis,
            total_size_per_shard=total_size_per_shard,
        )
        return (
            DistTable(dict(zip(self._cols, outs)), self._mesh, new_counts,
                      self._axis, dictionaries=self._dicts),
            ovf,
        )

    def concat(self, other: "DistTable") -> "DistTable":
        """UNION ALL: the two relations' valid rows, this table's first
        (same column names/dtypes). One flag-keyed distributed stable sort
        re-packs the combined valid rows into a global prefix."""
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
        if self._counts is None and other._counts is None:
            return DistTable(cols, self._mesh, None, self._axis,
                             dictionaries=out_dicts)
        flag = jnp.concatenate([
            (~self.valid_mask()).astype(jnp.uint32),
            (~other.valid_mask()).astype(jnp.uint32),
        ])
        # order by (flag, original position): valid rows first, in order;
        # the sorted flag comes back as the leading key limb
        pos = jnp.arange(flag.shape[0], dtype=jnp.uint32)
        ows, ovs, fill_counts, _ = dist_sort.distributed_sort_limbs(
            [flag, pos], list(cols.values()), mesh=self._mesh,
            axis_name=self._axis,
        )
        ovs = list(ovs) if isinstance(ovs, (list, tuple)) else [ovs]
        cap = ovs[0].shape[0] // self._P
        counts = self._counts_from_flags(ows[0], fill_counts, cap)
        return DistTable(dict(zip(cols, ovs)), self._mesh, counts,
                         self._axis, dictionaries=out_dicts)

    # ---- reduction-shaped verbs (replicated results) ----------------------

    def distinct(self, subset=None, *, max_unique: int) -> Table:
        """Distinct valid rows over ``subset`` columns (default: all) —
        the two-phase MPP DISTINCT. ``max_unique`` bounds each shard's
        local distinct count (result flagged invalid past it). Returns a
        replicated :class:`Table`."""
        names = _as_list(subset) or list(self._cols)
        key_cols = self._resolve(names)
        flag = self._flag()
        karg = [flag, *key_cols] if flag is not None else (
            key_cols if len(key_cols) > 1 else key_cols[0]
        )
        uk, _, num, ovf = dist_query.distributed_unique(
            karg, self._mesh, self._axis, max_unique=max_unique,
        )
        uks = list(uk) if isinstance(uk, (list, tuple)) else [uk]
        if flag is not None:
            fcol, uks = uks[0], uks[1:]
            pos = jnp.arange(uks[0].shape[0], dtype=jnp.int32)
            num = jnp.sum(((pos < num) & (fcol == 0)).astype(jnp.int32))
        return Table(dict(zip(names, uks)), num,
                     dictionaries=self._subdicts(names))

    def aggregate(self, by, aggs, *, max_groups: int,
                  exchange_capacity_factor: float = 2.0,
                  where=None) -> Table:
        """Distributed GROUP BY (two-phase partial merge for combinable
        aggregations, repartition/shuffle-aggregate for holistic ones) —
        same ``aggs`` dict as :meth:`Table.aggregate`. ``max_groups``
        bounds each shard's group count. Returns a replicated
        :class:`Table`; ``argmin``/``argmax`` report global row
        positions."""
        by = _as_list(by)
        if not aggs:
            if not by:
                raise ValueError("aggregate needs group keys or aggs")
            base = self.filter(where) if where is not None else self
            return base.distinct(by, max_unique=max_groups)
        key_cols = self._resolve(by)
        if not key_cols:
            key_cols = [jnp.zeros((self._n,), jnp.uint32)]
        flag = self._merged_flag(where)
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
                col = keys_arg[-1]
            if agg in _NUMERIC_ONLY_AGGS or \
                    agg.startswith("quantile_cont:"):
                self._no_string(col, f"{out_name!r}: {agg}")
            elif (isinstance(col, str) and col in self._dicts
                  and (agg in ("min", "max", "first", "last", "mode",
                               "median")
                       or agg.startswith("quantile:"))):
                out_dicts[out_name] = self._dicts[col]
            names.append(out_name)
            val_cols.append(self._resolve(col)[0])
            agg_list.append(agg)
        uk, outs, cnt, ovf = dist_query.distributed_hash_aggregate(
            keys_arg, val_cols, self._mesh, agg_list, self._axis,
            max_groups=max_groups,
            exchange_capacity_factor=exchange_capacity_factor,
        )
        uks = list(uk)
        if flag is not None:
            fcol, uks = uks[0], uks[1:]
            pos = jnp.arange(fcol.shape[0], dtype=jnp.int32)
            cnt = jnp.sum(((pos < cnt) & (fcol == 0)).astype(jnp.int32))
        cols = dict(zip(by, uks[:len(by)]))
        cols.update(zip(names, outs))
        return Table(cols, cnt,
                     dictionaries={**self._subdicts(by), **out_dicts})

    def aggregate_sets(self, sets, aggs, grouping=None, *,
                       max_groups: int,
                       exchange_capacity_factor: float = 2.0,
                       where=None) -> Table:
        """Distributed SQL GROUPING SETS / ROLLUP / CUBE: one
        :meth:`aggregate` per grouping set (each a replicated
        :class:`Table`), concatenated with group keys absent from a set
        as typed NULL columns — same semantics as
        :meth:`Table.aggregate_sets`, with ``max_groups`` bounding every
        per-set, per-shard group count.

        When every aggregation is re-combinable (sum/count/min/max/
        any/all, and mean via hidden sum+count helper columns), a set
        nested inside an already-computed superset re-aggregates that
        set's REPLICATED result table instead of paying a second full
        exchange — a ROLLUP then costs ONE distributed aggregate plus
        tiny replicated-side reductions."""
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

        def _agg_name(spec):
            return spec if isinstance(spec, str) else spec[0]

        _REAGG = {"sum": "sum", "count": "sum", "min": "min",
                  "max": "max", "any": "any", "all": "all"}
        # (an empty aggs dict degrades to per-set DISTINCT, which also
        # re-aggregates correctly: distinct of a superset's distinct)
        shareable = all(
            _agg_name(spec) in _REAGG or _agg_name(spec) == "mean"
            for spec in aggs.values()
        )
        mean_items = [(name, spec) for name, spec in aggs.items()
                      if _agg_name(spec) == "mean"]
        uniq = {}
        for s in sets:
            uniq.setdefault(frozenset(s), list(s))
        tables = {}
        for s in sorted(uniq.values(), key=len, reverse=True):
            fs = frozenset(s)
            parent = None
            if shareable:
                cands = [g for g in tables if fs < g]
                if cands:
                    parent = tables[min(cands, key=len)]
            if parent is None:
                ag = dict(aggs)
                if shareable:
                    # helper partials let coarser levels recover the mean
                    # as sum(sums)/sum(counts)
                    for name, spec in mean_items:
                        if isinstance(spec, str) or len(spec) < 2:
                            continue  # aggregate() raises: mean needs a col
                        ag["__gs_s_" + name] = ("sum", spec[1])
                        ag["__gs_c_" + name] = ("count", spec[1])
                tables[fs] = self.aggregate(
                    s or None, ag, max_groups=max_groups,
                    exchange_capacity_factor=exchange_capacity_factor,
                    where=where,
                )
                continue
            ag2 = {}
            for name, spec in aggs.items():
                a = _agg_name(spec)
                if a == "mean":
                    ag2["__gs_s_" + name] = ("sum", "__gs_s_" + name)
                    ag2["__gs_c_" + name] = ("sum", "__gs_c_" + name)
                else:
                    ag2[name] = (_REAGG[a], name)
            t = parent.aggregate(s or None, ag2)
            if mean_items:
                add = {}
                for name, _ in mean_items:
                    sc, cc = t["__gs_s_" + name], t["__gs_c_" + name]
                    mdt = (jnp.float64 if sc.dtype == jnp.float64
                           else jnp.float32)
                    add[name] = (sc.astype(mdt)
                                 / jnp.maximum(cc, 1).astype(mdt))
                t = t.with_columns(**add)
            tables[fs] = t
        out = None
        for s in sets:
            t = tables[frozenset(s)]
            add = {}
            for k in all_keys:
                if k in s:
                    continue
                src = self._cols[k]
                zeros = jnp.zeros((t.num_rows,), src.dtype)
                ones = jnp.ones((t.num_rows,), jnp.bool_)
                if k in self._dicts:
                    add[k] = S.DictColumn(zeros.astype(jnp.uint32),
                                          self._dicts[k], ones)
                else:
                    add[k] = NL.MaskedColumn(zeros, ones)
            for gname, key in grouping.items():
                add[gname] = jnp.full((t.num_rows,),
                                      0 if key in s else 1, jnp.int32)
            if add:
                t = t.with_columns(**add)
            t = t.select(*order)
            out = t if out is None else out.concat(t)
        return out

    def top_k(self, k: int, by, largest: bool = True) -> Table:
        """The global ``k`` rows with extreme ``by`` keys (ORDER BY ...
        LIMIT k over the mesh; k rows per shard on the wire). Returns a
        replicated :class:`Table`. ``k`` beyond the global row count
        clamps (LIMIT semantics: all rows, sorted)."""
        k = min(int(k), self.num_rows)
        by = _as_list(by)
        key_cols = self._resolve(by)
        keys_arg = list(key_cols)
        flag = self._flag()
        if flag is not None:
            ind = (self.valid_mask().astype(jnp.uint32) if largest
                   else flag)
            keys_arg = [ind, *keys_arg]
        others = list(self._cols)
        out = dist_query.distributed_top_k(
            keys_arg if len(keys_arg) > 1 else keys_arg[0],
            k, *[self._cols[n] for n in others],
            mesh=self._mesh, axis_name=self._axis, largest=largest,
        )
        cols = dict(zip(others, out[1:]))
        cnt = (None if self._counts is None
               else jnp.minimum(self.total_count(), jnp.int32(k)))
        return Table(cols, cnt, dictionaries=self._dicts)

    def limit(self, k: int, offset: int = 0) -> Table:
        """First ``k`` valid rows (after skipping ``offset``), in
        shard-major order, gathered to a single-chip :class:`Table`. SQL
        LIMIT without ORDER BY has no defined row order; this engine's is
        shard 0's valid rows, then shard 1's, ... (ORDER BY + LIMIT
        optimizes to :meth:`top_k` in the planner and never lands here)."""
        return self.to_table().limit(k, offset)

    def _set_op(self, other: "DistTable", subset, op_name, max_unique):
        names = _as_list(subset) or list(self._cols)
        a_cols = self._resolve(names)
        b_cols = other._resolve(names)
        out_dicts = {}
        for i, name in enumerate(names):
            a_cols[i], b_cols[i] = self._unify_key(
                other, name, a_cols[i], b_cols[i], out_dicts
            )
        aflag, bflag = self._flag(), other._flag()
        flagged = aflag is not None or bflag is not None
        if flagged:
            af = (aflag if aflag is not None
                  else jnp.zeros((self._n,), jnp.uint32))
            bf = (bflag if bflag is not None
                  else jnp.zeros((other._n,), jnp.uint32))
            a_cols, b_cols = [af, *a_cols], [bf, *b_cols]
        fn = {
            "union": dist_query.distributed_set_union,
            "intersect": dist_query.distributed_set_intersect,
            "difference": dist_query.distributed_set_difference,
        }[op_name]
        keys_out, count, ovf = fn(
            a_cols if len(a_cols) > 1 else a_cols[0],
            b_cols if len(b_cols) > 1 else b_cols[0],
            self._mesh, self._axis, max_unique=max_unique,
        )
        kouts = (list(keys_out) if isinstance(keys_out, (list, tuple))
                 else [keys_out])
        if flagged:
            fcol, kouts = kouts[0], kouts[1:]
            pos = jnp.arange(kouts[0].shape[0], dtype=jnp.int32)
            count = jnp.sum(((pos < count) & (fcol == 0)).astype(jnp.int32))
        return Table(dict(zip(names, kouts)), count, dictionaries=out_dicts)

    def union(self, other: "DistTable", subset=None, *,
              max_unique: int) -> Table:
        """SQL ``UNION`` (distinct) over ``subset`` columns — the two-phase
        distributed set op; padding on either side contributes nothing.
        Returns a replicated :class:`Table`."""
        return self._set_op(other, subset, "union", max_unique)

    def intersect(self, other: "DistTable", subset=None, *,
                  max_unique: int) -> Table:
        """SQL ``INTERSECT`` over the mesh."""
        return self._set_op(other, subset, "intersect", max_unique)

    def difference(self, other: "DistTable", subset=None, *,
                   max_unique: int) -> Table:
        """SQL ``EXCEPT`` over the mesh (this table minus ``other``)."""
        return self._set_op(other, subset, "difference", max_unique)

    def quantiles(self, column, qs, *, method: str = "lower"):
        """Exact global quantiles of a column's valid rows (replicated
        values; the distributed sort resolves each global rank to its one
        owning shard). With padding present, ranks are taken inside the
        valid prefix of a (validity, column) sort."""
        if isinstance(column, str) and column in self._dicts:
            raise TypeError(
                f"quantiles on string column {column!r}: take them on "
                f"t[{column!r}] codes and decode(..) explicitly if intended"
            )
        (col,) = self._resolve([column])
        if self._counts is None:
            return dist_query.distributed_quantiles(
                col, qs, self._mesh, self._axis, method=method
            )
        qs = [float(q) for q in qs]
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(
                    f"quantile points must be in [0, 1], got {q}"
                )
        from radix_sort_tpu.ops.relational import QUANTILE_METHODS
        if method not in QUANTILE_METHODS:
            raise ValueError(
                f"method must be one of {QUANTILE_METHODS}, got {method!r}"
            )
        flag = self._flag()
        limbs = K.encode_limbs(col)
        ows, _, fill_counts, _ = dist_sort.distributed_sort_limbs(
            [flag, *limbs], None, mesh=self._mesh, axis_name=self._axis,
        )
        total = self.total_count()
        x = jnp.asarray(qs, jnp.float32) * (total - 1).astype(jnp.float32)
        if method == "lower":
            r = jnp.floor(x)
        elif method == "higher":
            r = jnp.ceil(x)
        else:
            r = jnp.floor(x + 0.5)
        ranks = jnp.clip(r.astype(jnp.int32), 0, jnp.maximum(total - 1, 0))
        # valid rows are the global prefix of the (flag, value) sort: rank
        # j's owner is found from the exchange fill counts (valid rows are
        # a prefix of each shard's fill — flag 0 sorts first globally)
        svals = K.decode_limbs(list(ows[1:]), col.dtype)
        cap = svals.shape[0] // self._P
        offs = jnp.cumsum(fill_counts) - fill_counts
        shard = jnp.clip(
            jnp.searchsorted(offs, ranks, side="right") - 1, 0, self._P - 1
        ).astype(jnp.int32)
        local = ranks - offs[shard]
        return svals[jnp.clip(shard * cap + local, 0, svals.shape[0] - 1)]

    # ---- deferred execution -------------------------------------------

    def lazy(self):
        """A :class:`~radix_sort_tpu.plan.LazyTable` rooted at this
        sharded relation (same planner as :meth:`Table.lazy`; per-shard
        capacity knobs ride each verb's kwargs into the executor)."""
        from radix_sort_tpu.plan import LazyTable, Source

        return LazyTable(Source(self))

    # ---- materialization --------------------------------------------------

    def to_table(self) -> Table:
        """Re-pack into a single-chip :class:`Table` (stays traced). The
        shards' valid PREFIXES slide into one global prefix with P-1
        dynamic rolls + positional selects — pure streaming, no sort
        (packing prefix blocks never needs one; the former stable
        validity sort paid a comparator sort over every column)."""
        if self._counts is None:
            return Table(dict(self._cols), None, dictionaries=self._dicts)
        # destination offset of each shard's block = running valid total
        offs = jnp.cumsum(self._counts) - self._counts  # (P,)
        pos = jnp.arange(self._n, dtype=jnp.int32)

        def pack(c):
            out = c  # shard 0's prefix is already in place
            for i in range(1, self._P):
                shifted = jnp.roll(c, offs[i] - i * self._nl)
                out = jnp.where(pos < offs[i], out, shifted)
            return out

        return Table({n: pack(c) for n, c in self._cols.items()},
                     self.total_count(), dictionaries=self._dicts)

    def to_numpy(self):
        """dict of numpy arrays holding ONLY the valid rows, in global
        shard order (eager only). String columns decode through their
        dictionaries."""
        if self._counts is None:
            return {n: (S.decode(np.asarray(c), self._dicts[n])
                        if n in self._dicts else np.asarray(c))
                    for n, c in self._cols.items()}
        cnts = np.asarray(self._counts)
        out = {}
        for n, c in self._cols.items():
            parts = np.split(np.asarray(c), self._P)
            a = np.concatenate(
                [p[: cnts[d]] for d, p in enumerate(parts)]
            )
            if n in self._dicts:
                a = S.decode(a, self._dicts[n])
            out[n] = a
        return out
