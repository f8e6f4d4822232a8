"""Distributed query operators over a device mesh.

Extends the single-chip operators (ops/query.py) across shards with the
standard two-phase plan: local partial aggregate per shard, all_gather the
partials, replicated combine. The usual aggregate contract applies: the
number of groups is small relative to N (bounded by ``max_groups`` per
shard, with an overflow flag when violated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from radix_sort_tpu.ops import query

__all__ = [
    "distributed_hash_aggregate",
    "distributed_filter",
    "distributed_hash_join",
    "distributed_unique",
    "distributed_top_k",
    "distributed_quantiles",
    "distributed_set_union",
    "distributed_set_intersect",
    "distributed_set_difference",
]


def _mix_limbs(limbs):
    """Routing word for composite keys: a multiplicative hash folded over
    all uint32 limbs. Equal tuples map to equal words (co-location), while
    the word's cardinality is the full tuple's — so quantile splitters
    balance even when the leading column is low-cardinality."""
    h = jnp.uint32(0x9E3779B9)
    for w in limbs:
        h = (h ^ w) * jnp.uint32(0x9E3779B1)
    return h


def _pad_to(a, g):
    """Pad (zeros) or trim ``a`` to exactly ``g`` rows (static shapes)."""
    p = g - a.shape[0]
    if p > 0:
        a = jnp.concatenate([a, jnp.zeros((p,), a.dtype)])
    return a[:g]


def _identity(dtype, combine):
    dt = np.dtype(dtype)
    if combine in ("sum", "count"):
        return dt.type(0)
    if combine == "any":
        return dt.type(0)          # False under OR
    if combine == "all":
        return dt.type(1)          # True under AND
    if dt.kind == "b":
        return dt.type(combine == "min")
    if dt.kind in "ui":
        info = np.iinfo(dt)
        return dt.type(info.max if combine == "min" else info.min)
    return dt.type(np.inf if combine == "min" else -np.inf)


def distributed_hash_aggregate(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    mesh: Mesh,
    agg: str = "sum",
    axis_name: str = "x",
    *,
    max_groups: int,
    exchange_capacity_factor: float = 2.0,
):
    """Group-by + reduce over row-sharded keys/values.

    Combinable aggregations (sum/count/min/max/mean/any/all) run the
    two-phase plan: per-shard sort-based aggregate, then an ``all_gather``
    of per-shard partials and a replicated final combine. Holistic
    aggregations (first/last/median/mode/var/std/count_distinct/argmin/
    argmax) run the repartition (shuffle-aggregate) plan instead: rows route by key with a
    shared splitter sketch so every group lands wholly on one shard, the
    exact single-chip aggregate runs locally, and the disjoint per-shard
    group results gather and merge (``exchange_capacity_factor`` provisions
    the per-shard receive buffers against key skew — duplicate-heavy keys
    can overflow). Returns replicated ``(unique_keys, aggregates, count,
    overflow)``; rows [0, count) are the groups in ascending key order.
    When any shard breaches ``max_groups`` or an exchange buffer, the
    exact replicated single-chip aggregate runs instead (inside
    ``lax.cond``, never eagerly) — the result is ALWAYS exact unless even
    the global capacity (``nshards * max_groups``) truncates the group
    count, which the returned ``overflow`` then reports (mirroring
    ``distributed_sort``'s fallback contract).

    ``keys`` may be a list/tuple of equal-length columns (composite
    GROUP BY), as in :func:`radix_sort_tpu.ops.query.hash_aggregate`;
    ``unique_keys`` is then a column list.

    ``values`` and ``agg`` may be parallel lists (the SQL multi-aggregate,
    one shared local sort + one gathered combine; any holistic member
    routes the whole multi-aggregate through the repartition plan);
    ``aggregates`` is then a list.
    """
    if isinstance(agg, (list, tuple)) or isinstance(values, (list, tuple)):
        if not (isinstance(agg, (list, tuple))
                and isinstance(values, (list, tuple))):
            raise ValueError(
                "multi-aggregate needs BOTH values and agg as lists"
            )
        if len(values) != len(agg) or not values:
            raise ValueError(
                "values and agg lists must be non-empty and equal-length"
            )
        for a in agg:
            if not query.valid_agg(a):
                raise ValueError(
                    f"agg must be one of {query.AGGREGATIONS} or "
                    f"'quantile:<q>', got {a!r}"
                )
        if any(a not in query.COMBINABLE_AGGREGATIONS for a in agg):
            return _distributed_holistic_aggregate(
                keys, list(values), list(agg), mesh, axis_name,
                max_groups, exchange_capacity_factor,
            )
        return _distributed_hash_aggregate_multi(
            keys, list(values), list(agg), mesh, axis_name, max_groups
        )
    if not query.valid_agg(agg):
        raise ValueError(
            f"agg must be one of {query.AGGREGATIONS} or 'quantile:<q>', "
            f"got {agg!r}"
        )
    if agg not in query.COMBINABLE_AGGREGATIONS:
        uk, outs, cnt, ovf = _distributed_holistic_aggregate(
            keys, [values], [agg], mesh, axis_name, max_groups,
            exchange_capacity_factor,
        )
        return uk, outs[0], cnt, ovf
    combine = "sum" if agg == "count" else agg
    multi = isinstance(keys, (list, tuple))
    cols = list(keys) if multi else [keys]
    ncols = len(cols)

    def local(*ops):
        k_cols, v = list(ops[:ncols]), ops[ncols]
        uk, av, cnt = query.hash_aggregate(
            k_cols if multi else k_cols[0], v, agg
        )
        uks = list(uk) if multi else [uk]
        # pad/trim to exactly max_groups (a shard may hold fewer rows)
        pad = max(0, max_groups - uks[0].shape[0])
        if pad:
            uks = [jnp.concatenate([u, jnp.zeros((pad,), u.dtype)])
                   for u in uks]
            av = jnp.concatenate([av, jnp.zeros((pad,), av.dtype)])
        uks = [u[:max_groups] for u in uks]
        av = av[:max_groups]
        overflow = cnt > max_groups
        valid = jnp.arange(max_groups) < cnt
        guks = [jax.lax.all_gather(u, axis_name, tiled=True) for u in uks]
        gav = jax.lax.all_gather(av, axis_name, tiled=True)
        gvalid = jax.lax.all_gather(valid, axis_name, tiled=True)
        govf = jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0

        # Merge padded (invalid) rows into an existing group with identity
        # contributions: rewrite their key to an always-valid key and their
        # value to the combine's identity — exact counts, no junk groups.
        # Anchor on the FIRST VALID row anywhere (argmax finds it), not
        # shard 0's first slot: shard 0 may legitimately contribute zero
        # groups (empty shard / uneven sharding).
        any_valid = jnp.any(gvalid)
        a_idx = jnp.argmax(gvalid)
        guks2 = [jnp.where(gvalid, g, g[a_idx]) for g in guks]
        ident = _identity(gav.dtype, combine)
        gav2 = jnp.where(gvalid, gav, ident)
        fk, fv, fc = query.hash_aggregate(
            guks2 if multi else guks2[0], gav2, combine
        )
        fks = tuple(fk) if multi else (fk,)
        fc = jnp.where(any_valid, fc, 0)  # all-invalid: zero groups, not one
        return (*fks, fv, fc.reshape(1), govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (ncols + 1),
        out_specs=(P(),) * (ncols + 3),
        check_vma=False,
    )
    out = fn(*cols, values)
    fk_cols = list(out[:ncols])
    fv, fc, ovf = out[ncols], out[ncols + 1], out[ncols + 2]
    fk_cols, fv, fc, ovf = _agg_overflow_fallback(
        ovf[0], (tuple(fk_cols), (fv,), fc[0]),
        lambda: query.hash_aggregate(cols if multi else cols[0], values,
                                     agg),
        mesh.shape[axis_name] * max_groups,
    )
    return (fk_cols if multi else fk_cols[0]), fv[0], fc, ovf


def _agg_overflow_fallback(povf, primary, global_agg, total_cap):
    """Exact insurance for the two-phase/repartition GROUP BY plans: when
    any shard breaches ``max_groups`` (or an exchange buffer), the exact
    replicated single-chip aggregate runs instead (INSIDE the cond — it
    computes on the gathered global rows, so it must never execute
    eagerly), padded/trimmed into the same replicated ``total_cap``-row
    layout. The result is then ALWAYS exact unless even ``total_cap``
    (nshards * max_groups) truncates the global group count, which the
    returned overflow reports (mirroring ``distributed_sort``'s fallback
    contract).

    ``primary`` is ``(key_cols_tuple, out_cols_tuple, count)``;
    ``global_agg()`` returns the single-chip ``(uk, outs, count)``.
    Returns ``(key_cols_list, out_cols_list, count, overflow)``.
    """

    def fb(_):
        fk, fouts, fcnt = global_agg()
        fk_l = list(fk) if isinstance(fk, (list, tuple)) else [fk]
        fo_l = (list(fouts) if isinstance(fouts, (list, tuple))
                else [fouts])
        fk_l = [_pad_to(a, total_cap) for a in fk_l]
        fo_l = [_pad_to(a, total_cap) for a in fo_l]
        fovf = fcnt > total_cap
        fcnt = jnp.minimum(fcnt, total_cap)
        return tuple(fk_l), tuple(fo_l), fcnt, fovf

    ks, outs, cnt, ovf = jax.lax.cond(
        povf, fb, lambda t: (*t, povf), primary
    )
    return list(ks), list(outs), cnt, ovf


def _distributed_hash_aggregate_multi(keys, val_cols, aggs, mesh, axis_name,
                                      max_groups):
    """Multi-aggregate distributed GROUP BY: each agg decomposes into
    combinable partials (mean -> sum + count; count -> sum of counts) so
    one local multi-aggregate + one gathered multi-combine produce every
    output; means divide at the end. Same contract/anchoring as
    :func:`distributed_hash_aggregate`."""
    for a in aggs:
        if not query.valid_agg(a):
            raise ValueError(
                f"agg must be one of {query.AGGREGATIONS} or "
                f"'quantile:<q>', got {a!r}"
            )
    multi_k = isinstance(keys, (list, tuple))
    cols = list(keys) if multi_k else [keys]
    ncols = len(cols)
    # partial plan: (source value index, local partial agg, gather combine)
    parts = []
    for i, a in enumerate(aggs):
        if a == "mean":
            parts.append((i, "sum", "sum"))
            parts.append((i, "count", "sum"))
        elif a == "count":
            parts.append((i, "count", "sum"))
        else:
            parts.append((i, a, a))
    np_ = len(parts)
    combines = [c for _, _, c in parts]

    def local(*ops):
        k_cols, vs = list(ops[:ncols]), list(ops[ncols:])
        uk, outs, cnt = query.hash_aggregate(
            k_cols if multi_k else k_cols[0],
            [vs[i] for i, _, _ in parts],
            [pa for _, pa, _ in parts],
        )
        uks = list(uk) if multi_k else [uk]
        pad = max(0, max_groups - uks[0].shape[0])
        if pad:
            uks = [jnp.concatenate([u, jnp.zeros((pad,), u.dtype)])
                   for u in uks]
            outs = [jnp.concatenate([o, jnp.zeros((pad,), o.dtype)])
                    for o in outs]
        uks = [u[:max_groups] for u in uks]
        outs = [o[:max_groups] for o in outs]
        overflow = cnt > max_groups
        valid = jnp.arange(max_groups) < cnt
        guks = [jax.lax.all_gather(u, axis_name, tiled=True) for u in uks]
        gouts = [jax.lax.all_gather(o, axis_name, tiled=True) for o in outs]
        gvalid = jax.lax.all_gather(valid, axis_name, tiled=True)
        govf = jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0
        # invalid-row anchoring: see distributed_hash_aggregate
        any_valid = jnp.any(gvalid)
        a_idx = jnp.argmax(gvalid)
        guks2 = [jnp.where(gvalid, g, g[a_idx]) for g in guks]
        gouts2 = [
            jnp.where(gvalid, g, _identity(g.dtype, c))
            for g, c in zip(gouts, combines)
        ]
        fk, fouts, fc = query.hash_aggregate(
            guks2 if multi_k else guks2[0], gouts2, combines
        )
        fks = tuple(fk) if multi_k else (fk,)
        fc = jnp.where(any_valid, fc, 0)
        return (*fks, *fouts, fc.reshape(1), govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (ncols + len(val_cols)),
        out_specs=(P(),) * (ncols + np_ + 2),
        check_vma=False,
    )
    out = fn(*cols, *val_cols)
    fk_cols = list(out[:ncols])
    fparts = list(out[ncols:ncols + np_])
    fc, ovf = out[ncols + np_][0], out[ncols + np_ + 1][0]
    # overflow insurance: the same partial plan evaluated globally (sum/
    # count/min/max/any/all are all exact as one global aggregate)
    fk_cols, fparts, fc, ovf = _agg_overflow_fallback(
        ovf, (tuple(fk_cols), tuple(fparts), fc),
        lambda: query.hash_aggregate(
            cols if multi_k else cols[0],
            [val_cols[i] for i, _, _ in parts],
            [pa for _, pa, _ in parts],
        ),
        mesh.shape[axis_name] * max_groups,
    )

    # reassemble per-agg outputs (divide means)
    results = []
    pi = 0
    for i, a in enumerate(aggs):
        if a == "mean":
            s, c = fparts[pi], fparts[pi + 1]
            pi += 2
            mdt = (jnp.float64 if val_cols[i].dtype == jnp.float64
                   else jnp.float32)
            results.append(s.astype(mdt) / jnp.maximum(c, 1).astype(mdt))
        else:
            results.append(fparts[pi])
            pi += 1
    return (fk_cols if multi_k else fk_cols[0]), results, fc, ovf


def _distributed_holistic_aggregate(keys, val_cols, aggs, mesh, axis_name,
                                     max_groups, exchange_capacity_factor):
    """Holistic aggregations (and any multi-aggregate containing one) via
    the repartition plan — the MPP shuffle-aggregate:

      1. route rows by key with one splitter sketch over a routing word
         (the key word, or a hash mixed over all limbs for composite keys),
         so every group lands WHOLLY on one shard (same routing as
         :func:`distributed_hash_join`);
      2. run the exact single-chip aggregate locally — groups are complete,
         so even order statistics (median), distinct counts, and first/last
         (by global input order: the original position rides the exchange
         and a local re-sort restores it) are exact;
      3. ``all_gather`` the per-shard group results (disjoint across
         shards) and merge with one replicated aggregate.

    Shard padding is fenced with a leading invalid word (padding groups
    sort last and are excluded from counts). Key-only routing cannot bound
    skew: duplicate-heavy keys can overflow the ``exchange_capacity_factor``
    -provisioned receive buffers — the exact replicated single-chip
    aggregate then runs instead (inside ``lax.cond``; see
    :func:`_agg_overflow_fallback`). The combinable plan in
    :func:`distributed_hash_aggregate` has no exchange failure mode — use
    it when the aggregate allows.
    """
    from radix_sort_tpu.parallel import dist_sort

    multi_k = isinstance(keys, (list, tuple))
    cols = list(keys) if multi_k else [keys]
    ncols = len(cols)
    n = cols[0].shape[0]
    for c in cols[1:] + list(val_cols):
        if c.shape[0] != n:
            raise ValueError("all key/value columns must have equal length")
    limbs, specs = query._cols_to_limbs(cols)
    nk = len(limbs)
    nshards = mesh.shape[axis_name]
    sentinel = jnp.asarray(np.iinfo(np.uint32).max, dtype=jnp.uint32)
    cap = max(
        128,
        -(-int(n // nshards * exchange_capacity_factor) // 128) * 128,
    )
    nv = len(val_cols)
    need_pos = any(a in ("first", "last", "argmin", "argmax") for a in aggs)
    single = nv == 1

    def local(*ops):
        kws = list(ops[:nk])
        vs = list(ops[nk:])
        shard_rows = kws[0].shape[0]
        if need_pos:
            r = jax.lax.axis_index(axis_name).astype(jnp.int32)
            gpos = r * shard_rows + jnp.arange(shard_rows, dtype=jnp.int32)
            vs = vs + [gpos]
        route = kws[0] if nk == 1 else _mix_limbs(kws)
        merged = jnp.sort(route)
        splitters = dist_sort._key_splitters(merged, axis_name, nshards)
        key_arg = kws[0] if nk == 1 else [route, *kws]
        ws, vss, cnt, xovf = dist_sort._local_exchange(
            key_arg, vs, axis_name, nshards, cap, sentinel,
            splitters=splitters,
        )
        wlist = query._as_limb_list(ws)
        if nk > 1:
            wlist = wlist[1:]  # drop the routing word
        vss = list(vss) if isinstance(vss, (list, tuple)) else [vss]
        rcnt = cnt[0]
        inv = (jnp.arange(cap, dtype=jnp.int32) >= rcnt).astype(jnp.uint32)
        gpos_sorted = None
        if need_pos:
            gpos_x = vss[-1]
            vss = vss[:-1]
            # restore global input order within groups so first/last are
            # exact (order-insensitive aggs don't care); the sorted global
            # positions feed argmin/argmax
            srt = query._stable_sort(
                [inv, *wlist, gpos_x, *vss], num_keys=nk + 2
            )
            inv, wlist = srt[0], list(srt[1:1 + nk])
            gpos_sorted = srt[1 + nk]
            vss = list(srt[2 + nk:])
        uk, outs, gcnt = query.hash_aggregate(
            [inv, *wlist],
            vss[0] if single else vss,
            aggs[0] if single else list(aggs),
            _positions=gpos_sorted,
        )
        outs = [outs] if single else list(outs)
        invc, kcols = uk[0], list(uk[1:])
        # invalid (padding) groups sort last: valid groups are a prefix
        pos = jnp.arange(invc.shape[0], dtype=jnp.int32)
        nvalid = jnp.sum(((pos < gcnt) & (invc == 0)).astype(jnp.int32))
        lovf = nvalid > max_groups

        def pad(a):
            p = max(0, max_groups - a.shape[0])
            if p:
                a = jnp.concatenate([a, jnp.zeros((p,), a.dtype)])
            return a[:max_groups]

        kcols = [pad(a) for a in kcols]
        outs = [pad(a) for a in outs]
        valid = jnp.arange(max_groups) < nvalid
        guks = [jax.lax.all_gather(u, axis_name, tiled=True) for u in kcols]
        gouts = [jax.lax.all_gather(o, axis_name, tiled=True) for o in outs]
        gvalid = jax.lax.all_gather(valid, axis_name, tiled=True)
        govf = jax.lax.psum(
            (lovf | xovf[0]).astype(jnp.int32), axis_name
        ) > 0
        # groups are disjoint across shards, so ANY reduction keeps the one
        # real row per group; "max" has an identity for every numeric dtype
        # ("any"/False for bool columns), which neutralizes the re-keyed
        # padding rows (anchor note in distributed_hash_aggregate)
        any_valid = jnp.any(gvalid)
        a_idx = jnp.argmax(gvalid)
        guks2 = [jnp.where(gvalid, g, g[a_idx]) for g in guks]
        combines = ["any" if g.dtype == jnp.bool_ else "max" for g in gouts]
        gouts2 = [
            jnp.where(gvalid, g, _identity(g.dtype, c))
            for g, c in zip(gouts, combines)
        ]
        fk, fouts, fc = query.hash_aggregate(
            guks2 if len(guks2) > 1 else guks2[0],
            gouts2,
            combines,
        )
        fks = tuple(fk) if len(guks2) > 1 else (fk,)
        fc = jnp.where(any_valid, fc, 0)
        return (*fks, *fouts, fc.reshape(1), govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (nk + nv),
        out_specs=(P(),) * (nk + nv + 2),
        check_vma=False,
    )
    out = fn(*limbs, *val_cols)
    fk_limbs = list(out[:nk])
    fouts = list(out[nk:nk + nv])
    fc, ovf = out[nk + nv][0], out[nk + nv + 1][0]
    # skew insurance: repartition receive buffers (or max_groups) breached
    # -> the exact replicated single-chip aggregate (holistic aggs are
    # exact there by construction; global input order gives first/last/
    # argmin/argmax their positions)
    fk_limbs, fouts, fc, ovf = _agg_overflow_fallback(
        ovf, (tuple(fk_limbs), tuple(fouts), fc),
        lambda: _holistic_global(limbs, val_cols, aggs, single),
        nshards * max_groups,
    )
    fk_cols = query._limbs_to_cols(fk_limbs, specs)
    return (fk_cols if multi_k else fk_cols[0]), fouts, fc, ovf


def _holistic_global(limbs, val_cols, aggs, single):
    """The exact single-chip aggregate over the global rows, in the limb
    keyspace (keys stay limbs so the caller's _limbs_to_cols applies)."""
    uk, outs, cnt = query.hash_aggregate(
        list(limbs) if len(limbs) > 1 else limbs[0],
        val_cols[0] if single else list(val_cols),
        aggs[0] if single else list(aggs),
    )
    uks = list(uk) if len(limbs) > 1 else [uk]
    return uks, [outs] if single else list(outs), cnt


def distributed_unique(
    keys: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    max_unique: int,
):
    """Distinct keys + global multiplicities over row-sharded ``keys``.

    Per-shard :func:`radix_sort_tpu.unique`, then an ``all_gather`` of the
    per-shard distincts and a replicated count-sum combine (the standard
    two-phase DISTINCT plan — wire traffic is ``max_unique`` rows per shard,
    not N). Returns replicated ``(unique_keys, counts, num, overflow)``;
    rows [0, num) are the distinct keys ascending under the dtype's total
    order. When any shard has more than ``max_unique`` local distincts the
    exact replicated single-chip unique runs instead (inside ``lax.cond``)
    — exact unless even ``nshards * max_unique`` truncates the distinct
    count, which the returned ``overflow`` then reports.

    ``keys`` may be a list/tuple of equal-length columns (composite
    DISTINCT); ``unique_keys`` is then a column list.
    """
    from radix_sort_tpu.ops.query import unique as _unique

    multi = isinstance(keys, (list, tuple))
    cols = list(keys) if multi else [keys]
    ncols = len(cols)

    def local(*k_cols):
        uk, cts, num = _unique(list(k_cols) if multi else k_cols[0])
        uks = list(uk) if multi else [uk]
        pad = max(0, max_unique - uks[0].shape[0])
        if pad:
            uks = [jnp.concatenate([u, jnp.zeros((pad,), u.dtype)])
                   for u in uks]
            cts = jnp.concatenate([cts, jnp.zeros((pad,), cts.dtype)])
        uks = [u[:max_unique] for u in uks]
        cts = cts[:max_unique]
        overflow = num > max_unique
        valid = jnp.arange(max_unique) < num
        guks = [jax.lax.all_gather(u, axis_name, tiled=True) for u in uks]
        gcts = jax.lax.all_gather(cts, axis_name, tiled=True)
        gvalid = jax.lax.all_gather(valid, axis_name, tiled=True)
        govf = jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0
        # invalid rows: re-key to an existing distinct with count 0 (exact;
        # see distributed_hash_aggregate's anchor note)
        any_valid = jnp.any(gvalid)
        a_idx = jnp.argmax(gvalid)
        guks2 = [jnp.where(gvalid, g, g[a_idx]) for g in guks]
        gcts2 = jnp.where(gvalid, gcts, 0)
        fk, fc, num_f = query.hash_aggregate(
            guks2 if multi else guks2[0], gcts2, "sum"
        )
        fks = tuple(fk) if multi else (fk,)
        num_f = jnp.where(any_valid, num_f, 0)
        return (*fks, fc, num_f.reshape(1), govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * ncols,
        out_specs=(P(),) * (ncols + 3),
        check_vma=False,
    )
    out = fn(*cols)
    fk_cols = list(out[:ncols])
    fc, num, ovf = out[ncols], out[ncols + 1], out[ncols + 2]
    # overflow insurance: the exact replicated single-chip unique
    fk_cols, fcs, num_f, ovf_f = _agg_overflow_fallback(
        ovf[0], (tuple(fk_cols), (fc,), num[0]),
        lambda: _unique(list(cols) if multi else cols[0]),
        mesh.shape[axis_name] * max_unique,
    )
    return (fk_cols if multi else fk_cols[0]), fcs[0], num_f, ovf_f


def distributed_top_k(
    keys: jnp.ndarray,
    k: int,
    *arrays: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "x",
    largest: bool = True,
):
    """Global top ``k`` rows over row-sharded keys (+ co-selected arrays).

    Each shard selects its local stable top-k candidates (the global top-k
    is always contained in the union), candidates ``all_gather`` with their
    global positions, and a replicated final selection re-sorts by
    (key, global-position) — so ties break by global input position exactly
    as the single-chip :func:`radix_sort_tpu.top_k`. Wire traffic is
    ``k`` rows per shard. Returns replicated ``(top_keys, *top_arrays)``.

    ``keys`` may be a list/tuple of equal-length columns (composite
    ORDER BY ... LIMIT k); ``top_keys`` is then a column list.
    """
    from radix_sort_tpu import keys as K

    multi = isinstance(keys, (list, tuple))
    cols = list(keys) if multi else [keys]
    n = cols[0].shape[0]
    if not 0 <= k <= n:
        raise ValueError(f"k must be in [0, {n}], got {k}")
    for a in list(cols[1:]) + list(arrays):
        if a.shape[0] != n:
            raise ValueError("all arrays must match the keys length")
    nshards = mesh.shape[axis_name]
    shard_rows = n // nshards
    kk = min(k, shard_rows)
    if multi:
        limbs, specs = query._cols_to_limbs(cols)
    else:
        limbs = [K.encode(cols[0])]
    nkw = len(limbs)

    def local(*ops):
        kws, arrs = list(ops[:nkw]), ops[nkw:]
        r = jax.lax.axis_index(axis_name).astype(jnp.int32)
        if nkw == 1:
            # fast path: local stable top-kk via lax.top_k on the single
            # encoded word; ties -> lower local index
            w = kws[0] if largest else ~kws[0]
            topw, idx = jax.lax.top_k(w, kk)
            top_limbs = [topw if largest else ~topw]
        else:
            # composite keys: one variadic stable sort by (key order, local
            # index) and take the first kk rows
            sel = [~w for w in kws] if largest else kws
            idx_all = jnp.arange(shard_rows, dtype=jnp.int32)
            srt = jax.lax.sort(
                sel + [idx_all], num_keys=nkw + 1, is_stable=False
            )
            top_limbs = [
                (~w if largest else w)[:kk] for w in srt[:nkw]
            ]
            idx = srt[nkw][:kk]
        gpos = r * shard_rows + idx.astype(jnp.int32)
        cands_w = [
            jax.lax.all_gather(w, axis_name, tiled=True) for w in top_limbs
        ]
        cands_pos = jax.lax.all_gather(gpos, axis_name, tiled=True)
        cands_a = [
            jax.lax.all_gather(a[idx], axis_name, tiled=True) for a in arrs
        ]
        # final stable selection over nshards*kk candidates: sort by
        # (key-order, global position) and take the first k rows
        sel = [~w for w in cands_w] if largest else cands_w
        out = jax.lax.sort(
            [*sel, cands_pos, *cands_a], num_keys=nkw + 1, is_stable=False
        )
        selw = [(~w if largest else w)[:k] for w in out[:nkw]]
        return (*selw, *[a[:k] for a in out[nkw + 1:]])

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (nkw + len(arrays)),
        out_specs=tuple(P() for _ in range(nkw + len(arrays))),
        check_vma=False,
    )
    out = fn(*limbs, *arrays)
    if multi:
        return (query._limbs_to_cols(list(out[:nkw]), specs), *out[nkw:])
    return (K.decode(out[0], keys.dtype), *out[1:])


def distributed_filter(mask, *arrays, mesh: Mesh, axis_name: str = "x"):
    """Per-shard stable compaction of row-sharded arrays.

    Returns ``(*compacted, counts)``: arrays keep their sharded shape with
    each shard's kept rows as its local valid prefix; ``counts`` is one
    count per shard (replicated). Concatenating every shard's valid prefix
    gives the global filtered relation in original order.
    """

    def local(m, *arrs):
        out = query.filter(m, *arrs)
        cnt = out[-1]
        gcnt = jax.lax.all_gather(cnt.reshape(1), axis_name, tiled=True)
        return (*out[:-1], gcnt)

    nshards = mesh.shape[axis_name]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(P(axis_name) for _ in range(1 + len(arrays))),
        out_specs=tuple(P(axis_name) for _ in arrays) + (P(),),
        check_vma=False,
    )
    out = fn(mask, *arrays)
    return (*out[:-1], out[-1][:nshards])


def distributed_hash_join(
    left_keys,
    left_values,
    right_keys,
    right_values,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    capacity_per_shard: int,
    exchange_capacity_factor: float = 2.0,
    how: str = "inner",
):
    """Equi-join over row-sharded relations (``how``: inner/left/right/
    full/semi/anti, see :func:`radix_sort_tpu.ops.query.hash_join`).

    Both sides are range-routed with ONE shared splitter sketch (sampled
    from both sides' keys), so matching keys land on the same shard; each
    shard then runs a local sort-merge join (co-partitioning places every
    row with a given key on one shard, so per-left-row match counts — and
    hence left/semi/anti emission — are locally complete; full outer joins
    append each shard's unmatched right rows after its left-join block, and
    right joins evaluate with the sides swapped). Returns per-shard
    padded results ``(keys, left_vals, right_vals, counts, overflow)``:
    shard s's valid rows are its first ``counts[s]``.

    Skew insurance: key-only routing cannot bound a hot join key, so when
    any shard overflows its exchange or join capacity the exact replicated
    join runs instead (inside ``lax.cond``, so it never executes eagerly)
    and is re-laid into the same padded layout — the result is ALWAYS
    exact unless even the global capacity (``nshards *
    capacity_per_shard``) truncates it, which the returned ``overflow``
    then reports (mirroring ``distributed_sort``'s fallback contract).

    Composite keys: pass column lists for both sides (matching dtypes), as
    in :func:`radix_sort_tpu.ops.query.hash_join`. Rows are then routed on a
    hash word mixed over ALL key limbs — equal composite keys share it, so
    they still co-locate, and the routing cardinality is the full tuple's
    rather than the leading column's (a low-cardinality leading column would
    otherwise collapse the partition onto few shards); the returned ``keys``
    is a column list.
    """
    if how not in query.JOIN_HOWS:
        raise ValueError(f"how must be one of {query.JOIN_HOWS}, got {how!r}")
    if how == "right":
        jk, j_rv, j_lv, cnts, ovf = distributed_hash_join(
            right_keys, right_values, left_keys, left_values, mesh,
            axis_name, capacity_per_shard=capacity_per_shard,
            exchange_capacity_factor=exchange_capacity_factor, how="left",
        )
        return jk, j_lv, j_rv, cnts, ovf
    from radix_sort_tpu import keys as K
    from radix_sort_tpu.parallel import dist_sort

    nshards = mesh.shape[axis_name]
    multi = isinstance(left_keys, (list, tuple))
    if multi != isinstance(right_keys, (list, tuple)):
        raise ValueError("left and right keys must both be single columns "
                         "or both be column lists")
    l_cols = list(left_keys) if multi else [left_keys]
    r_cols = list(right_keys) if multi else [right_keys]
    if multi and (not l_cols or len(l_cols) != len(r_cols) or any(
            np.dtype(a.dtype) != np.dtype(b.dtype)
            for a, b in zip(l_cols, r_cols))):
        raise ValueError("left and right key columns must be non-empty and "
                         "match in count and dtypes")
    lk_limbs, specs = query._cols_to_limbs(l_cols)
    rk_limbs, _ = query._cols_to_limbs(r_cols)
    nk = len(lk_limbs)
    sentinel = jnp.asarray(np.iinfo(np.uint32).max, dtype=jnp.uint32)
    n_left = lk_limbs[0].shape[0]
    n_right = rk_limbs[0].shape[0]
    multi_lv = isinstance(left_values, (list, tuple))
    lv_cols = list(left_values) if multi_lv else [left_values]
    multi_rv = isinstance(right_values, (list, tuple))
    rv_cols = list(right_values) if multi_rv else [right_values]
    nlv, nrv = len(lv_cols), len(rv_cols)
    for c in lv_cols:
        if c.shape[0] != n_left:
            raise ValueError("left keys/values length mismatch")
    for c in rv_cols:
        if c.shape[0] != n_right:
            raise ValueError("right keys/values length mismatch")
    # per-device receive capacity (the ragged exchange lands exact counts;
    # the factor provisions for key-skew imbalance, which key-only routing
    # cannot bound — overflow is flagged)
    cap_l = max(128, -(-int(n_left // nshards * exchange_capacity_factor) // 128) * 128)
    cap_r = max(128, -(-int(n_right // nshards * exchange_capacity_factor) // 128) * 128)

    def local(*ops):
        lw = list(ops[:nk])
        lv_l = list(ops[nk:nk + nlv])
        rw = list(ops[nk + nlv:2 * nk + nlv])
        rv_l = list(ops[2 * nk + nlv:])
        lv = lv_l if multi_lv else lv_l[0]
        rv = rv_l if multi_rv else rv_l[0]
        if nk > 1:
            # composite keys: route on a hash word mixed over all limbs
            # (prepended as the leading sort/exchange key; dropped from the
            # output). Quantile splitters over the hash see the tuple's
            # cardinality, so a low-cardinality leading column cannot
            # collapse the partition.
            lw = [_mix_limbs(lw), *lw]
            rw = [_mix_limbs(rw), *rw]
        # one splitter sketch over both sides' local routing words
        merged = jnp.sort(jnp.concatenate([lw[0], rw[0]]))
        splitters = dist_sort._key_splitters(merged, axis_name, nshards)

        lk_arg = lw if nk > 1 else lw[0]
        rk_arg = rw if nk > 1 else rw[0]
        lws, lvs, lcnt, lovf = dist_sort._local_exchange(
            lk_arg, lv, axis_name, nshards, cap_l, sentinel,
            splitters=splitters,
        )
        rws, rvs, rcnt, rovf = dist_sort._local_exchange(
            rk_arg, rv, axis_name, nshards, cap_r, sentinel,
            splitters=splitters,
        )
        lcnt, rcnt = lcnt[0], rcnt[0]

        # local sort-merge join: both shards sorted; clamp by valid counts
        # (merge_rank: searchsorted's per-query binary search is ~230 ns on
        # this chip — two variadic sorts give the same indices)
        lo, hi = query.merge_rank_pair(rws, lws)
        hi = jnp.minimum(hi, rcnt)
        lo = jnp.minimum(lo, hi)
        lvalid = jnp.arange(cap_l) < lcnt
        out_k, out_lv, out_rv, cnt, jovf = query.join_expand(
            lws,
            lvs,
            rvs,
            lo,
            hi,
            capacity=capacity_per_shard,
            how=how,
            valid_left=lvalid,
        )
        if how == "full":
            # co-partitioning makes unmatched-right detection local: append
            # this shard's unmatched valid right rows after its left block
            rvalid = jnp.arange(cap_r) < rcnt
            out_ks_l, out_lv, out_rv, cnt, jovf = (
                query.append_unmatched_right(
                    query._as_limb_list(out_k), out_lv, out_rv, cnt, jovf,
                    query._as_limb_list(rws), rvs, lo, hi,
                    capacity=capacity_per_shard,
                    valid_left=lvalid, valid_right=rvalid,
                )
            )
            out_k = out_ks_l if nk > 1 else out_ks_l[0]
        ovf = lovf[0] | rovf[0] | jovf
        gcnt = jax.lax.all_gather(cnt.reshape(1), axis_name, tiled=True)
        govf = jax.lax.psum(ovf.astype(jnp.int32), axis_name) > 0
        out_ks = query._as_limb_list(out_k)
        if nk > 1:
            out_ks = out_ks[1:]  # drop the routing hash word
        out_lvs = list(out_lv) if multi_lv else [out_lv]
        out_rvs = list(out_rv) if multi_rv else [out_rv]
        return (*out_ks, *out_lvs, *out_rvs, gcnt, govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (2 * nk + nlv + nrv),
        out_specs=(P(axis_name),) * (nk + nlv + nrv) + (P(), P()),
        check_vma=False,
    )
    out = fn(*lk_limbs, *lv_cols, *rk_limbs, *rv_cols)
    k_limbs = list(out[:nk])
    lvs = list(out[nk:nk + nlv])
    rvs = list(out[nk + nlv:nk + nlv + nrv])
    cnts, ovf = out[nk + nlv + nrv], out[nk + nlv + nrv + 1]
    out_cols = query._limbs_to_cols(k_limbs, specs)
    cnts = cnts[:nshards]
    povf = ovf[0]

    # Skew insurance: key-only routing cannot bound a hot key, so on any
    # exchange/join-capacity overflow the exact replicated join runs
    # instead (INSIDE the cond — it gathers both sides, so it must never
    # execute eagerly), re-laid into the same padded per-shard layout.
    # Mirrors distributed_sort's _global_sort_fallback contract: the result
    # is exact unless even the GLOBAL capacity (nshards * capacity_per_
    # shard) truncates it, which the returned overflow then reports.
    total_cap = nshards * capacity_per_shard

    def fb(_):
        fk, flv, frv, ftot, fovf = query.hash_join(
            l_cols if multi else l_cols[0],
            lv_cols if multi_lv else lv_cols[0],
            r_cols if multi else r_cols[0],
            rv_cols if multi_rv else rv_cols[0],
            capacity=total_cap, how=how,
        )
        fk_l = list(fk) if multi else [fk]
        flv_l = list(flv) if multi_lv else [flv]
        frv_l = list(frv) if multi_rv else [frv]
        # global valid prefix [0, ftot) -> contiguous per-shard prefixes
        fcnts = jnp.clip(
            ftot - jnp.arange(nshards, dtype=jnp.int32) * capacity_per_shard,
            0, capacity_per_shard,
        ).astype(cnts.dtype)
        return tuple(fk_l), tuple(flv_l), tuple(frv_l), fcnts, fovf

    (out_cols, lvs, rvs, cnts, fin_ovf) = jax.lax.cond(
        povf, fb,
        lambda t: t,
        (tuple(out_cols), tuple(lvs), tuple(rvs), cnts, povf),
    )
    out_cols, lvs, rvs = list(out_cols), list(lvs), list(rvs)
    return (
        out_cols if multi else out_cols[0],
        lvs if multi_lv else lvs[0],
        rvs if multi_rv else rvs[0],
        cnts,
        fin_ovf,
    )


def distributed_repeat(
    values,
    counts: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    total_size_per_shard: int,
):
    """UNNEST over row-sharded arrays: row i emits ``counts[i]`` copies of
    every value column, in order, into each shard's static
    ``total_size_per_shard`` rows (expansion is embarrassingly shard-local
    — no wire traffic beyond the count/overflow gather).

    ``values`` may be one array or a list (one shared expansion index).
    Returns ``(*outs, out_counts, overflow)``: shard s's valid expansion is
    its first ``out_counts[s]`` rows; ``overflow`` is True if any shard's
    true expansion exceeded its bound (that shard then holds its first
    ``total_size_per_shard`` rows, exactly — :func:`repeat`'s contract).
    """
    multi = isinstance(values, (list, tuple))
    cols = list(values) if multi else [values]
    n = counts.shape[0]
    for c in cols:
        if c.shape[0] != n:
            raise ValueError("values and counts must have the same length")
    nshards = mesh.shape[axis_name]

    def local(*ops):
        *vs, c = ops
        outs, cnt, ovf = query._expand_rows(
            list(vs), c, total_size_per_shard
        )
        gcnt = jax.lax.all_gather(cnt.reshape(1), axis_name, tiled=True)
        govf = jax.lax.psum(ovf.astype(jnp.int32), axis_name) > 0
        return (*outs, gcnt, govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (len(cols) + 1),
        out_specs=(P(axis_name),) * len(cols) + (P(), P()),
        check_vma=False,
    )
    out = fn(*cols, counts)
    outs = list(out[:len(cols)])
    return (
        *(outs if multi else outs[:1]),
        out[len(cols)][:nshards],
        out[len(cols) + 1][0],
    )


def distributed_quantiles(
    x: jnp.ndarray,
    qs,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    method: str = "lower",
):
    """Exact global quantiles of row-sharded ``x`` (order statistics under
    the dtype's total order — see :func:`radix_sort_tpu.quantiles`).

    Runs the distributed sort (whose overflow fallback guarantees an exact
    result for any distribution), then each quantile's global rank is
    resolved to the one shard owning it: shard offsets come from the
    exchange counts, the owner contributes its element (as one-hot encoded
    limbs), and a ``psum`` combines — no replication of the data, wire
    traffic is the sort exchange plus ``len(qs)`` rows. Returns a
    replicated array of ``len(qs)`` values.
    """
    from radix_sort_tpu import keys as K
    from radix_sort_tpu.ops.relational import quantile_ranks
    from radix_sort_tpu.parallel import dist_sort

    n = x.shape[0]
    if n == 0:
        raise ValueError("quantiles of an empty array")
    ranks = quantile_ranks(n, qs, method)
    sorted_p, counts, _ = dist_sort.distributed_sort(x, mesh, axis_name)
    nlimbs = len(K.encode_limbs(jnp.zeros((1,), x.dtype)))

    def local(shard, cts):
        d = jax.lax.axis_index(axis_name)
        off = (jnp.cumsum(cts) - cts)[d]
        cnt = cts[d]
        rs = jnp.asarray(ranks, jnp.int32)
        idx = jnp.clip(rs - off, 0, shard.shape[0] - 1)
        vals = shard[idx]
        hit = (rs >= off) & (rs < off + cnt)
        # combine in rank space: exactly one shard owns each rank, so a
        # psum of one-hot encoded limbs is the owner's value verbatim
        limbs = K.encode_limbs(vals)
        return tuple(
            jax.lax.psum(jnp.where(hit, w, 0), axis_name) for w in limbs
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=(P(),) * nlimbs,
        check_vma=False,
    )
    out = fn(sorted_p, counts.astype(jnp.int32))
    return K.decode_limbs(list(out), x.dtype)


def _distributed_set_op(a_keys, b_keys, want, mesh, axis_name, max_unique):
    """Two-phase distributed set operator: per-shard local DISTINCT on each
    side (wire traffic is ``max_unique`` rows per shard per side, not N),
    ``all_gather`` the padded distincts with validity masks, then ONE
    replicated tagged-union set op (ops/relational.py:_set_op) whose
    validity-aware presence bits make padding rows inert. Returns replicated
    ``(keys, count, overflow)``. When any shard has more than ``max_unique``
    local distincts the exact replicated set op over the global rows runs
    instead (inside ``lax.cond``) — exact unless the output buffer
    truncates it, which the returned ``overflow`` then reports."""
    from radix_sort_tpu.ops import relational

    multi = isinstance(a_keys, (list, tuple))
    if multi != isinstance(b_keys, (list, tuple)):
        raise ValueError("both sides must be single columns or column lists")
    a_cols = list(a_keys) if multi else [a_keys]
    b_cols = list(b_keys) if multi else [b_keys]
    if not a_cols or len(a_cols) != len(b_cols):
        raise ValueError("sides must have the same non-zero column count")
    for a, b in zip(a_cols, b_cols):
        if np.dtype(a.dtype) != np.dtype(b.dtype):
            raise ValueError("column dtypes must match between sides")
    na, nb = len(a_cols), len(b_cols)

    def _local_distinct(cols_in, is_multi):
        uk, _, num = query.unique(cols_in if is_multi or len(cols_in) > 1
                                  else cols_in[0])
        uks = list(uk) if isinstance(uk, (list, tuple)) else [uk]
        pad = max(0, max_unique - uks[0].shape[0])
        if pad:
            uks = [jnp.concatenate([u, jnp.zeros((pad,), u.dtype)])
                   for u in uks]
        uks = [u[:max_unique] for u in uks]
        valid = jnp.arange(max_unique) < num
        return uks, valid, num > max_unique

    def local(*ops):
        acs, bcs = list(ops[:na]), list(ops[na:])
        auk, avalid, aovf = _local_distinct(acs, multi)
        buk, bvalid, bovf = _local_distinct(bcs, multi)
        ga = [jax.lax.all_gather(u, axis_name, tiled=True) for u in auk]
        gb = [jax.lax.all_gather(u, axis_name, tiled=True) for u in buk]
        gav = jax.lax.all_gather(avalid, axis_name, tiled=True)
        gbv = jax.lax.all_gather(bvalid, axis_name, tiled=True)
        govf = jax.lax.psum(
            (aovf | bovf).astype(jnp.int32), axis_name
        ) > 0
        keys_out, count = relational._set_op(
            ga if multi else ga[0],
            gb if multi else gb[0],
            want,
            a_valid=gav,
            b_valid=gbv,
        )
        kouts = list(keys_out) if multi else [keys_out]
        return (*kouts, count.reshape(1), govf.reshape(1))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (na + nb),
        out_specs=(P(),) * (na + 2),
        check_vma=False,
    )
    out = fn(*a_cols, *b_cols)
    k_cols = list(out[:na])
    cnt, povf = out[na][0], out[na + 1][0]
    # overflow insurance: the exact replicated set op over the global rows
    total_cap = k_cols[0].shape[0]

    def fb(_):
        fk, fcnt = relational._set_op(
            a_cols if multi else a_cols[0],
            b_cols if multi else b_cols[0],
            want,
        )
        fk_l = list(fk) if multi else [fk]
        fk_l = [_pad_to(a, total_cap) for a in fk_l]
        fovf = fcnt > total_cap
        return tuple(fk_l), jnp.minimum(fcnt, total_cap), fovf

    k_cols, cnt, ovf = jax.lax.cond(
        povf, fb, lambda t: (*t, povf), (tuple(k_cols), cnt)
    )
    return (list(k_cols) if multi else k_cols[0], cnt, ovf)


def distributed_set_union(a_keys, b_keys, mesh: Mesh, axis_name: str = "x",
                          *, max_unique: int):
    """SQL ``UNION`` over row-sharded sides: distinct keys present in
    either, ascending under the total order (composite column lists
    supported). Returns replicated ``(keys, count, overflow)``."""
    return _distributed_set_op(
        a_keys, b_keys, lambda ha, hb: ha | hb, mesh, axis_name, max_unique
    )


def distributed_set_intersect(a_keys, b_keys, mesh: Mesh,
                              axis_name: str = "x", *, max_unique: int):
    """SQL ``INTERSECT`` over row-sharded sides: distinct keys present in
    both. Same contract as :func:`distributed_set_union`."""
    return _distributed_set_op(
        a_keys, b_keys, lambda ha, hb: ha & hb, mesh, axis_name, max_unique
    )


def distributed_set_difference(a_keys, b_keys, mesh: Mesh,
                               axis_name: str = "x", *, max_unique: int):
    """SQL ``EXCEPT`` over row-sharded sides: distinct keys present in the
    first side and absent from the second. Same contract as
    :func:`distributed_set_union`."""
    return _distributed_set_op(
        a_keys, b_keys, lambda ha, hb: ha & ~hb, mesh, axis_name, max_unique
    )
