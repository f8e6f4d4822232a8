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
]


def _identity(dtype, combine):
    dt = np.dtype(dtype)
    if combine in ("sum", "count"):
        return dt.type(0)
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
):
    """Group-by + reduce over row-sharded keys/values.

    Per-shard sort-based aggregate, then an ``all_gather`` of per-shard
    partials and a replicated final combine. Returns replicated
    ``(unique_keys, aggregates, count, overflow)``; rows [0, count) are the
    groups in ascending key order. ``overflow`` is True if any shard had
    more than ``max_groups`` local groups (result then invalid).
    """
    if agg not in query.AGGREGATIONS:
        raise ValueError(f"agg must be one of {query.AGGREGATIONS}, got {agg!r}")
    combine = "sum" if agg == "count" else agg

    def local(k, v):
        uk, av, cnt = query.hash_aggregate(k, v, agg)
        # pad/trim to exactly max_groups (a shard may hold fewer rows)
        pad = max(0, max_groups - uk.shape[0])
        if pad:
            uk = jnp.concatenate([uk, jnp.zeros((pad,), uk.dtype)])
            av = jnp.concatenate([av, jnp.zeros((pad,), av.dtype)])
        uk = uk[:max_groups]
        av = av[:max_groups]
        overflow = cnt > max_groups
        valid = jnp.arange(max_groups) < cnt
        guk = jax.lax.all_gather(uk, axis_name, tiled=True)
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
        anchor = guk[jnp.argmax(gvalid)]
        guk2 = jnp.where(gvalid, guk, anchor)
        ident = _identity(gav.dtype, combine)
        gav2 = jnp.where(gvalid, gav, ident)
        fk, fv, fc = query.hash_aggregate(guk2, gav2, combine)
        fc = jnp.where(any_valid, fc, 0)  # all-invalid: zero groups, not one
        return fk, fv, fc.reshape(1), govf.reshape(1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    fk, fv, fc, ovf = fn(keys, values)
    return fk, fv, fc[0], ovf[0]


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
    order. ``overflow`` is True if any shard had more than ``max_unique``
    local distincts (result then invalid).
    """
    from radix_sort_tpu.ops.query import unique as _unique

    def local(k):
        uk, cts, num = _unique(k)
        pad = max(0, max_unique - uk.shape[0])
        if pad:
            uk = jnp.concatenate([uk, jnp.zeros((pad,), uk.dtype)])
            cts = jnp.concatenate([cts, jnp.zeros((pad,), cts.dtype)])
        uk, cts = uk[:max_unique], cts[:max_unique]
        overflow = num > max_unique
        valid = jnp.arange(max_unique) < num
        guk = jax.lax.all_gather(uk, axis_name, tiled=True)
        gcts = jax.lax.all_gather(cts, axis_name, tiled=True)
        gvalid = jax.lax.all_gather(valid, axis_name, tiled=True)
        govf = jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0
        # invalid rows: re-key to an existing distinct with count 0 (exact;
        # see distributed_hash_aggregate's anchor note)
        any_valid = jnp.any(gvalid)
        anchor = guk[jnp.argmax(gvalid)]
        guk2 = jnp.where(gvalid, guk, anchor)
        gcts2 = jnp.where(gvalid, gcts, 0)
        fk, fc, num_f = query.hash_aggregate(guk2, gcts2, "sum")
        num_f = jnp.where(any_valid, num_f, 0)
        return fk, fc, num_f.reshape(1), govf.reshape(1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    fk, fc, num, ovf = fn(keys)
    return fk, fc, num[0], ovf[0]


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
    """
    from radix_sort_tpu import keys as K

    n = keys.shape[0]
    if not 0 <= k <= n:
        raise ValueError(f"k must be in [0, {n}], got {k}")
    for a in arrays:
        if a.shape[0] != n:
            raise ValueError("all arrays must match the keys length")
    nshards = mesh.shape[axis_name]
    shard_rows = n // nshards
    kk = min(k, shard_rows)

    def local(kw, *arrs):
        # local stable top-kk on encoded words; ties -> lower local index
        w = kw if largest else ~kw
        topw, idx = jax.lax.top_k(w, kk)
        topw = topw if largest else ~topw
        gpos = (
            jax.lax.axis_index(axis_name).astype(jnp.int32) * shard_rows
            + idx.astype(jnp.int32)
        )
        cands_w = jax.lax.all_gather(topw, axis_name, tiled=True)
        cands_pos = jax.lax.all_gather(gpos, axis_name, tiled=True)
        cands_a = [
            jax.lax.all_gather(a[idx], axis_name, tiled=True) for a in arrs
        ]
        # final stable selection over nshards*kk candidates: sort by
        # (key-order, global position) and take the first k rows
        sel = ~cands_w if largest else cands_w
        out = jax.lax.sort(
            [sel, cands_pos, *cands_a], num_keys=2, is_stable=False
        )
        selw = ~out[0] if largest else out[0]
        return (selw[:k], *[a[:k] for a in out[2:]])

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * (1 + len(arrays)),
        out_specs=tuple(P() for _ in range(1 + len(arrays))),
        check_vma=False,
    )
    out = fn(K.encode(keys), *arrays)
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
    """Equi-join over row-sharded relations (``how``: inner/left/semi/anti,
    see :func:`radix_sort_tpu.ops.query.hash_join`).

    Both sides are range-routed with ONE shared splitter sketch (sampled
    from both sides' keys), so matching keys land on the same shard; each
    shard then runs a local sort-merge join (co-partitioning places every
    row with a given key on one shard, so per-left-row match counts — and
    hence left/semi/anti emission — are locally complete). Returns per-shard
    padded results ``(keys, left_vals, right_vals, counts, overflow)``:
    shard s's valid rows are its first ``counts[s]``; ``overflow`` covers
    both exchange-capacity and join-capacity overflows.
    """
    if how not in query.JOIN_HOWS:
        raise ValueError(f"how must be one of {query.JOIN_HOWS}, got {how!r}")
    from radix_sort_tpu import keys as K
    from radix_sort_tpu.parallel import dist_sort

    nshards = mesh.shape[axis_name]
    lkw = K.encode(left_keys)
    rkw = K.encode(right_keys)
    sentinel = jnp.asarray(
        np.iinfo(np.dtype(lkw.dtype)).max, dtype=lkw.dtype
    )
    n_left = lkw.shape[0]
    n_right = rkw.shape[0]
    # per-device receive capacity (the ragged exchange lands exact counts;
    # the factor provisions for key-skew imbalance, which key-only routing
    # cannot bound — overflow is flagged)
    cap_l = max(128, -(-int(n_left // nshards * exchange_capacity_factor) // 128) * 128)
    cap_r = max(128, -(-int(n_right // nshards * exchange_capacity_factor) // 128) * 128)

    def local(lw, lv, rw, rv):
        # one splitter sketch over both sides' local sorted keys
        ls = jnp.sort(lw)
        rs = jnp.sort(rw)
        merged = jnp.sort(jnp.concatenate([ls, rs]))
        splitters = dist_sort._key_splitters(merged, axis_name, nshards)

        lws, lvs, lcnt, lovf = dist_sort._local_exchange(
            lw, lv, axis_name, nshards, cap_l, sentinel, splitters=splitters
        )
        rws, rvs, rcnt, rovf = dist_sort._local_exchange(
            rw, rv, axis_name, nshards, cap_r, sentinel, splitters=splitters
        )
        lcnt, rcnt = lcnt[0], rcnt[0]

        # local sort-merge join: both shards sorted; clamp by valid counts
        # (merge_rank: searchsorted's per-query binary search is ~230 ns on
        # this chip — two variadic sorts give the same indices)
        lo, hi = query.merge_rank_pair(rws, lws)
        hi = jnp.minimum(hi, rcnt)
        lo = jnp.minimum(lo, hi)
        lvalid = jnp.arange(lws.shape[0]) < lcnt
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
        ovf = lovf[0] | rovf[0] | jovf
        gcnt = jax.lax.all_gather(cnt.reshape(1), axis_name, tiled=True)
        govf = jax.lax.psum(ovf.astype(jnp.int32), axis_name) > 0
        return out_k, out_lv, out_rv, gcnt, govf.reshape(1)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis_name),) * 4,
        out_specs=(P(axis_name), P(axis_name), P(axis_name), P(), P()),
        check_vma=False,
    )
    k, lv, rv, cnts, ovf = fn(lkw, left_values, rkw, right_values)
    return (
        K.decode(k, left_keys.dtype),
        lv,
        rv,
        cnts[:nshards],
        ovf[0],
    )
