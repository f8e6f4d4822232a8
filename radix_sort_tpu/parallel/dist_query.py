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

__all__ = ["distributed_hash_aggregate"]


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
        anchor = guk[0]  # shard 0's first group: valid whenever rows exist
        guk2 = jnp.where(gvalid, guk, anchor)
        ident = _identity(gav.dtype, combine)
        gav2 = jnp.where(gvalid, gav, ident)
        fk, fv, fc = query.hash_aggregate(guk2, gav2, combine)
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
