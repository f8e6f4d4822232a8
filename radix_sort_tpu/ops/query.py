"""Vectorized query operators: filter, hash_join, hash_aggregate.

The north-star operator set layered over the sort engine (BASELINE.json;
the reference crate itself is sort-only — these are the query-engine
capabilities the TPU build adds on top, built the TPU way):

  - ``filter``: predicate compaction as a stable 1-bit partition — kept rows
    keep their order, the result is the valid prefix (static shapes + count,
    the standard XLA convention for data-dependent sizes).
  - ``hash_aggregate``: group-by + {sum, count, min, max}. On a vector
    machine the classic hash table serializes; the massively-parallel
    equivalent is sort-based aggregation: stable sort by key, mark group
    boundaries, segment-reduce with cumulative sums. Same contract as a
    hash aggregate (unique keys in some order + one aggregate per key).
  - ``hash_join``: inner equi-join via sort + binary search (sort-merge
    join): the build side is sorted once, probes binary-search their key
    range, matches expand with prefix-sum addressing into a static-capacity
    output (+ overflow flag).

All outputs are (padded arrays..., count) — concatenating/slicing the first
``count`` rows gives the exact ragged result. Key dtypes: any supported by
:mod:`radix_sort_tpu.keys`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from radix_sort_tpu import keys as K

__all__ = ["filter", "hash_aggregate", "hash_join", "AGGREGATIONS"]

AGGREGATIONS = ("sum", "count", "min", "max")


def _stable_sort(operands, num_keys):
    return jax.lax.sort(list(operands), num_keys=num_keys, is_stable=True)


def merge_rank(sorted_arr, queries, side="left"):
    """``jnp.searchsorted(sorted_arr, queries, side)`` at comparator rate.

    jnp.searchsorted lowers to a per-query binary search — ~24 dependent
    device gathers each, measured ~230 ns/query on this chip (3.7 s for 16M
    queries). Two stable variadic sorts produce the same indices: sort the
    union by (key, origin-tag) — ties put queries before data for
    side="left" and after for side="right" — then each query's insertion
    index is its union position minus its rank among queries; a second sort
    restores original query order.
    """
    n_d = sorted_arr.shape[0]
    n_q = queries.shape[0]
    tq = jnp.int32(0 if side == "left" else 1)
    td = jnp.int32(1 if side == "left" else 0)
    key = jnp.concatenate([sorted_arr, queries])
    tag = jnp.concatenate(
        [jnp.full((n_d,), td, jnp.int32), jnp.full((n_q,), tq, jnp.int32)]
    )
    idx = jnp.concatenate(
        [jnp.zeros((n_d,), jnp.int32), jnp.arange(n_q, dtype=jnp.int32)]
    )
    _, t2, i2 = _stable_sort([key, tag, idx], num_keys=2)
    isq = (t2 == tq).astype(jnp.int32)
    rank_q = jnp.cumsum(isq) - isq
    res = jnp.arange(n_d + n_q, dtype=jnp.int32) - rank_q
    # bring queries (flag 0) to the front in original order
    _, _, res2 = _stable_sort([1 - isq, i2, res], num_keys=2)
    return res2[:n_q]


def filter(mask: jnp.ndarray, *arrays: jnp.ndarray):
    """Compact rows where ``mask`` is True, preserving order.

    Returns ``(*compacted, count)``: each output array has the input length;
    rows [0, count) are the kept rows in their original order, the tail is
    the dropped rows (also in order — the op is a stable partition).
    """
    if not arrays:
        raise ValueError("filter needs at least one array")
    n = mask.shape[0]
    for a in arrays:
        if a.shape[0] != n:
            raise ValueError(
                f"all arrays must match mask length {n}, got {a.shape}"
            )
    discard = (~mask).astype(jnp.uint32)
    out = _stable_sort([discard, *arrays], num_keys=1)
    count = jnp.sum(mask.astype(jnp.int32))
    return (*out[1:], count)


def hash_aggregate(keys: jnp.ndarray, values: jnp.ndarray, agg: str = "sum"):
    """Group ``values`` by ``keys`` and reduce with ``agg``.

    Returns ``(unique_keys, aggregates, count)``: rows [0, count) hold one
    group each, keys in ascending key order (a deterministic, stronger
    contract than a hash aggregate's arbitrary order).

    sum/count accumulate in the value dtype (modular for unsigned ints,
    IEEE for floats); min/max are exact for any supported dtype.
    """
    if agg not in AGGREGATIONS:
        raise ValueError(f"agg must be one of {AGGREGATIONS}, got {agg!r}")
    if values.shape[0] != keys.shape[0]:
        raise ValueError("keys and values must have the same length")
    n = keys.shape[0]
    if n == 0:
        vdt = jnp.int32 if agg == "count" else values.dtype
        return keys, jnp.zeros((0,), vdt), jnp.int32(0)
    kw = K.encode(keys)

    if agg in ("min", "max"):
        # sort by (key, value): group min = first row, max = last row
        vw = K.encode(values)
        sk, sv = _stable_sort([kw, vw], num_keys=2)
        sv = K.decode(sv, values.dtype)
    else:
        sk, sv = _stable_sort([kw, values], num_keys=1)

    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sk[1:] != sk[:-1]]
    )
    last = jnp.concatenate([first[1:], jnp.ones((1,), jnp.bool_)])

    uk = K.decode(sk, keys.dtype)
    if agg in ("sum", "count"):
        if agg == "count":
            sv = jnp.ones((n,), jnp.int32)
        if jnp.issubdtype(sv.dtype, jnp.floating):
            # floats: a per-group segmented reduction — the cumsum-difference
            # trick inherits cancellation error proportional to the whole
            # preceding prefix, much worse than per-group IEEE summation
            gid = jnp.cumsum(first.astype(jnp.int32)) - 1
            seg = jax.ops.segment_sum(sv, gid, num_segments=n)
            out_keys, _, count = filter(last, uk, sv)
            return out_keys, seg, count
        # ints: compact the running total at each group END; consecutive ends
        # then differ by exactly the group's sum (modular arithmetic is exact
        # under wraparound) — no segment fill or gather
        csum = jnp.cumsum(sv)
        out_keys, csum_c, count = filter(last, uk, csum)
        prev = jnp.roll(csum_c, 1).at[0].set(0)
        return out_keys, csum_c - prev, count
    pick = first if agg == "min" else last
    out_keys, out_vals, count = filter(pick, uk, sv)
    return out_keys, out_vals, count


def hash_join(
    left_keys: jnp.ndarray,
    left_values: jnp.ndarray,
    right_keys: jnp.ndarray,
    right_values: jnp.ndarray,
    *,
    capacity: int,
):
    """Inner equi-join. Returns ``(keys, left_vals, right_vals, count,
    overflow)``: rows [0, count) are all (left, right) matching pairs,
    ordered by left row then right sorted position. ``overflow`` is True if
    more than ``capacity`` pairs exist (result then holds the first
    ``capacity``).
    """
    if left_values.shape[0] != left_keys.shape[0]:
        raise ValueError("left keys/values length mismatch")
    if right_values.shape[0] != right_keys.shape[0]:
        raise ValueError("right keys/values length mismatch")
    if left_keys.shape[0] == 0 or right_keys.shape[0] == 0:
        # an empty side is a normal inner-join input: zero matching pairs
        z = jnp.zeros((capacity,), left_keys.dtype)
        return (
            z,
            jnp.zeros((capacity,), left_values.dtype),
            jnp.zeros((capacity,), right_values.dtype),
            jnp.int32(0),
            jnp.bool_(False),
        )
    lk = K.encode(left_keys)
    rk = K.encode(right_keys)
    rks, rvs = _stable_sort([rk, right_values], num_keys=1)

    lo = merge_rank(rks, lk, side="left")
    hi = merge_rank(rks, lk, side="right")
    matches = hi - lo
    starts = jnp.cumsum(matches) - matches  # output offset per left row
    total = starts[-1] + matches[-1] if matches.shape[0] else jnp.int32(0)

    # >2^31 total pairs wrap the int32 running sum (duplicate-heavy keys on
    # large inputs). A true prefix sum is non-decreasing, so wrapped entries
    # are exactly those below the running max: poison them to INT32_MAX (all
    # wrapped rows lie beyond any practical capacity) so the expansion's
    # binary search still resolves the un-wrapped prefix exactly, and force
    # the overflow flag — never a silently-negative count.
    mono = jax.lax.cummax(starts)
    wrapped = jnp.any(starts != mono) | (total < 0)
    big = jnp.int32(2**31 - 1)
    starts = jnp.where(starts == mono, starts, big)
    total = jnp.where(wrapped, big, total)

    # expansion: output slot t belongs to left row i(t), match ordinal
    # j(t) = t - starts[i]; i(t) = #offsets <= t via the merge-rank trick
    t = jnp.arange(capacity, dtype=jnp.int32)
    i = merge_rank(starts, t, side="right") - 1
    i = jnp.clip(i, 0, lk.shape[0] - 1)
    j = t - starts[i]
    valid = t < total
    ridx = jnp.clip(lo[i] + j, 0, rks.shape[0] - 1)

    out_keys = K.decode(jnp.where(valid, lk[i], 0), left_keys.dtype)
    out_lv = jnp.where(valid, left_values[i], 0)
    out_rv = jnp.where(valid, rvs[ridx], 0)
    count = jnp.minimum(total, capacity)
    overflow = (total > capacity) | wrapped
    return out_keys, out_lv, out_rv, count, overflow
