"""Multi-chip distributed sort: shard_map bucket exchange over a mesh.

This is the TPU-native replacement for the reference's shared-memory thread
orchestration (mod.rs:90-168): instead of OS threads over one address space,
rows are sharded across mesh devices and redistributed with XLA collectives
riding ICI/DCN.

Algorithm (single exchange round, classic distribution sort):
  1. local stable sort of each shard in rank space (the per-chunk work,
     analogous to one thread's chunk in mod.rs:94-99);
  2. range-partition keys into one bucket per device -- bucket id is a
     monotonic function of the key, so the sorted shard is already grouped
     by destination and per-bucket slices are contiguous;
  3. exchange buckets with `jax.lax.all_to_all` (padded to a static
     capacity; the splitter-sampled partitioner keeps buckets balanced
     under skew);
  4. final local stable sort of the received rows.

Equal keys keep global input order: the exchange preserves (source device,
source position) order within each destination row block, and both local
sorts are stable -- the same invariant the reference maintains with its
digit-major/chunk-minor prefix sum (mod.rs:110-120).

The output is *range-ragged*: device d holds count[d] valid rows padded to
a static per-device capacity; concatenating valid prefixes in device order
is the fully sorted array. `capacity_factor` provisions the static pad; an
overflow flag reports if any bucket exceeded it (diagnosed, never silent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from radix_sort_tpu import keys as K

__all__ = ["distributed_sort", "distributed_sort_pairs", "uniform_bucket_id"]

from radix_sort_tpu.config import DEFAULT as _CFG

# samples contributed per device to the splitter sketch; oversampling keeps
# the max bucket within ~(1 + P/OVERSAMPLE) of the mean w.h.p.
OVERSAMPLE = _CFG.dist_oversample


def uniform_bucket_id(words: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    """Monotonic key -> bucket map assuming ~uniform keys: the top 16 bits
    scaled to [0, num_buckets). Skewed inputs use splitter-based partitions
    instead (see partition.py)."""
    bits = K.num_digit_bits(words.dtype)
    top = (words >> words.dtype.type(bits - 16)).astype(jnp.uint32)
    return ((top * np.uint32(num_buckets)) >> np.uint32(16)).astype(jnp.int32)


def _bucket_boundaries(sorted_bucket_ids: jnp.ndarray, num_buckets: int):
    """Start offset of each bucket in a bucket-sorted shard."""
    return jnp.searchsorted(
        sorted_bucket_ids, jnp.arange(num_buckets, dtype=sorted_bucket_ids.dtype)
    ).astype(jnp.int32)


def _gather_rows(padded: jnp.ndarray, starts: jnp.ndarray, capacity: int):
    """rows[j] = padded[starts[j] : starts[j]+capacity] via vmapped slices."""

    def row(s):
        return jax.lax.dynamic_slice_in_dim(padded, s, capacity)

    return jax.vmap(row)(starts)


def _sample_splitters(s_words, axis_name, num_devices):
    """Splitter-sampled range partition (the Zipf-skew taming step of the
    north star): every device contributes an evenly spaced quantile sample of
    its sorted shard; the gathered sketch's quantiles become the P-1 global
    splitters. Replicated computation, O(P * OVERSAMPLE) keys."""
    n_local = s_words.shape[0]
    m = min(OVERSAMPLE, n_local)
    pos = (jnp.arange(m, dtype=jnp.int32) * n_local) // m + n_local // (2 * m)
    samples = s_words[pos]
    sketch = jax.lax.all_gather(samples, axis_name, tiled=True)  # (P*m,)
    sketch = jnp.sort(sketch)
    ranks = (jnp.arange(num_devices - 1, dtype=jnp.int32) + 1) * m - 1
    return sketch[ranks]  # (P-1,) ascending


def _local_exchange(words, values, axis_name, num_devices, capacity, sentinel,
                    splitters=None):
    """Body run per device under shard_map. words: (n_local,) rank-space.
    ``splitters``: optional externally chosen (P-1,) range splitters (e.g. a
    join routing both sides on one sketch); sampled from this data if None.
    """
    n_local = words.shape[0]

    # --- 1+2: stable local sort; bucket id is monotonic in the key, so the
    # shard is simultaneously sorted and grouped by destination device.
    if values is None:
        operands = [words]
    else:
        operands = [words, values]
    sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=True)
    s_words = sorted_ops[0]

    if splitters is None:
        splitters = _sample_splitters(s_words, axis_name, num_devices)
    bucket = jnp.searchsorted(splitters, s_words, side="right").astype(jnp.int32)
    starts = _bucket_boundaries(bucket, num_devices)
    ends = jnp.append(starts[1:], jnp.int32(n_local))
    counts = ends - starts

    # --- 3: pack per-destination rows padded to static capacity and exchange.
    pad = jnp.full((capacity,), sentinel, dtype=s_words.dtype)
    padded_words = jnp.concatenate([s_words, pad])
    send_words = _gather_rows(padded_words, starts, capacity)  # (P, C)
    col = jax.lax.broadcasted_iota(jnp.int32, (num_devices, capacity), 1)
    valid = col < counts[:, None]
    send_words = jnp.where(valid, send_words, sentinel)

    recv_words = jax.lax.all_to_all(
        send_words, axis_name, split_axis=0, concat_axis=0, tiled=True
    )
    recv_counts = jax.lax.all_to_all(
        counts.reshape(num_devices, 1), axis_name, split_axis=0, concat_axis=0,
        tiled=True,
    ).reshape(num_devices)

    overflow = jnp.any(counts > capacity)
    overflow = jax.lax.psum(overflow.astype(jnp.int32), axis_name) > 0

    if values is not None:
        s_vals = sorted_ops[1]
        padded_vals = jnp.concatenate(
            [s_vals, jnp.zeros((capacity,), dtype=s_vals.dtype)]
        )
        send_vals = _gather_rows(padded_vals, starts, capacity)
        recv_vals = jax.lax.all_to_all(
            send_vals, axis_name, split_axis=0, concat_axis=0, tiled=True
        )
    else:
        recv_vals = None

    # --- 4: final stable local sort. Invalid padding carries the maximal
    # (invalid=1, key) composite so it sinks to the tail; ties keep
    # (source device, source position) order -> global stability.
    flat_words = recv_words.reshape(-1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (num_devices, capacity), 1)
    invalid = (col2 >= recv_counts[:, None]).reshape(-1).astype(jnp.int32)
    ops = [invalid, flat_words]
    if recv_vals is not None:
        ops.append(recv_vals.reshape(-1))
    sorted_final = jax.lax.sort(ops, num_keys=2, is_stable=True)

    total = jnp.sum(recv_counts).reshape(1)
    out_words = sorted_final[1]
    out_vals = sorted_final[2] if recv_vals is not None else None
    return out_words, out_vals, total, overflow.reshape(1)


def distributed_sort(
    keys: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    capacity_factor: float = _CFG.dist_capacity_factor,
):
    """Sort ``keys`` (sharded or shardable over ``mesh``'s ``axis_name``).

    Returns ``(sorted_padded, counts, overflow)`` where ``sorted_padded`` has
    shape (num_devices * capacity,) sharded over the mesh; device d's valid
    prefix is ``counts[d]`` rows and the concatenation of valid prefixes is
    the globally sorted array. ``overflow`` is a scalar bool -- True means a
    bucket exceeded the static capacity and the result is unusable (raise
    ``capacity_factor`` or use splitter partitioning).
    """
    out_words, _, counts, overflow = _dist_sort_impl(
        K.encode(keys), None, mesh, axis_name, capacity_factor
    )
    return K.decode(out_words, keys.dtype), counts, overflow


def distributed_sort_pairs(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    capacity_factor: float = _CFG.dist_capacity_factor,
):
    """Key/payload variant of :func:`distributed_sort` (stable)."""
    out_words, out_vals, counts, overflow = _dist_sort_impl(
        K.encode(keys), values, mesh, axis_name, capacity_factor
    )
    return K.decode(out_words, keys.dtype), out_vals, counts, overflow


def _dist_sort_impl(words, values, mesh, axis_name, capacity_factor):
    num_devices = mesh.shape[axis_name]
    n = words.shape[0]
    if n % num_devices != 0:
        raise ValueError(
            f"n ({n}) must be divisible by the mesh axis ({num_devices}); pad upstream"
        )
    n_local = n // num_devices
    capacity = int(np.ceil(n_local * capacity_factor / num_devices))
    # pad rows to lane multiples so the exchanged blocks tile well on TPU
    capacity = max(128, -(-capacity // 128) * 128)
    sentinel = np.array(np.iinfo(words.dtype).max, dtype=words.dtype)

    in_specs = [P(axis_name)]
    args = [words]
    if values is not None:
        in_specs.append(P(axis_name))
        args.append(values)

    body = functools.partial(
        _local_exchange,
        axis_name=axis_name,
        num_devices=num_devices,
        capacity=capacity,
        sentinel=sentinel,
    )

    if values is None:
        def fn(w):
            ow, _, cnt, ovf = body(w, None)
            return ow, cnt, ovf

        out_specs = (P(axis_name), P(axis_name), P(axis_name))
        ow, cnt, ovf = shard_map(
            fn, mesh=mesh, in_specs=(P(axis_name),), out_specs=out_specs,
            check_vma=False,
        )(words)
        return ow, None, cnt, jnp.any(ovf)

    def fn2(w, v):
        ow, ov, cnt, ovf = body(w, v)
        return ow, ov, cnt, ovf

    out_specs = (P(axis_name), P(axis_name), P(axis_name), P(axis_name))
    ow, ov, cnt, ovf = shard_map(
        fn2, mesh=mesh, in_specs=(P(axis_name), P(axis_name)), out_specs=out_specs,
        check_vma=False,
    )(words, values)
    return ow, ov, cnt, jnp.any(ovf)
