"""Distributed sort tests on the 8-virtual-device CPU mesh (the fake-backend
pattern SURVEY.md section 4 prescribes for collectives without a TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from radix_sort_tpu.parallel import dist_sort


def _mesh():
    return Mesh(np.array(jax.devices()), ("x",))


def _collect(sorted_padded, counts, num_devices):
    """Concatenate the valid prefix of each device's range (ragged output)."""
    per_dev = np.split(np.asarray(sorted_padded), num_devices)
    cnt = np.asarray(counts)
    return np.concatenate([d[: cnt[i]] for i, d in enumerate(per_dev)])


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64, np.int32, np.float32])
def test_distributed_sort_matches_oracle(rng, dtype):
    mesh = _mesh()
    n = 8 * 4096
    if np.dtype(dtype).kind == "f":
        x = rng.standard_normal(n).astype(dtype)
    else:
        info = np.iinfo(dtype)
        x = rng.integers(info.min, info.max, size=n, endpoint=True, dtype=dtype)
    out, counts, overflow = jax.jit(
        lambda k: dist_sort.distributed_sort(k, mesh)
    )(jnp.asarray(x))
    assert not bool(overflow)
    got = _collect(out, counts, 8)
    assert got.shape == x.shape
    assert np.array_equal(got, np.sort(x, kind="stable"))


def test_distributed_sort_pairs_stable(rng):
    mesh = _mesh()
    n = 8 * 2048
    keys = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    # force heavy duplicates to exercise stability across device boundaries
    keys = (keys >> 24).astype(np.uint32) << 24
    vals = np.arange(n, dtype=np.uint32)
    k, v, counts, overflow = jax.jit(
        lambda a, b: dist_sort.distributed_sort_pairs(a, b, mesh)
    )(jnp.asarray(keys), jnp.asarray(vals))
    assert not bool(overflow)
    got_k = _collect(k, counts, 8)
    got_v = _collect(v, counts, 8)
    order = np.argsort(keys, kind="stable")
    assert np.array_equal(got_k, keys[order])
    assert np.array_equal(got_v, vals[order])


def test_distributed_sort_skew_overflows_gracefully(rng):
    # constant keys all land in one bucket: must flag overflow, not corrupt
    mesh = _mesh()
    n = 8 * 2048
    x = np.full(n, 123456789, np.uint32)
    _, _, overflow = jax.jit(lambda k: dist_sort.distributed_sort(k, mesh))(
        jnp.asarray(x)
    )
    assert bool(overflow)
