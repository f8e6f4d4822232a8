"""Distributed aggregate tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radix_sort_tpu.parallel import dist_query, runtime


@pytest.fixture
def mesh():
    return runtime.data_mesh()


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max"])
def test_matches_single_chip(rng, mesh, agg):
    n = 8 * 1024
    keys = rng.integers(0, 37, n).astype(np.uint32)
    vals = rng.integers(1, 1000, n).astype(np.uint32)
    k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
    uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
        k, v, mesh, agg, max_groups=64
    )
    assert not bool(ovf)
    cnt = int(cnt)
    ref_keys = np.unique(keys)
    assert cnt == len(ref_keys)
    np.testing.assert_array_equal(np.asarray(uk)[:cnt], ref_keys)
    fns = {"sum": np.sum, "count": len, "min": np.min, "max": np.max}
    ref = np.array([fns[agg](vals[keys == u]) for u in ref_keys], dtype=np.int64)
    np.testing.assert_array_equal(np.asarray(av)[:cnt].astype(np.int64), ref)


def test_overflow_flag(rng, mesh):
    n = 8 * 1024
    keys = np.arange(n, dtype=np.uint32)  # every row its own group
    vals = np.ones(n, np.uint32)
    k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
    _, _, _, ovf = dist_query.distributed_hash_aggregate(
        k, v, mesh, "sum", max_groups=16
    )
    assert bool(ovf)


def test_mesh_helpers():
    m = runtime.data_mesh("rows")
    assert m.axis_names == ("rows",)
    assert m.devices.size == len(jax.devices())


def test_max_groups_exceeds_shard_rows(rng, mesh):
    # max_groups larger than the per-shard row count must not crash
    n = 8 * 4
    keys = rng.integers(0, 3, n).astype(np.uint32)
    vals = np.ones(n, np.uint32)
    k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
    uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
        k, v, mesh, "sum", max_groups=16
    )
    assert not bool(ovf)
    ref_keys = np.unique(keys)
    assert int(cnt) == len(ref_keys)
    np.testing.assert_array_equal(np.asarray(uk)[: int(cnt)], ref_keys)
