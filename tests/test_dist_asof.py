"""Distributed ASOF join on the virtual 8-device CPU mesh — must match the
single-chip join_asof (itself oracle-tested in test_relational.py)
bit-for-bit, including tie and carry-across-shard cases."""

import numpy as np
import pytest
import jax.numpy as jnp

import radix_sort_tpu as rst
from radix_sort_tpu.parallel import dist_asof, runtime


@pytest.fixture
def mesh():
    return runtime.data_mesh()


def _check(mesh, lk, rk, rv, **kw):
    exp = rst.join_asof(
        jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv), **kw
    )
    ld, rd, rvd = runtime.shard_rows(
        mesh, jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv)
    )
    got = dist_asof.distributed_join_asof(ld, rd, rvd, mesh, **kw)
    for g, e, name in zip(got, exp, ("values", "matched", "right_pos")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e),
                                      err_msg=name)


class TestDistributedJoinAsof:
    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("dtype", [np.uint32, np.int32])
    def test_matches_single_chip(self, rng, mesh, direction, dtype):
        n_l, n_r = 8 * 256, 8 * 128
        lk = rng.integers(0, 10_000, n_l).astype(dtype)
        rk = rng.integers(0, 10_000, n_r).astype(dtype)
        rv = rng.integers(0, 1 << 30, n_r).astype(np.uint32)
        _check(mesh, lk, rk, rv, direction=direction, fill=7)

    def test_float_keys(self, rng, mesh):
        n_l, n_r = 8 * 128, 8 * 64
        lk = (rng.random(n_l) * 100 - 50).astype(np.float32)
        rk = (rng.random(n_r) * 100 - 50).astype(np.float32)
        rv = np.arange(n_r, dtype=np.int32)
        for d in ("backward", "forward", "nearest"):
            _check(mesh, lk, rk, rv, direction=d)

    def test_duplicate_heavy_ties(self, rng, mesh):
        # few distinct keys: equal-key runs span shards; backward must pick
        # the LATEST original right row globally, exactly like single-chip
        n_l, n_r = 8 * 128, 8 * 128
        lk = rng.integers(0, 4, n_l).astype(np.uint32) * 10
        rk = rng.integers(0, 4, n_r).astype(np.uint32) * 10
        rv = np.arange(n_r, dtype=np.uint32)
        for d in ("backward", "forward", "nearest"):
            _check(mesh, lk, rk, rv, direction=d)

    def test_sparse_data_carry(self, rng, mesh):
        # only 3 right rows for 2048 queries: most shards hold no data after
        # the exchange and every match resolves through the carry chain
        n_l, n_r = 8 * 256, 8
        lk = rng.integers(0, 1 << 20, n_l).astype(np.uint32)
        rk = np.zeros(n_r, np.uint32)
        rk[:3] = [1 << 10, 1 << 15, 1 << 19]
        rv = np.arange(n_r, dtype=np.uint32)
        for d in ("backward", "forward"):
            _check(mesh, lk, rk, rv, direction=d)

    def test_tolerance(self, rng, mesh):
        n_l, n_r = 8 * 128, 8 * 64
        lk = rng.integers(0, 5_000, n_l).astype(np.uint32)
        rk = rng.integers(0, 5_000, n_r).astype(np.uint32)
        rv = np.arange(n_r, dtype=np.uint32)
        for d in ("backward", "forward", "nearest"):
            _check(mesh, lk, rk, rv, direction=d, tolerance=5)

    def test_u64_keys(self, rng, mesh):
        n_l, n_r = 8 * 64, 8 * 32
        lk = rng.integers(0, 1 << 62, n_l).astype(np.uint64)
        rk = rng.integers(0, 1 << 62, n_r).astype(np.uint64)
        rv = np.arange(n_r, dtype=np.uint32)
        for d in ("backward", "forward"):
            _check(mesh, lk, rk, rv, direction=d)

    def test_forced_overflow_falls_back_exactly(self, rng, mesh):
        n_l, n_r = 8 * 64, 8 * 64
        lk = rng.integers(0, 100, n_l).astype(np.uint32)
        rk = rng.integers(0, 100, n_r).astype(np.uint32)
        rv = np.arange(n_r, dtype=np.uint32)
        exp = rst.join_asof(jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv))
        ld, rd, rvd = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv)
        )
        got = dist_asof.distributed_join_asof(
            ld, rd, rvd, mesh, capacity=8  # force union-exchange overflow
        )
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(e))

    def test_errors(self, mesh):
        u = jnp.zeros((8,), jnp.uint32)
        u64 = jnp.zeros((8,), jnp.uint64)
        with pytest.raises(ValueError, match="direction"):
            dist_asof.distributed_join_asof(u, u, u, mesh, direction="x")
        with pytest.raises(ValueError, match="dtype"):
            dist_asof.distributed_join_asof(
                u, u.astype(jnp.int32), u, mesh
            )
        with pytest.raises(ValueError, match="32-bit"):
            dist_asof.distributed_join_asof(
                u64, u64, u, mesh, direction="nearest"
            )
