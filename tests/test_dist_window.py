"""Distributed window functions vs the single-chip op on the 8-virtual-device
CPU mesh.

The single-chip ``rst.window`` is the oracle (itself oracle-tested in
test_window.py); ``distributed_window`` must match it row-for-row on the
original layout, across partition shapes that exercise the carry chains:
many small partitions, a few giant partitions spanning shards, one global
partition, duplicate-heavy order keys whose tie runs span shards.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import radix_sort_tpu as rst
from radix_sort_tpu.parallel.dist_window import distributed_window

N = 8 * 256


def _mesh():
    return Mesh(np.array(jax.devices()), ("x",))


ALL_OPS = ["row_number", "rank", "dense_rank", "count", "percent_rank",
           "cume_dist"]
VALUE_OPS = ["sum", "min", "max", "mean", "cumsum", "cummin", "cummax",
             "first_value", "last_value"]


def _check(part, order, vals, *, n_part_cols=1):
    mesh = _mesh()
    p = ([jnp.asarray(c) for c in part] if isinstance(part, list)
         else (jnp.asarray(part) if part is not None else None))
    o = ([jnp.asarray(c) for c in order] if isinstance(order, list)
         else (jnp.asarray(order) if order is not None else None))
    v = jnp.asarray(vals)
    specs = (ALL_OPS + [("ntile", 5), ("rolling_count", 3, 2)]
             + [(nm, v) for nm in VALUE_OPS]
             + [("rolling_sum", v, 4, 2), ("rolling_min", v, 3),
                ("rolling_max", v, 0, 3), ("rolling_mean", v, 5),
                ("lag", v, 2, 7), ("lead", v, 3), ("lag", v, 1),
                ("nth_value", v, 4, 9), ("nth_value", v, 1)])
    got = distributed_window(specs, partition_by=p, order_by=o, mesh=mesh)
    want = rst.window(specs, partition_by=p, order_by=o)
    for spec, g, w in zip(specs, got, want):
        nm = spec if isinstance(spec, str) else spec[0]
        g, w = np.asarray(g), np.asarray(w)
        if nm in ("mean", "sum", "cumsum", "rolling_mean",
                  "rolling_sum") and np.issubdtype(w.dtype, np.floating):
            np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-5,
                                       err_msg=nm)
        else:
            np.testing.assert_array_equal(g, w, err_msg=nm)


def test_many_small_partitions(rng):
    part = rng.integers(0, 97, size=N).astype(np.int32)
    order = rng.integers(0, 11, size=N).astype(np.uint32)  # heavy ties
    vals = rng.integers(-50, 50, size=N).astype(np.int32)
    _check(part, order, vals)


def test_giant_partitions_span_shards(rng):
    part = rng.integers(0, 3, size=N).astype(np.uint8)  # ~680 rows each
    order = rng.integers(0, 5, size=N).astype(np.int16)  # runs span shards
    vals = rng.integers(0, 1000, size=N).astype(np.uint32)
    _check(part, order, vals)


def test_single_global_partition(rng):
    part = np.zeros(N, np.int32)
    order = rng.integers(0, 7, size=N).astype(np.uint32)
    vals = rng.integers(-9, 9, size=N).astype(np.int64)
    _check(part, order, vals)


def test_all_rows_tie_everywhere(rng):
    # one partition, one order value: every row is one global tie run
    part = np.zeros(N, np.int32)
    order = np.full(N, 42, np.uint32)
    vals = rng.integers(0, 100, size=N).astype(np.int32)
    _check(part, order, vals)


def test_float_values(rng):
    part = rng.integers(0, 13, size=N).astype(np.int32)
    order = rng.integers(0, 23, size=N).astype(np.uint32)
    vals = rng.standard_normal(N).astype(np.float32)
    _check(part, order, vals)


def test_no_order_by(rng):
    part = rng.integers(0, 29, size=N).astype(np.int32)
    vals = rng.integers(-100, 100, size=N).astype(np.int32)
    _check(part, None, vals)


def test_no_partition_by(rng):
    order = rng.integers(0, 17, size=N).astype(np.uint32)
    vals = rng.integers(0, 50, size=N).astype(np.int32)
    _check(None, order, vals)


def test_multicol_partition_and_order(rng):
    p1 = rng.integers(0, 4, size=N).astype(np.int32)
    p2 = rng.integers(0, 3, size=N).astype(np.uint64)
    o1 = rng.integers(0, 4, size=N).astype(np.int16)
    o2 = rng.standard_normal(N).astype(np.float32)
    vals = rng.integers(0, 100, size=N).astype(np.int32)
    _check([p1, p2], [o1, o2], vals)


def test_overflow_fallback_is_exact(rng):
    """A tiny capacity override forces exchange overflow; the replicated
    fallback must still return the exact answer."""
    mesh = _mesh()
    part = rng.integers(0, 5, size=N).astype(np.int32)
    order = rng.integers(0, 7, size=N).astype(np.uint32)
    vals = rng.integers(0, 100, size=N).astype(np.int32)
    p, o, v = jnp.asarray(part), jnp.asarray(order), jnp.asarray(vals)
    specs = ["row_number", ("cumsum", v)]
    got = distributed_window(specs, partition_by=p, order_by=o, mesh=mesh,
                             capacity=N // 8)  # == n_local: must overflow
    want = rst.window(specs, partition_by=p, order_by=o)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_single_spec_and_jit(rng):
    mesh = _mesh()
    part = rng.integers(0, 11, size=N).astype(np.int32)
    vals = rng.integers(0, 100, size=N).astype(np.int32)
    p, v = jnp.asarray(part), jnp.asarray(vals)
    got = jax.jit(
        lambda p_, v_: distributed_window(
            ("cummax", v_), partition_by=p_, mesh=mesh
        )
    )(p, v)
    want = rst.window(("cummax", v), partition_by=p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_validation():
    mesh = _mesh()
    z = jnp.zeros((N,), jnp.int32)
    with pytest.raises(ValueError):
        distributed_window("row_number", partition_by=jnp.zeros(
            (N + 1,), jnp.int32), mesh=mesh)
    with pytest.raises(ValueError):
        distributed_window("bogus", partition_by=z, mesh=mesh)


def test_rolling_frame_exceeds_shard_falls_back_exact(rng):
    # preceding > any shard's row count: the halo cannot cover the frame,
    # the per-shard flag trips, and the exact replicated fallback runs
    part = rng.integers(0, 3, size=N).astype(np.int32)
    order = rng.integers(0, 1000, size=N).astype(np.uint32)
    vals = rng.integers(-50, 50, size=N).astype(np.int32)
    mesh = _mesh()
    spec = ("rolling_sum", jnp.asarray(vals), N // 8 + 50)
    got = distributed_window(
        spec, partition_by=jnp.asarray(part), order_by=jnp.asarray(order),
        mesh=mesh,
    )
    want = rst.window(
        spec, partition_by=jnp.asarray(part), order_by=jnp.asarray(order)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lag_offset_exceeds_shard_falls_back_exact(rng):
    # lag offset > any shard's row count trips the halo flag -> exact
    # replicated fallback (same contract as rolling frames)
    part = np.zeros(N, np.int32)
    order = rng.integers(0, 1000, size=N).astype(np.uint32)
    vals = rng.integers(-50, 50, size=N).astype(np.int32)
    mesh = _mesh()
    spec = ("lag", jnp.asarray(vals), N // 8 + 10, -1)
    got = distributed_window(
        spec, partition_by=jnp.asarray(part), order_by=jnp.asarray(order),
        mesh=mesh,
    )
    want = rst.window(
        spec, partition_by=jnp.asarray(part), order_by=jnp.asarray(order)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_nth_value_spans_shards(rng):
    # giant partitions: the k-th row usually lives shards away from the
    # rows it broadcasts to — exercises the marked-word carry chains
    part = rng.integers(0, 2, size=N).astype(np.int32)
    order = rng.integers(0, 1 << 30, size=N).astype(np.uint32)
    vals = rng.integers(-100, 100, size=N).astype(np.int32)
    mesh = _mesh()
    p, o, v = jnp.asarray(part), jnp.asarray(order), jnp.asarray(vals)
    specs = [("nth_value", v, k) for k in (1, 2, 500, N)]
    got = distributed_window(specs, partition_by=p, order_by=o, mesh=mesh)
    want = rst.window(specs, partition_by=p, order_by=o)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


class TestShardedRangeFrames:
    """Bounded RANGE (value) frames take the sharded halo path (round 5):
    a fixed range_halo of sorted neighbor rows each way + merge-rank
    bounds on the extended view, with the halo-edge check tripping the
    exact replicated fallback. `dist_window._last_fallback` says which
    path produced the result."""

    def _run(self, part, order, vals, specs, halo=None):
        from radix_sort_tpu.parallel import dist_window as DW
        mesh = _mesh()
        got = distributed_window(
            specs, partition_by=jnp.asarray(part),
            order_by=jnp.asarray(order), mesh=mesh, range_halo=halo)
        want = rst.window(specs, partition_by=jnp.asarray(part),
                          order_by=jnp.asarray(order))
        for spec, g, w in zip(specs, got, want):
            nm = spec if isinstance(spec, str) else spec[0]
            if np.issubdtype(np.asarray(w).dtype, np.floating):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=2e-5, err_msg=nm)
            else:
                np.testing.assert_array_equal(np.asarray(g),
                                              np.asarray(w), err_msg=nm)
        return bool(np.asarray(DW._last_fallback))

    def test_sharded_path_many_partitions(self, rng):
        # narrow frames over many partitions: must stay on the sharded
        # path (no fallback) and match the single-chip oracle exactly
        part = rng.integers(0, 64, N).astype(np.uint32)
        order = rng.integers(0, 500, N).astype(np.int32)
        vals = rng.integers(-40, 40, N).astype(np.int32)
        v = jnp.asarray(vals)
        fell_back = self._run(
            part, order, vals,
            [("range_sum", v, 10, 10), ("range_count", 5, 0),
             ("range_min", v, 25, 0), ("range_max", v, 0, 25),
             ("range_mean", v, 8, 8)])
        assert not fell_back, "expected the sharded halo path"

    def test_partition_spanning_shards_exact(self, rng):
        # a handful of giant partitions whose rows cross every shard
        # boundary; frames near boundaries must be exact whichever path
        # runs, and a too-small halo must trip the fallback, not corrupt
        part = rng.integers(0, 3, N).astype(np.uint32)
        order = rng.integers(0, 10_000, N).astype(np.int32)
        vals = rng.integers(0, 100, N).astype(np.uint32)
        v = jnp.asarray(vals)
        self._run(part, order, vals,
                  [("range_sum", v, 300, 300)], halo=8)

    def test_wide_frame_falls_back(self, rng):
        # one global partition + frame wider than any halo: the edge
        # check must trip the replicated fallback and stay exact
        part = np.zeros(N, np.uint32)
        order = np.arange(N, dtype=np.int32)
        vals = rng.integers(0, 9, N).astype(np.int32)
        v = jnp.asarray(vals)
        fell_back = self._run(part, order, vals,
                              [("range_sum", v, N, N)], halo=16)
        assert fell_back, "expected the replicated fallback"

    def test_partial_left_halo_exact(self, rng):
        # round-5 review repro: a neighbor whose post-exchange count is
        # BELOW the halo ships exchange-padding junk inside its block;
        # the sender-side roll must keep valid rows adjacent to the
        # receiver's local rows (junk at the far edge) or frames
        # crossing the boundary silently lose rows
        mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
        n = 32
        order = rng.integers(0, 12, n).astype(np.int32)  # heavy dups
        part = np.zeros(n, np.uint32)
        vals = rng.integers(0, 20, n).astype(np.int32)
        v = jnp.asarray(vals)
        specs = [("range_sum", v, 2, 0)]
        got = distributed_window(
            specs, partition_by=jnp.asarray(part),
            order_by=jnp.asarray(order), mesh=mesh, range_halo=16)
        want = rst.window(specs, partition_by=jnp.asarray(part),
                          order_by=jnp.asarray(order))
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))

    def test_last_fallback_not_stale(self, rng):
        from radix_sort_tpu.parallel import dist_window as DW
        part = rng.integers(0, 64, N).astype(np.uint32)
        order = rng.integers(0, 500, N).astype(np.int32)
        vals = rng.integers(0, 9, N).astype(np.int32)
        v = jnp.asarray(vals)
        self._run(part, order, vals, [("range_sum", v, 5, 5)])
        assert not bool(np.asarray(DW._last_fallback))
        # an unbounded-RANGE call takes the replicated path and must
        # say so, not leave the previous call's flag behind
        self._run(part, order, vals, [("range_sum", v, None, 5)])
        assert bool(np.asarray(DW._last_fallback))

    def test_unbounded_side_replicates(self, rng):
        part = rng.integers(0, 16, N).astype(np.uint32)
        order = rng.integers(0, 100, N).astype(np.int32)
        vals = rng.integers(0, 50, N).astype(np.int32)
        v = jnp.asarray(vals)
        self._run(part, order, vals, [("range_max", v, None, 3)])

    def test_mixed_with_rolling_and_ranks(self, rng):
        # RANGE specs share the plan with rolling/rank specs: the halo
        # merges both needs and every result stays exact
        part = rng.integers(0, 40, N).astype(np.uint32)
        order = rng.integers(0, 300, N).astype(np.int32)
        vals = rng.integers(-20, 20, N).astype(np.int32)
        v = jnp.asarray(vals)
        fell_back = self._run(
            part, order, vals,
            ["row_number", ("rolling_sum", v, 4, 2),
             ("range_sum", v, 12, 0), ("lag", v, 1)])
        assert not fell_back
