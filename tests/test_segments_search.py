"""sort_segments (CUB DeviceSegmentedRadixSort semantics) and the public
total-order searchsorted — oracle tests per the reference pattern."""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst

N = 4_099


def _np_segmented(keys, offsets, vals=None):
    ok = keys.copy()
    ov = None if vals is None else vals.copy()
    for s in range(len(offsets) - 1):
        a, b = offsets[s], offsets[s + 1]
        perm = np.argsort(keys[a:b], kind="stable")
        ok[a:b] = keys[a:b][perm]
        if vals is not None:
            ov[a:b] = vals[a:b][perm]
    return ok, ov


class TestSortSegments:
    @pytest.mark.parametrize("dtype", [np.uint32, np.int16, np.float32,
                                       np.uint64])
    def test_matches_per_segment_oracle(self, rng, dtype):
        if dtype == np.float32:
            keys = (rng.random(N) * 100 - 50).astype(dtype)
        else:
            info = np.iinfo(dtype)
            keys = rng.integers(info.min, info.max, size=N, endpoint=True,
                                dtype=dtype)
        cuts = np.sort(rng.choice(N, size=7, replace=False))
        offsets = np.concatenate([[0], cuts, [N]]).astype(np.int32)
        vals = np.arange(N, dtype=np.uint32)
        ok, ov = rst.sort_segments(
            jnp.asarray(keys), jnp.asarray(offsets), [jnp.asarray(vals)]
        )
        want_k, want_v = _np_segmented(keys, offsets, vals)
        assert np.array_equal(np.asarray(ok), want_k)
        assert np.array_equal(np.asarray(ov[0]), want_v)

    def test_stability_within_segment(self, rng):
        keys = rng.integers(0, 4, size=N, dtype=np.uint32)  # heavy ties
        offsets = np.array([0, N // 3, N // 2, N], np.int32)
        vals = np.arange(N, dtype=np.uint32)
        ok, ov = rst.sort_segments(
            jnp.asarray(keys), jnp.asarray(offsets), [jnp.asarray(vals)]
        )
        want_k, want_v = _np_segmented(keys, offsets, vals)
        assert np.array_equal(np.asarray(ok), want_k)
        assert np.array_equal(np.asarray(ov[0]), want_v)

    def test_empty_segments_and_single(self, rng):
        keys = rng.integers(0, 1000, size=100, dtype=np.int32)
        # repeated offsets = empty segments at front/middle/end
        offsets = np.array([0, 0, 40, 40, 40, 100, 100], np.int32)
        ok, _ = rst.sort_segments(jnp.asarray(keys), jnp.asarray(offsets))
        want_k, _ = _np_segmented(keys, offsets)
        assert np.array_equal(np.asarray(ok), want_k)
        # one segment == full stable sort
        ok1, _ = rst.sort_segments(
            jnp.asarray(keys), jnp.asarray(np.array([0, 100], np.int32))
        )
        assert np.array_equal(np.asarray(ok1), np.sort(keys, kind="stable"))

    def test_descending_within_segments(self, rng):
        keys = rng.integers(0, 8, size=512, dtype=np.uint32)
        vals = np.arange(512, dtype=np.uint32)
        offsets = np.array([0, 200, 512], np.int32)
        ok, ov = rst.sort_segments(
            jnp.asarray(keys), jnp.asarray(offsets), [jnp.asarray(vals)],
            descending=True,
        )
        for a, b in [(0, 200), (200, 512)]:
            perm = np.argsort(np.invert(keys[a:b]), kind="stable")
            assert np.array_equal(np.asarray(ok)[a:b], keys[a:b][perm])
            assert np.array_equal(np.asarray(ov[0])[a:b], vals[a:b][perm])

    def test_empty_input_and_bad_values(self):
        k, v = rst.sort_segments(
            jnp.zeros((0,), jnp.uint32), jnp.asarray([0], jnp.int32)
        )
        assert k.shape == (0,) and v == []
        with pytest.raises(ValueError):
            rst.sort_segments(
                jnp.zeros(4, jnp.uint32), jnp.asarray([0, 4], jnp.int32),
                [jnp.zeros(5, jnp.uint32)],
            )


class TestSearchsorted:
    @pytest.mark.parametrize("side", ["left", "right"])
    @pytest.mark.parametrize("dtype", [np.uint32, np.int64, np.float32])
    def test_matches_numpy(self, rng, side, dtype):
        if dtype == np.float32:
            data = np.sort((rng.random(N) * 16).astype(dtype))
            q = (rng.random(777) * 20 - 2).astype(dtype)
        else:
            data = np.sort(rng.integers(0, 64, size=N).astype(dtype))
            q = rng.integers(-4, 70, size=777).astype(dtype)
        got = np.asarray(
            rst.searchsorted(jnp.asarray(data), jnp.asarray(q), side=side)
        )
        assert np.array_equal(got, np.searchsorted(data, q, side=side))

    @pytest.mark.parametrize("side", ["left", "right"])
    def test_large_query_side_merge_rank_path(self, rng, side):
        # query side >> data side / 20: exercises the union-sort formulation
        data = np.sort(rng.integers(0, 1000, size=500, dtype=np.uint32))
        q = rng.integers(0, 1200, size=50_000, dtype=np.uint32)
        got = np.asarray(
            rst.searchsorted(jnp.asarray(data), jnp.asarray(q), side=side)
        )
        assert np.array_equal(got, np.searchsorted(data, q, side=side))

    def test_total_order_specials(self):
        data = np.array([-np.inf, -1.0, -0.0, 0.0, 1.0, np.inf, np.nan],
                        np.float32)  # ascending under total_cmp
        q = np.array([0.0, -0.0, np.nan, 5.0], np.float32)
        lo = np.asarray(rst.searchsorted(jnp.asarray(data), jnp.asarray(q)))
        hi = np.asarray(
            rst.searchsorted(jnp.asarray(data), jnp.asarray(q), side="right")
        )
        # total order distinguishes -0.0 (index 2) from 0.0 (index 3)
        assert lo.tolist() == [3, 2, 6, 5]
        assert hi.tolist() == [4, 3, 7, 5]

    def test_validation(self):
        with pytest.raises(ValueError):
            rst.searchsorted(jnp.zeros(4, jnp.uint32),
                             jnp.zeros(4, jnp.int32))
        with pytest.raises(ValueError):
            rst.searchsorted(jnp.zeros(4, jnp.uint32),
                             jnp.zeros(4, jnp.uint32), side="mid")
        out = rst.searchsorted(jnp.zeros(4, jnp.uint32),
                               jnp.zeros(0, jnp.uint32))
        assert out.shape == (0,)
