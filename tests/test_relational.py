"""Relational completions: join_asof, set operators, quantiles — oracle
tests per the reference pattern (bit-exact vs a trusted numpy oracle,
src/radix_sort/tests.rs:7-23)."""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst

N_L = 1_537
N_R = 2_049


def _np_asof(lk, rk, direction):
    """Brute-force oracle: matched original right index per left key
    (backward: greatest key <= q, latest tie; forward: least key >= q,
    earliest tie; nearest: closer of the two, ties backward)."""
    order = np.argsort(rk, kind="stable")
    rs = rk[order]
    out = np.full(lk.shape[0], -1, np.int64)
    for i, q in enumerate(lk):
        hi = np.searchsorted(rs, q, side="right")
        lo = np.searchsorted(rs, q, side="left")
        b = order[hi - 1] if hi > 0 else -1
        f = order[lo] if lo < rs.shape[0] else -1
        if direction == "backward":
            out[i] = b
        elif direction == "forward":
            out[i] = f
        else:
            if b < 0:
                out[i] = f
            elif f < 0:
                out[i] = b
            else:
                db = int(q) - int(rs[hi - 1])
                df = int(rs[lo]) - int(q)
                out[i] = f if df < db else b
    return out


class TestJoinAsof:
    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    @pytest.mark.parametrize("dtype", [np.uint32, np.int16])
    def test_int_matches_oracle(self, rng, direction, dtype):
        info = np.iinfo(dtype)
        lk = rng.integers(info.min, info.max, size=N_L, endpoint=True,
                          dtype=dtype)
        rk = rng.integers(info.min, info.max, size=N_R, endpoint=True,
                          dtype=dtype)
        rv = rng.integers(0, 1 << 30, size=N_R, dtype=np.uint32)
        vals, matched, pos = rst.join_asof(
            jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv),
            direction=direction, fill=7,
        )
        exp_pos = _np_asof(lk, rk, direction)
        np.testing.assert_array_equal(np.asarray(pos), exp_pos)
        np.testing.assert_array_equal(np.asarray(matched), exp_pos >= 0)
        exp_vals = np.where(exp_pos >= 0, rv[np.clip(exp_pos, 0, None)], 7)
        np.testing.assert_array_equal(np.asarray(vals), exp_vals)

    def test_duplicate_right_keys_pick_latest_backward(self):
        # three right rows share key 10: backward must match the LAST
        # original occurrence (stable sort order), as pandas merge_asof does
        rk = np.array([10, 5, 10, 10, 20], np.uint32)
        rv = np.arange(5, dtype=np.uint32)
        lk = np.array([10, 15, 4], np.uint32)
        vals, matched, pos = rst.join_asof(
            jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv)
        )
        np.testing.assert_array_equal(np.asarray(pos), [3, 3, -1])
        np.testing.assert_array_equal(np.asarray(matched), [True, True, False])
        np.testing.assert_array_equal(np.asarray(vals), [3, 3, 0])

    def test_forward_picks_earliest_tie(self):
        rk = np.array([10, 10, 30], np.uint32)
        rv = np.array([100, 101, 102], np.uint32)
        vals, matched, pos = rst.join_asof(
            jnp.asarray(np.array([7, 11, 31], np.uint32)),
            jnp.asarray(rk), jnp.asarray(rv), direction="forward",
        )
        np.testing.assert_array_equal(np.asarray(pos), [0, 2, -1])
        np.testing.assert_array_equal(np.asarray(vals), [100, 102, 0])

    @pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
    def test_tolerance_int(self, rng, direction):
        lk = rng.integers(0, 1000, size=N_L, dtype=np.uint32)
        rk = rng.integers(0, 1000, size=97, dtype=np.uint32)
        rv = np.arange(97, dtype=np.uint32)
        tol = 3
        vals, matched, pos = rst.join_asof(
            jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv),
            direction=direction, tolerance=tol,
        )
        exp_pos = _np_asof(lk, rk, direction)
        d = np.abs(
            lk.astype(np.int64) - rk[np.clip(exp_pos, 0, None)].astype(np.int64)
        )
        exp_m = (exp_pos >= 0) & (d <= tol)
        np.testing.assert_array_equal(np.asarray(matched), exp_m)
        np.testing.assert_array_equal(
            np.asarray(pos), np.where(exp_m, exp_pos, -1)
        )

    def test_float_nearest_and_tolerance(self, rng):
        lk = (rng.random(513) * 100 - 50).astype(np.float32)
        rk = (rng.random(257) * 100 - 50).astype(np.float32)
        rv = np.arange(257, dtype=np.uint32)
        vals, matched, pos = rst.join_asof(
            jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv),
            direction="nearest",
        )
        # oracle: nearest by absolute difference, ties backward
        for i in rng.choice(513, size=40, replace=False):
            d = np.abs(rk.astype(np.float64) - np.float64(lk[i]))
            best = d.min()
            assert np.abs(np.float64(rk[int(np.asarray(pos)[i])])
                          - np.float64(lk[i])) == best
        _, m2, _ = rst.join_asof(
            jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv),
            direction="nearest", tolerance=0.5,
        )
        exp = np.array(
            [np.abs(rk.astype(np.float64) - np.float64(q)).min() <= 0.5
             for q in lk]
        )
        np.testing.assert_array_equal(np.asarray(m2), exp)

    def test_u64_backward_forward(self, rng):
        lk = rng.integers(0, 1 << 63, size=301, dtype=np.uint64)
        rk = rng.integers(0, 1 << 63, size=157, dtype=np.uint64)
        rv = np.arange(157, dtype=np.uint32)
        for direction in ("backward", "forward"):
            _, _, pos = rst.join_asof(
                jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv),
                direction=direction,
            )
            np.testing.assert_array_equal(
                np.asarray(pos), _np_asof(lk, rk, direction)
            )

    def test_empty_right(self):
        lk = jnp.asarray(np.array([1, 2], np.uint32))
        vals, matched, pos = rst.join_asof(
            lk, jnp.zeros((0,), jnp.uint32), jnp.zeros((0,), jnp.uint32),
            fill=9,
        )
        np.testing.assert_array_equal(np.asarray(vals), [9, 9])
        assert not np.asarray(matched).any()
        np.testing.assert_array_equal(np.asarray(pos), [-1, -1])

    def test_errors(self):
        u = jnp.zeros((4,), jnp.uint32)
        u64 = jnp.zeros((4,), jnp.uint64)
        with pytest.raises(ValueError, match="direction"):
            rst.join_asof(u, u, u, direction="sideways")
        with pytest.raises(ValueError, match="dtype"):
            rst.join_asof(u, u.astype(jnp.int32), u)
        with pytest.raises(ValueError, match="32-bit"):
            rst.join_asof(u64, u64, u, direction="nearest")
        with pytest.raises(ValueError, match="mismatch"):
            rst.join_asof(u, u, jnp.zeros((3,), jnp.uint32))
        with pytest.raises(ValueError, match="tolerance"):
            rst.join_asof(u, u, u, tolerance=-1)


class TestSetOps:
    @pytest.mark.parametrize("dtype", [np.uint32, np.int16, np.float32])
    def test_matches_numpy(self, rng, dtype):
        if dtype == np.float32:
            a = (rng.random(N_L) * 40).round().astype(dtype)
            b = (rng.random(N_R) * 40).round().astype(dtype)
        else:
            a = rng.integers(0, 50, size=N_L, dtype=dtype)
            b = rng.integers(25, 75, size=N_R, dtype=dtype)
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        for fn, oracle in [
            (rst.set_union, np.union1d(a, b)),
            (rst.set_intersect, np.intersect1d(a, b)),
            (rst.set_difference, np.setdiff1d(a, b)),
        ]:
            keys, cnt = fn(aj, bj)
            got = np.asarray(keys)[: int(cnt)]
            np.testing.assert_array_equal(got, oracle)

    def test_composite_columns(self, rng):
        a0 = rng.integers(0, 4, size=500, dtype=np.uint32)
        a1 = rng.integers(0, 4, size=500, dtype=np.int32)
        b0 = rng.integers(0, 4, size=300, dtype=np.uint32)
        b1 = rng.integers(0, 4, size=300, dtype=np.int32)
        sa = set(zip(a0.tolist(), a1.tolist()))
        sb = set(zip(b0.tolist(), b1.tolist()))
        cases = [
            (rst.set_union, sorted(sa | sb)),
            (rst.set_intersect, sorted(sa & sb)),
            (rst.set_difference, sorted(sa - sb)),
        ]
        for fn, expect in cases:
            keys, cnt = fn(
                [jnp.asarray(a0), jnp.asarray(a1)],
                [jnp.asarray(b0), jnp.asarray(b1)],
            )
            got = list(zip(
                np.asarray(keys[0])[: int(cnt)].tolist(),
                np.asarray(keys[1])[: int(cnt)].tolist(),
            ))
            assert got == expect

    def test_empty_sides(self):
        e = jnp.zeros((0,), jnp.uint32)
        x = jnp.asarray(np.array([3, 1, 3], np.uint32))
        keys, cnt = rst.set_union(e, x)
        np.testing.assert_array_equal(np.asarray(keys)[: int(cnt)], [1, 3])
        keys, cnt = rst.set_intersect(x, e)
        assert int(cnt) == 0
        keys, cnt = rst.set_difference(x, e)
        np.testing.assert_array_equal(np.asarray(keys)[: int(cnt)], [1, 3])
        keys, cnt = rst.set_union(e, e)
        assert int(cnt) == 0

    def test_errors(self):
        u = jnp.zeros((4,), jnp.uint32)
        with pytest.raises(ValueError, match="dtype"):
            rst.set_union(u, u.astype(jnp.int32))
        with pytest.raises(ValueError, match="column"):
            rst.set_union([u], [u, u])


class TestQuantiles:
    @pytest.mark.parametrize("method", ["lower", "higher"])
    @pytest.mark.parametrize("dtype", [np.uint32, np.int8, np.float32,
                                       np.uint64])
    def test_matches_numpy(self, rng, method, dtype):
        if dtype == np.float32:
            x = (rng.random(N_R) * 100 - 50).astype(dtype)
        else:
            info = np.iinfo(dtype)
            x = rng.integers(info.min, info.max, size=N_R, endpoint=True,
                             dtype=dtype)
        qs = [0.0, 0.01, 0.25, 0.5, 0.9, 1.0]
        got = np.asarray(rst.quantiles(jnp.asarray(x), qs, method=method))
        # order-statistic oracle (numpy's discrete index conventions, but
        # exact for uint64 where np.quantile would round through float64)
        rnd = np.floor if method == "lower" else np.ceil
        ranks = [int(rnd(q * (len(x) - 1))) for q in qs]
        exp = np.sort(x)[ranks]
        np.testing.assert_array_equal(got, exp)

    def test_nearest_hand_case(self):
        x = jnp.asarray(np.array([40, 10, 30, 20], np.uint32))
        got = np.asarray(rst.quantiles(x, [0.0, 0.4, 1.0], method="nearest"))
        # virtual index 0.4*(4-1) = 1.2 -> rank 1
        np.testing.assert_array_equal(got, [10, 20, 40])

    def test_nan_total_order(self):
        x = jnp.asarray(np.array([1.0, np.nan, -np.inf, 2.0], np.float32))
        got = np.asarray(rst.quantiles(x, [0.0, 1.0]))
        assert got[0] == -np.inf and np.isnan(got[1])

    def test_errors(self):
        x = jnp.zeros((4,), jnp.uint32)
        with pytest.raises(ValueError, match="method"):
            rst.quantiles(x, [0.5], method="linear")
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            rst.quantiles(x, [1.5])
        with pytest.raises(ValueError, match="empty"):
            rst.quantiles(jnp.zeros((0,), jnp.uint32), [0.5])


class TestAsofRightValid:
    def test_masked_rows_never_match(self, rng):
        import radix_sort_tpu as rst

        n_l, n_r = 200, 150
        lk = rng.integers(0, 1000, n_l).astype(np.int32)
        rk = rng.integers(0, 1000, n_r).astype(np.int32)
        rv = rng.integers(0, 2**31, n_r).astype(np.uint32)
        valid = rng.random(n_r) < 0.5
        for direction in ("backward", "forward", "nearest"):
            got_v, got_m, got_p = rst.join_asof(
                jnp.asarray(lk), jnp.asarray(rk), jnp.asarray(rv),
                direction=direction,
                right_valid=jnp.asarray(valid),
            )
            # oracle: the plain op on the valid subset, positions remapped
            sub_idx = np.flatnonzero(valid)
            ref_v, ref_m, ref_p = rst.join_asof(
                jnp.asarray(lk), jnp.asarray(rk[valid]),
                jnp.asarray(rv[valid]), direction=direction,
            )
            np.testing.assert_array_equal(np.asarray(got_m),
                                          np.asarray(ref_m), err_msg=direction)
            np.testing.assert_array_equal(np.asarray(got_v),
                                          np.asarray(ref_v), err_msg=direction)
            ref_pos = np.where(np.asarray(ref_m),
                               sub_idx[np.clip(np.asarray(ref_p), 0,
                                               len(sub_idx) - 1)], -1)
            np.testing.assert_array_equal(np.asarray(got_p), ref_pos,
                                          err_msg=direction)

    def test_all_invalid_matches_nothing(self, rng):
        import radix_sort_tpu as rst

        lk = jnp.asarray(np.array([5, 10], np.int32))
        rk = jnp.asarray(np.array([1, 7], np.int32))
        rv = jnp.asarray(np.array([11, 77], np.uint32))
        v, m, p = rst.join_asof(
            lk, rk, rv, right_valid=jnp.zeros(2, jnp.bool_), fill=99,
        )
        assert not np.asarray(m).any()
        np.testing.assert_array_equal(np.asarray(v), [99, 99])
        np.testing.assert_array_equal(np.asarray(p), [-1, -1])

    def test_tolerance_with_validity(self, rng):
        import radix_sort_tpu as rst

        lk = jnp.asarray(np.array([10, 20, 30], np.int32))
        rk = jnp.asarray(np.array([9, 19, 29], np.int32))
        rv = jnp.asarray(np.array([1, 2, 3], np.uint32))
        valid = jnp.asarray(np.array([True, False, True]))
        v, m, p = rst.join_asof(lk, rk, rv, direction="backward",
                                tolerance=1, right_valid=valid)
        # query 20's nearest valid backward row is rk=9, distance 11 > tol
        np.testing.assert_array_equal(np.asarray(m), [True, False, True])
        np.testing.assert_array_equal(np.asarray(v), [1, 0, 3])
