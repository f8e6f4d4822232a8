"""Composite (multi-column) key support in unique / hash_aggregate /
hash_join — the GROUP BY a, b / JOIN ON (a, b) surface, oracle-tested
against pandas-free numpy reference implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst

N = 3_001


def _cols(rng):
    a = rng.integers(0, 6, size=N).astype(np.int32)        # few distinct
    b = (rng.random(N) * 4).round().astype(np.float32)     # few distinct
    c = rng.integers(0, 3, size=N, dtype=np.uint64)        # 64-bit column
    return a, b, c


def _np_groups(cols):
    """Sorted distinct composite rows + inverse group index per row."""
    rec = np.rec.fromarrays(cols)
    order = np.lexsort(tuple(reversed(cols)))
    srec = rec[order]
    first = np.concatenate([[True], srec[1:] != srec[:-1]])
    ukeys = srec[first]
    gid = np.empty(len(rec), np.int64)
    gid[order] = np.cumsum(first) - 1
    return ukeys, gid


class TestUniqueMulti:
    def test_counts_and_order(self, rng):
        a, b, c = _cols(rng)
        uk, counts, num = rst.unique(
            [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)]
        )
        want_keys, gid = _np_groups((a, b, c))
        m = int(num)
        assert m == len(want_keys)
        got = [np.asarray(col)[:m] for col in uk]
        assert np.array_equal(got[0], want_keys.f0)
        assert np.array_equal(got[1], want_keys.f1)
        assert np.array_equal(got[2], want_keys.f2)
        want_counts = np.bincount(gid, minlength=m)
        assert np.array_equal(np.asarray(counts)[:m], want_counts)

    def test_empty_and_validation(self):
        uk, counts, num = rst.unique(
            [jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.uint8)]
        )
        assert int(num) == 0 and len(uk) == 2
        with pytest.raises(ValueError):
            rst.unique([])
        with pytest.raises(ValueError):
            rst.unique([jnp.zeros(3, jnp.int32), jnp.zeros(4, jnp.int32)])


class TestAggregateMulti:
    @pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "mean"])
    def test_vs_oracle(self, rng, agg):
        a, b, c = _cols(rng)
        vals = rng.integers(0, 1000, size=N).astype(np.int32)
        uk, av, cnt = rst.hash_aggregate(
            [jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)],
            jnp.asarray(vals), agg,
        )
        want_keys, gid = _np_groups((a, b, c))
        m = int(cnt)
        assert m == len(want_keys)
        got_k = [np.asarray(col)[:m] for col in uk]
        assert np.array_equal(got_k[0], want_keys.f0)
        assert np.array_equal(got_k[1], want_keys.f1)
        assert np.array_equal(got_k[2], want_keys.f2)
        per_group = [vals[gid == g] for g in range(m)]
        if agg == "sum":
            want = np.array([g.sum() for g in per_group], np.int32)
        elif agg == "count":
            want = np.array([len(g) for g in per_group], np.int32)
        elif agg == "min":
            want = np.array([g.min() for g in per_group], np.int32)
        elif agg == "max":
            want = np.array([g.max() for g in per_group], np.int32)
        else:
            want = np.array([g.astype(np.float64).mean() for g in per_group])
        got_a = np.asarray(av)[:m]
        if agg == "mean":
            np.testing.assert_allclose(got_a, want, rtol=1e-6)
        else:
            assert np.array_equal(got_a, want)

    def test_float_sum_accuracy(self, rng):
        a = rng.integers(0, 50, size=N).astype(np.uint16)
        b = rng.integers(0, 2, size=N).astype(np.uint8)
        vals = rng.random(N).astype(np.float32)
        uk, sums, cnt = rst.hash_aggregate(
            [jnp.asarray(a), jnp.asarray(b)], jnp.asarray(vals), "sum"
        )
        want_keys, gid = _np_groups((a, b))
        m = int(cnt)
        want = np.array(
            [vals[gid == g].astype(np.float64).sum() for g in range(m)]
        )
        np.testing.assert_allclose(np.asarray(sums)[:m], want, rtol=1e-5)


class TestJoinMulti:
    def _sides(self, rng, n_l=400, n_r=600):
        la = rng.integers(0, 5, size=n_l).astype(np.int32)
        lb = rng.integers(0, 4, size=n_l, dtype=np.uint64)
        lv = np.arange(n_l, dtype=np.uint32)
        ra = rng.integers(0, 5, size=n_r).astype(np.int32)
        rb = rng.integers(0, 4, size=n_r, dtype=np.uint64)
        rv = np.arange(n_r, dtype=np.uint32) + 10_000
        return (la, lb, lv), (ra, rb, rv)

    @staticmethod
    def _np_join(left, right, how):
        la, lb, lv = left
        ra, rb, rv = right
        rorder = np.lexsort((np.arange(len(ra)), rb, ra))  # stable by key
        rows = []
        for i in range(len(la)):
            matches = [
                j for j in rorder if ra[j] == la[i] and rb[j] == lb[i]
            ]
            if how == "inner":
                rows += [(la[i], lb[i], lv[i], rv[j]) for j in matches]
            elif how == "left":
                rows += ([(la[i], lb[i], lv[i], rv[j]) for j in matches]
                         or [(la[i], lb[i], lv[i], 0)])
            elif how == "semi" and matches:
                rows.append((la[i], lb[i], lv[i], 0))
            elif how == "anti" and not matches:
                rows.append((la[i], lb[i], lv[i], 0))
        return rows

    @pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
    def test_vs_oracle(self, rng, how):
        left, right = self._sides(rng)
        cap = 60_000
        keys, olv, orv, cnt, ovf = rst.hash_join(
            [jnp.asarray(left[0]), jnp.asarray(left[1])],
            jnp.asarray(left[2]),
            [jnp.asarray(right[0]), jnp.asarray(right[1])],
            jnp.asarray(right[2]),
            capacity=cap, how=how,
        )
        want = self._np_join(left, right, how)
        m = int(cnt)
        assert not bool(ovf)
        assert m == len(want)
        got = list(zip(
            np.asarray(keys[0])[:m].tolist(),
            np.asarray(keys[1])[:m].tolist(),
            np.asarray(olv)[:m].tolist(),
            np.asarray(orv)[:m].tolist(),
        ))
        assert got == [(int(a), int(b), int(v), int(w)) for a, b, v, w in want]

    def test_validation(self, rng):
        k32 = jnp.zeros(4, jnp.int32)
        k8 = jnp.zeros(4, jnp.uint8)
        v = jnp.zeros(4, jnp.uint32)
        with pytest.raises(ValueError):
            rst.hash_join([k32], v, k32, v, capacity=8)   # mixed shapes
        with pytest.raises(ValueError):
            rst.hash_join([k32], v, [k8], v, capacity=8)  # dtype mismatch
        with pytest.raises(ValueError):
            rst.hash_join([k32, k8], v, [k32], v, capacity=8)  # count

    def test_empty_sides(self):
        e32 = jnp.zeros((0,), jnp.int32)
        ev = jnp.zeros((0,), jnp.uint32)
        k = jnp.asarray(np.array([1, 2], np.int32))
        v = jnp.asarray(np.array([7, 8], np.uint32))
        keys, olv, orv, cnt, ovf = rst.hash_join(
            [k], v, [e32], ev, capacity=8, how="anti"
        )
        assert int(cnt) == 2
        assert np.asarray(keys[0])[:2].tolist() == [1, 2]
        keys, _, _, cnt, _ = rst.hash_join(
            [e32], ev, [k], v, capacity=8, how="inner"
        )
        assert int(cnt) == 0 and len(keys) == 1
