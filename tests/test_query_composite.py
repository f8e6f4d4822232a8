"""Multi-aggregation over one GROUP BY (hash_aggregate with parallel
values/agg lists): all reductions share a single stable key sort —
oracle-tested per group against numpy."""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst



class TestMultiAggregate:
    """hash_aggregate with parallel values/agg lists (one shared key sort)."""

    def test_mixed_aggs_vs_numpy(self, rng):
        n = 4096
        k = rng.integers(0, 50, n).astype(np.uint32)
        a = rng.integers(-100, 100, n).astype(np.int32)
        b = rng.standard_normal(n).astype(np.float32)
        uk, outs, cnt = rst.hash_aggregate(
            jnp.asarray(k),
            [jnp.asarray(a), jnp.asarray(b), jnp.asarray(a), jnp.asarray(b),
             jnp.asarray(a), jnp.asarray(b)],
            ["sum", "sum", "min", "max", "count", "mean"],
        )
        m = int(cnt)
        want_keys = np.unique(k)
        assert m == len(want_keys)
        np.testing.assert_array_equal(np.asarray(uk)[:m], want_keys)
        for g, key in enumerate(want_keys):
            sel = k == key
            assert np.asarray(outs[0])[g] == a[sel].sum(dtype=np.int32)
            np.testing.assert_allclose(
                np.asarray(outs[1])[g], b[sel].astype(np.float64).sum(),
                rtol=1e-5,
            )
            assert np.asarray(outs[2])[g] == a[sel].min()
            assert np.asarray(outs[3])[g] == b[sel].max()
            assert np.asarray(outs[4])[g] == sel.sum()
            np.testing.assert_allclose(
                np.asarray(outs[5])[g], b[sel].astype(np.float64).mean(),
                rtol=1e-5,
            )

    def test_composite_keys_multi_agg(self, rng):
        n = 2048
        ka = rng.integers(0, 4, n).astype(np.int8)
        kb = rng.integers(0, 5, n).astype(np.uint64)
        v = rng.integers(0, 1000, n).astype(np.uint32)
        uk, outs, cnt = rst.hash_aggregate(
            [jnp.asarray(ka), jnp.asarray(kb)],
            [jnp.asarray(v), jnp.asarray(v)],
            ["sum", "max"],
        )
        m = int(cnt)
        rec = np.rec.fromarrays((ka, kb))
        order = np.lexsort((kb, ka))
        srec = rec[order]
        firsts = np.concatenate([[True], srec[1:] != srec[:-1]])
        want = srec[firsts]
        assert m == len(want)
        np.testing.assert_array_equal(np.asarray(uk[0])[:m], want.f0)
        np.testing.assert_array_equal(np.asarray(uk[1])[:m], want.f1)
        for g in range(m):
            sel = (ka == want.f0[g]) & (kb == want.f1[g])
            assert np.asarray(outs[0])[g] == v[sel].sum(dtype=np.uint32)
            assert np.asarray(outs[1])[g] == v[sel].max()

    def test_matches_single_agg(self, rng):
        n = 1024
        k = rng.integers(0, 9, n).astype(np.uint16)
        v = rng.standard_normal(n).astype(np.float32)
        uk1, s1, c1 = rst.hash_aggregate(jnp.asarray(k), jnp.asarray(v), "sum")
        uk2, (s2,), c2 = rst.hash_aggregate(
            jnp.asarray(k), [jnp.asarray(v)], ["sum"]
        )
        assert int(c1) == int(c2)
        m = int(c1)
        np.testing.assert_array_equal(np.asarray(uk1)[:m], np.asarray(uk2)[:m])
        np.testing.assert_allclose(
            np.asarray(s1)[:m], np.asarray(s2)[:m], rtol=1e-6
        )

    def test_bad_args(self, rng):
        k = jnp.zeros(8, jnp.uint32)
        v = jnp.zeros(8, jnp.uint32)
        with pytest.raises(ValueError, match="BOTH"):
            rst.hash_aggregate(k, [v], "sum")
        with pytest.raises(ValueError, match="equal-length"):
            rst.hash_aggregate(k, [v], ["sum", "min"])
        with pytest.raises(ValueError, match="agg must be"):
            rst.hash_aggregate(k, [v], ["product"])

    def test_empty(self):
        k = jnp.zeros(0, jnp.uint32)
        v = jnp.zeros(0, jnp.float32)
        uk, outs, cnt = rst.hash_aggregate(k, [v, v], ["sum", "count"])
        assert int(cnt) == 0
        assert outs[0].dtype == jnp.float32 and outs[1].dtype == jnp.int32
