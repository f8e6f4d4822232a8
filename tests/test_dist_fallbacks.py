"""Exact overflow fallbacks for the distributed verbs.

Every distributed op must degrade EXACTLY under adversarial skew: when a
shard breaches its exchange buffer or group budget, the replicated
single-chip path runs (inside ``lax.cond``) and the result equals the
single-chip oracle — overflow is reported only when even the global
output capacity truncates. Adversaries per the reference's
duplicate-heavy StepUniform regime (/root/reference/src/distr.rs:78-106)
applied to join/group keys: all-equal keys and one-hot keys.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radix_sort_tpu.parallel import dist_query, runtime


@pytest.fixture
def mesh():
    return runtime.data_mesh()


def _join_rows(jk, jlv, jrv, cnts):
    cnts = np.asarray(cnts)
    nshards = len(cnts)
    per = np.asarray(jk).shape[0] // nshards
    rows = []
    for s in range(nshards):
        a = slice(s * per, s * per + cnts[s])
        rows += list(zip(np.asarray(jk)[a], np.asarray(jlv)[a],
                         np.asarray(jrv)[a]))
    return rows


class TestJoinSkewFallback:
    def test_all_equal_key_exact(self, rng, mesh):
        # every row shares one key: all rows route to ONE shard, its
        # exchange buffer overflows, and the replicated join must still
        # produce the exact cross product
        nl = nr = 8 * 16
        lk = np.full(nl, 7, np.uint32)
        rk = np.full(nr, 7, np.uint32)
        lv = rng.integers(0, 2**31, nl).astype(np.uint32)
        rv = rng.integers(0, 2**31, nr).astype(np.uint32)
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(lv),
            jnp.asarray(rk), jnp.asarray(rv))
        jk, jlv, jrv, cnts, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh, capacity_per_shard=nl * nr // 8)
        assert not bool(ovf)
        got = _join_rows(jk, jlv, jrv, cnts)
        ref = [(7, a, b) for a in lv for b in rv]
        assert sorted(got) == sorted(ref)

    def test_one_hot_key_exact(self, rng, mesh):
        # mostly-unique keys plus one hot key holding 1/2 of each side:
        # the hot shard overflows, the rest would not
        nl = nr = 8 * 32
        lk = rng.integers(100, 2**30, nl).astype(np.uint32)
        rk = lk[rng.permutation(nr)].copy()
        lk[: nl // 2] = 5
        rk[: nr // 2] = 5
        lv = np.arange(nl, dtype=np.uint32)
        rv = np.arange(nr, dtype=np.uint32) + 1_000_000
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(lv),
            jnp.asarray(rk), jnp.asarray(rv))
        jk, jlv, jrv, cnts, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh,
            capacity_per_shard=(nl // 2) * (nr // 2) // 8 + nl)
        assert not bool(ovf)
        got = _join_rows(jk, jlv, jrv, cnts)
        ref = [(k, a, b) for k, a in zip(lk, lv)
               for k2, b in zip(rk, rv) if k == k2]
        assert sorted(got) == sorted(ref)

    def test_full_outer_fallback_exact(self, rng, mesh):
        # all-equal hot key + unmatched rows on both sides, how="full"
        nl = nr = 8 * 16
        lk = np.full(nl, 9, np.uint32)
        rk = np.full(nr, 9, np.uint32)
        lk[:8] = np.arange(8, dtype=np.uint32)        # unmatched left
        rk[:8] = np.arange(50, 58, dtype=np.uint32)   # unmatched right
        lv = np.arange(1, nl + 1, dtype=np.uint32)
        rv = np.arange(1, nr + 1, dtype=np.uint32)
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(lv),
            jnp.asarray(rk), jnp.asarray(rv))
        jk, jlv, jrv, cnts, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh, how="full",
            capacity_per_shard=nl * nr // 8)
        assert not bool(ovf)
        got = _join_rows(jk, jlv, jrv, cnts)
        ref = [(k, a, b) for k, a in zip(lk, lv)
               for k2, b in zip(rk, rv) if k == k2]
        ref += [(k, a, 0) for k, a in zip(lk, lv) if (rk != k).all()]
        ref += [(k, 0, b) for k, b in zip(rk, rv) if (lk != k).all()]
        assert sorted(got) == sorted(ref)

    def test_truncation_still_flags(self, rng, mesh):
        # even the fallback cannot fit the cross product -> overflow True
        nl = nr = 8 * 16
        lk = np.full(nl, 3, np.uint32)
        lv = np.ones(nl, np.uint32)
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(lv),
            jnp.asarray(lk), jnp.asarray(lv))
        _, _, _, _, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh, capacity_per_shard=128)
        assert bool(ovf)


class TestAggregateFallback:
    def test_combinable_exact(self, rng, mesh):
        # 100 global groups, max_groups=16: every shard overflows locally
        # but the global result fits nshards*max_groups=128 -> exact
        n = 8 * 128
        keys = rng.integers(0, 100, n).astype(np.uint32)
        vals = rng.integers(0, 1000, n).astype(np.uint32)
        k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
        uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
            k, v, mesh, "sum", max_groups=16)
        assert not bool(ovf)
        ref_keys = np.unique(keys)
        assert int(cnt) == len(ref_keys)
        np.testing.assert_array_equal(np.asarray(uk)[:cnt], ref_keys)
        ref = np.array([vals[keys == u].sum() for u in ref_keys])
        np.testing.assert_array_equal(
            np.asarray(av)[:cnt].astype(np.int64), ref)

    def test_multi_agg_exact(self, rng, mesh):
        n = 8 * 128
        keys = rng.integers(0, 100, n).astype(np.uint32)
        vals = rng.integers(0, 1000, n).astype(np.int32)
        k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
        uk, outs, cnt, ovf = dist_query.distributed_hash_aggregate(
            k, [v, v, v], mesh, ["sum", "mean", "count"], max_groups=16)
        assert not bool(ovf)
        ref_keys = np.unique(keys)
        assert int(cnt) == len(ref_keys)
        s, m, c = (np.asarray(o)[:cnt] for o in outs)
        for i, u in enumerate(ref_keys):
            g = vals[keys == u]
            assert s[i] == g.sum()
            np.testing.assert_allclose(m[i], g.mean(), rtol=1e-6)
            assert c[i] == len(g)

    def test_holistic_skew_exact(self, rng, mesh):
        # all-equal group key: the repartition plan routes every row to
        # one shard, overflowing its receive buffer -> exact fallback
        n = 8 * 64
        keys = np.full(n, 42, np.uint32)
        vals = rng.integers(0, 10_000, n).astype(np.uint32)
        k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
        uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
            k, v, mesh, "median", max_groups=16)
        assert not bool(ovf)
        assert int(cnt) == 1
        assert np.asarray(uk)[0] == 42
        # engine median = the exact LOWER order statistic
        want = np.sort(vals)[(len(vals) - 1) // 2]
        assert np.asarray(av)[0] == want


class TestUniqueSetOpFallback:
    def test_unique_exact(self, rng, mesh):
        n = 8 * 128
        keys = rng.integers(0, 100, n).astype(np.uint32)
        k = runtime.shard_rows(mesh, jnp.asarray(keys))
        uk, cts, num, ovf = dist_query.distributed_unique(
            k, mesh, max_unique=16)
        assert not bool(ovf)
        ref_keys, ref_cts = np.unique(keys, return_counts=True)
        assert int(num) == len(ref_keys)
        np.testing.assert_array_equal(np.asarray(uk)[:num], ref_keys)
        np.testing.assert_array_equal(np.asarray(cts)[:num], ref_cts)

    def test_set_union_exact(self, rng, mesh):
        n = 8 * 32
        a = rng.integers(0, 48, n).astype(np.uint32)
        b = rng.integers(24, 72, n).astype(np.uint32)
        ad, bd = runtime.shard_rows(mesh, jnp.asarray(a), jnp.asarray(b))
        keys, cnt, ovf = dist_query.distributed_set_union(
            ad, bd, mesh, max_unique=8)
        assert not bool(ovf)
        ref = np.union1d(a, b)
        assert int(cnt) == len(ref)
        np.testing.assert_array_equal(np.asarray(keys)[:cnt], ref)
