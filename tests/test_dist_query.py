"""Distributed aggregate tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radix_sort_tpu.parallel import dist_query, runtime


@pytest.fixture
def mesh():
    return runtime.data_mesh()


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "any", "all"])
def test_matches_single_chip(rng, mesh, agg):
    n = 8 * 1024
    keys = rng.integers(0, 37, n).astype(np.uint32)
    vals = rng.integers(0, 1000, n).astype(np.uint32)  # zeros: any/all vary
    k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
    uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
        k, v, mesh, agg, max_groups=64
    )
    assert not bool(ovf)
    cnt = int(cnt)
    ref_keys = np.unique(keys)
    assert cnt == len(ref_keys)
    np.testing.assert_array_equal(np.asarray(uk)[:cnt], ref_keys)
    fns = {"sum": np.sum, "count": len, "min": np.min, "max": np.max,
           "any": lambda g: (g != 0).any(), "all": lambda g: (g != 0).all()}
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


class TestDistributedFilter:
    def test_matches_local_filter(self, rng, mesh):
        n = 8 * 512
        x = rng.integers(0, 2**32, n, dtype=np.uint32)
        m = rng.random(n) < 0.4
        xs, ms = runtime.shard_rows(mesh, jnp.asarray(x), jnp.asarray(m))
        xc, cnts = dist_query.distributed_filter(ms, xs, mesh=mesh)
        cnts = np.asarray(cnts)
        nshards = len(jax.devices())
        per = n // nshards
        got = np.concatenate([
            np.asarray(xc)[s * per : s * per + cnts[s]] for s in range(nshards)
        ])
        np.testing.assert_array_equal(got, x[m])


class TestDistributedHashJoin:
    def test_matches_single_chip_join(self, rng, mesh):
        from radix_sort_tpu.ops import query

        nl = nr = 8 * 256
        lk = rng.integers(0, 200, nl).astype(np.uint32)
        lv = rng.integers(0, 2**31, nl).astype(np.uint32)
        rk = rng.integers(0, 200, nr).astype(np.uint32)
        rv = rng.integers(0, 2**31, nr).astype(np.uint32)
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), jnp.asarray(rv)
        )
        jk, jlv, jrv, cnts, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh, capacity_per_shard=nl * 8
        )
        assert not bool(ovf)
        cnts = np.asarray(cnts)
        nshards = len(jax.devices())
        per = np.asarray(jk).shape[0] // nshards
        trips = []
        for s in range(nshards):
            a = slice(s * per, s * per + cnts[s])
            trips += list(zip(np.asarray(jk)[a], np.asarray(jlv)[a], np.asarray(jrv)[a]))
        # oracle: multiset of matching triples
        ref = []
        for i in range(nl):
            for j in range(nr):
                if lk[i] == rk[j]:
                    ref.append((lk[i], lv[i], rv[j]))
        assert sorted(trips) == sorted(ref)

    def test_skewed_keys(self, rng, mesh):
        # heavy duplicate keys: shared-splitter routing must still match all
        nl = nr = 8 * 128
        lk = (rng.integers(0, 4, nl) * 1000).astype(np.uint32)
        rk = (rng.integers(0, 4, nr) * 1000).astype(np.uint32)
        v = np.ones(nl, np.uint32)
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(v), jnp.asarray(rk), jnp.asarray(v)
        )
        jk, _, _, cnts, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh,
            capacity_per_shard=nl * nr // 2,  # duplicate explosion
            exchange_capacity_factor=10.0,
        )
        expected = sum(int((lk == k).sum()) * int((rk == k).sum()) for k in np.unique(lk))
        assert not bool(ovf)
        assert int(np.asarray(cnts).sum()) == expected

    @pytest.mark.parametrize("how", ["left", "semi", "anti", "right", "full"])
    def test_hows_match_single_chip(self, rng, mesh, how):
        from radix_sort_tpu.ops import query

        nl = nr = 8 * 128
        # key range chosen so some left keys have no right match
        lk = rng.integers(0, 300, nl).astype(np.uint32)
        lv = rng.integers(0, 2**31, nl).astype(np.uint32)
        rk = rng.integers(0, 150, nr).astype(np.uint32)
        rv = rng.integers(0, 2**31, nr).astype(np.uint32)
        lkj, lvj, rkj, rvj = runtime.shard_rows(
            mesh, jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), jnp.asarray(rv)
        )
        # asymmetric key ranges (left keys >= 150 have no right rows) skew
        # the shared-splitter routing of the left side — provision for it
        jk, jlv, jrv, cnts, ovf = dist_query.distributed_hash_join(
            lkj, lvj, rkj, rvj, mesh, capacity_per_shard=nl * 8, how=how,
            exchange_capacity_factor=6.0,
        )
        assert not bool(ovf)
        cnts = np.asarray(cnts)
        nshards = len(jax.devices())
        per = np.asarray(jk).shape[0] // nshards
        trips = []
        for s in range(nshards):
            a = slice(s * per, s * per + cnts[s])
            trips += list(
                zip(np.asarray(jk)[a], np.asarray(jlv)[a], np.asarray(jrv)[a])
            )
        # oracle: the single-chip join with the same how
        sk, slv, srv, scnt, sovf = query.hash_join(
            jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk), jnp.asarray(rv),
            capacity=nl * 16, how=how,
        )
        assert not bool(sovf)
        scnt = int(scnt)
        ref = list(
            zip(np.asarray(sk)[:scnt], np.asarray(slv)[:scnt], np.asarray(srv)[:scnt])
        )
        assert sorted(trips) == sorted(ref)


class TestDistributedUnique:
    def test_matches_numpy(self, rng, mesh):
        n = 8 * 1024
        keys = rng.integers(0, 41, n).astype(np.int32)
        k = runtime.shard_rows(mesh, jnp.asarray(keys))
        uk, cts, num, ovf = dist_query.distributed_unique(
            k, mesh, max_unique=64
        )
        assert not bool(ovf)
        m = int(num)
        want_k, want_c = np.unique(keys, return_counts=True)
        assert m == len(want_k)
        np.testing.assert_array_equal(np.asarray(uk)[:m], want_k)
        np.testing.assert_array_equal(np.asarray(cts)[:m], want_c)

    def test_shard_local_distincts(self, rng, mesh):
        # keys partitioned so each shard sees disjoint values
        n = 8 * 1024
        keys = (np.arange(n) // 1024 * 100 + rng.integers(0, 3, n)).astype(
            np.uint32
        )
        k = runtime.shard_rows(mesh, jnp.asarray(keys))
        uk, cts, num, ovf = dist_query.distributed_unique(
            k, mesh, max_unique=8
        )
        assert not bool(ovf)
        m = int(num)
        want_k, want_c = np.unique(keys, return_counts=True)
        assert m == len(want_k)
        np.testing.assert_array_equal(np.asarray(uk)[:m], want_k)
        np.testing.assert_array_equal(np.asarray(cts)[:m], want_c)

    def test_overflow(self, rng, mesh):
        n = 8 * 256
        keys = np.arange(n, dtype=np.uint32)
        k = runtime.shard_rows(mesh, jnp.asarray(keys))
        _, _, _, ovf = dist_query.distributed_unique(k, mesh, max_unique=16)
        assert bool(ovf)


class TestDistributedTopK:
    @pytest.mark.parametrize("largest", [True, False])
    def test_matches_single_chip(self, rng, mesh, largest):
        import radix_sort_tpu as rst

        n = 8 * 1024
        keys = rng.integers(0, 200, n).astype(np.int32)  # heavy ties
        vals = np.arange(n, dtype=np.uint32)
        k, v = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
        kk = 100
        tk, tv = dist_query.distributed_top_k(
            k, kk, v, mesh=mesh, largest=largest
        )
        want_k, want_v = rst.top_k(
            jnp.asarray(keys), kk, jnp.asarray(vals), largest=largest
        )
        np.testing.assert_array_equal(np.asarray(tk), np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(tv), np.asarray(want_v))

    def test_k_larger_than_shard(self, rng, mesh):
        import radix_sort_tpu as rst

        n = 8 * 64
        keys = rng.integers(0, 1 << 30, n).astype(np.uint32)
        k = runtime.shard_rows(mesh, jnp.asarray(keys))
        kk = 200  # > 64 rows/shard: every shard contributes all rows
        (tk,) = dist_query.distributed_top_k(k, kk, mesh=mesh)
        (want,) = rst.top_k(jnp.asarray(keys), kk)
        np.testing.assert_array_equal(np.asarray(tk), np.asarray(want))

    def test_float_total_order(self, rng, mesh):
        import radix_sort_tpu as rst

        n = 8 * 128
        keys = (rng.random(n) * 2 - 1).astype(np.float32)
        keys[rng.integers(0, n, 4)] = [np.nan, np.inf, -np.inf, -0.0]
        k = runtime.shard_rows(mesh, jnp.asarray(keys))
        (tk,) = dist_query.distributed_top_k(k, 16, mesh=mesh)
        (want,) = rst.top_k(jnp.asarray(keys), 16)
        np.testing.assert_array_equal(
            np.asarray(tk).view(np.uint32), np.asarray(want).view(np.uint32)
        )


class TestDistributedMultiColumn:
    def _np_groups(self, cols):
        rec = np.rec.fromarrays(cols)
        order = np.lexsort(tuple(reversed(cols)))
        srec = rec[order]
        first = np.concatenate([[True], srec[1:] != srec[:-1]])
        gid = np.empty(len(rec), np.int64)
        gid[order] = np.cumsum(first) - 1
        return srec[first], gid

    def test_aggregate(self, rng, mesh):
        n = 8 * 512
        a = rng.integers(0, 5, n).astype(np.int32)
        b = rng.integers(0, 4, n, dtype=np.uint64)
        vals = rng.integers(0, 100, n).astype(np.uint32)
        ka, kb, v = runtime.shard_rows(
            mesh, jnp.asarray(a), jnp.asarray(b), jnp.asarray(vals)
        )
        uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
            [ka, kb], v, mesh, "sum", max_groups=32
        )
        assert not bool(ovf)
        m = int(cnt)
        want_keys, gid = self._np_groups((a, b))
        assert m == len(want_keys)
        np.testing.assert_array_equal(np.asarray(uk[0])[:m], want_keys.f0)
        np.testing.assert_array_equal(np.asarray(uk[1])[:m], want_keys.f1)
        want = np.array([vals[gid == g].sum() for g in range(m)], np.uint32)
        np.testing.assert_array_equal(np.asarray(av)[:m], want)

    def test_unique(self, rng, mesh):
        n = 8 * 512
        a = rng.integers(0, 6, n).astype(np.uint16)
        b = (rng.random(n) * 3).round().astype(np.float32)
        ka, kb = runtime.shard_rows(mesh, jnp.asarray(a), jnp.asarray(b))
        uk, cts, num, ovf = dist_query.distributed_unique(
            [ka, kb], mesh, max_unique=32
        )
        assert not bool(ovf)
        m = int(num)
        want_keys, gid = self._np_groups((a, b))
        assert m == len(want_keys)
        np.testing.assert_array_equal(np.asarray(uk[0])[:m], want_keys.f0)
        np.testing.assert_array_equal(np.asarray(uk[1])[:m], want_keys.f1)
        np.testing.assert_array_equal(
            np.asarray(cts)[:m], np.bincount(gid, minlength=m)
        )

    @pytest.mark.parametrize("how", ["inner", "semi", "anti"])
    def test_join(self, rng, mesh, how):
        n = 8 * 256
        la = rng.integers(0, 4, n).astype(np.int32)
        lb = rng.integers(0, 3, n, dtype=np.uint64)
        lv = np.arange(n, dtype=np.uint32)
        ra = rng.integers(0, 4, n).astype(np.int32)
        rb = rng.integers(0, 3, n, dtype=np.uint64)
        rv = np.arange(n, dtype=np.uint32) + 50_000
        sla, slb, slv, sra, srb, srv = runtime.shard_rows(
            mesh, *[jnp.asarray(x) for x in (la, lb, lv, ra, rb, rv)]
        )
        cap = 1 << 19
        keys, olv, orv, cnts, ovf = dist_query.distributed_hash_join(
            [sla, slb], slv, [sra, srb], srv, mesh,
            capacity_per_shard=cap, how=how,
        )
        assert not bool(ovf)
        # single-chip oracle
        import radix_sort_tpu as rst
        wk, wlv, wrv, wcnt, wovf = rst.hash_join(
            [jnp.asarray(la), jnp.asarray(lb)], jnp.asarray(lv),
            [jnp.asarray(ra), jnp.asarray(rb)], jnp.asarray(rv),
            capacity=8 * cap, how=how,
        )
        wm = int(wcnt)
        cnts = np.asarray(cnts)
        # collect per-shard valid prefixes
        got = []
        k0 = np.asarray(keys[0]).reshape(8, -1)
        k1 = np.asarray(keys[1]).reshape(8, -1)
        gl = np.asarray(olv).reshape(8, -1)
        gr = np.asarray(orv).reshape(8, -1)
        for s in range(8):
            c = int(cnts[s])
            got += list(zip(k0[s][:c].tolist(), k1[s][:c].tolist(),
                            gl[s][:c].tolist(), gr[s][:c].tolist()))
        want = list(zip(np.asarray(wk[0])[:wm].tolist(),
                        np.asarray(wk[1])[:wm].tolist(),
                        np.asarray(wlv)[:wm].tolist(),
                        np.asarray(wrv)[:wm].tolist()))
        assert sorted(got) == sorted(want)


class TestDistributedTopKComposite:
    def test_matches_single_chip(self, rng, mesh):
        import radix_sort_tpu as rst
        n = 8 * 512
        a = rng.integers(0, 4, n).astype(np.int32)
        b = rng.standard_normal(n).astype(np.float32)
        v = np.arange(n, dtype=np.uint32)
        sa, sb, sv = runtime.shard_rows(
            mesh, jnp.asarray(a), jnp.asarray(b), jnp.asarray(v)
        )
        for largest in (True, False):
            tk, tv = dist_query.distributed_top_k(
                [sa, sb], 37, sv, mesh=mesh, largest=largest
            )
            wk, wv = rst.top_k(
                [jnp.asarray(a), jnp.asarray(b)], 37, jnp.asarray(v),
                largest=largest,
            )
            np.testing.assert_array_equal(np.asarray(tk[0]), np.asarray(wk[0]))
            np.testing.assert_array_equal(
                np.asarray(tk[1]).view(np.uint32),
                np.asarray(wk[1]).view(np.uint32),
            )
            np.testing.assert_array_equal(np.asarray(tv), np.asarray(wv))


class TestDistributedMultiAggregate:
    def test_mixed_aggs(self, rng, mesh):
        n = 8 * 512
        k = rng.integers(0, 12, n).astype(np.uint32)
        a = rng.integers(0, 1000, n).astype(np.uint32)
        b = rng.standard_normal(n).astype(np.float32)
        sk, sa, sb = runtime.shard_rows(
            mesh, jnp.asarray(k), jnp.asarray(a), jnp.asarray(b)
        )
        uk, outs, cnt, ovf = dist_query.distributed_hash_aggregate(
            sk, [sa, sb, sa, sb], mesh, ["sum", "min", "count", "mean"],
            max_groups=32,
        )
        assert not bool(ovf)
        m = int(cnt)
        want_keys = np.unique(k)
        assert m == len(want_keys)
        np.testing.assert_array_equal(np.asarray(uk)[:m], want_keys)
        for g, key in enumerate(want_keys):
            sel = k == key
            assert np.asarray(outs[0])[g] == a[sel].sum(dtype=np.uint32)
            assert np.asarray(outs[1])[g] == b[sel].min()
            assert np.asarray(outs[2])[g] == sel.sum()
            np.testing.assert_allclose(
                np.asarray(outs[3])[g], b[sel].astype(np.float64).mean(),
                rtol=1e-5,
            )

    def test_composite_keys(self, rng, mesh):
        n = 8 * 256
        ka = rng.integers(0, 3, n).astype(np.int32)
        kb = rng.integers(0, 4, n).astype(np.uint16)
        v = rng.integers(0, 50, n).astype(np.int32)
        ska, skb, sv = runtime.shard_rows(
            mesh, jnp.asarray(ka), jnp.asarray(kb), jnp.asarray(v)
        )
        uk, outs, cnt, ovf = dist_query.distributed_hash_aggregate(
            [ska, skb], [sv, sv], mesh, ["max", "sum"], max_groups=16
        )
        assert not bool(ovf)
        m = int(cnt)
        for g in range(m):
            sel = (ka == np.asarray(uk[0])[g]) & (kb == np.asarray(uk[1])[g])
            assert sel.any()
            assert np.asarray(outs[0])[g] == v[sel].max()
            assert np.asarray(outs[1])[g] == v[sel].sum(dtype=np.int32)

    def test_bad_args(self, mesh):
        k = jnp.zeros(8 * 8, jnp.uint32)
        v = jnp.zeros(8 * 8, jnp.uint32)
        with pytest.raises(ValueError, match="BOTH"):
            dist_query.distributed_hash_aggregate(
                k, [v], mesh, "sum", max_groups=8
            )


class TestDistributedQuantiles:
    @pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32])
    def test_matches_single_chip(self, rng, mesh, dtype):
        n = 8 * 512
        if dtype == np.float32:
            x = (rng.random(n) * 100 - 50).astype(dtype)
        else:
            x = rng.integers(0, 1 << 30, size=n).astype(dtype)
        qs = [0.0, 0.1, 0.5, 0.99, 1.0]
        xd = runtime.shard_rows(mesh, jnp.asarray(x))
        got = np.asarray(dist_query.distributed_quantiles(xd, qs, mesh))
        exp = np.sort(x)[[int(np.floor(q * (n - 1))) for q in qs]]
        np.testing.assert_array_equal(got, exp)

    def test_duplicate_heavy(self, rng, mesh):
        # all-equal keys: the skew regime that used to overflow the
        # distributed exchange — quantiles must still resolve exactly
        n = 8 * 256
        x = np.full(n, 0xABCD1234, np.uint32)
        xd = runtime.shard_rows(mesh, jnp.asarray(x))
        got = np.asarray(
            dist_query.distributed_quantiles(xd, [0.0, 0.5, 1.0], mesh)
        )
        np.testing.assert_array_equal(got, [0xABCD1234] * 3)


class TestDistributedSetOps:
    @pytest.mark.parametrize("dtype", [np.uint32, np.int16])
    def test_matches_numpy(self, rng, mesh, dtype):
        n = 8 * 512
        a = rng.integers(0, 60, size=n).astype(dtype)
        b = rng.integers(30, 90, size=n).astype(dtype)
        ad, bd = runtime.shard_rows(mesh, jnp.asarray(a), jnp.asarray(b))
        for fn, oracle in [
            (dist_query.distributed_set_union, np.union1d(a, b)),
            (dist_query.distributed_set_intersect, np.intersect1d(a, b)),
            (dist_query.distributed_set_difference, np.setdiff1d(a, b)),
        ]:
            keys, cnt, ovf = fn(ad, bd, mesh, max_unique=128)
            assert not bool(ovf)
            np.testing.assert_array_equal(
                np.asarray(keys)[: int(cnt)], oracle
            )

    def test_composite_columns(self, rng, mesh):
        n = 8 * 128
        a0 = rng.integers(0, 5, size=n).astype(np.uint32)
        a1 = rng.integers(0, 5, size=n).astype(np.int32)
        b0 = rng.integers(2, 7, size=n).astype(np.uint32)
        b1 = rng.integers(2, 7, size=n).astype(np.int32)
        sa = set(zip(a0.tolist(), a1.tolist()))
        sb = set(zip(b0.tolist(), b1.tolist()))
        ad = runtime.shard_rows(mesh, jnp.asarray(a0), jnp.asarray(a1))
        bd = runtime.shard_rows(mesh, jnp.asarray(b0), jnp.asarray(b1))
        keys, cnt, ovf = dist_query.distributed_set_intersect(
            list(ad), list(bd), mesh, max_unique=64
        )
        assert not bool(ovf)
        got = list(zip(
            np.asarray(keys[0])[: int(cnt)].tolist(),
            np.asarray(keys[1])[: int(cnt)].tolist(),
        ))
        assert got == sorted(sa & sb)

    def test_overflow_flag(self, rng, mesh):
        n = 8 * 64
        a = np.arange(n, dtype=np.uint32)  # every row distinct
        b = np.arange(n, dtype=np.uint32)
        ad, bd = runtime.shard_rows(mesh, jnp.asarray(a), jnp.asarray(b))
        _, _, ovf = dist_query.distributed_set_union(
            ad, bd, mesh, max_unique=8
        )
        assert bool(ovf)


class TestDistributedHolisticAggregate:
    """first/last/median/var/std/count_distinct over the repartition
    (shuffle-aggregate) plan vs the single-chip aggregates."""

    @pytest.mark.parametrize(
        "agg", ["first", "last", "median", "var", "std", "count_distinct",
                "mode", "argmin", "argmax", "quantile:0.75"]
    )
    def test_matches_single_chip(self, rng, mesh, agg):
        from radix_sort_tpu.ops import query

        n = 8 * 256
        keys = rng.integers(0, 37, n).astype(np.uint32)
        vals = rng.integers(-100, 100, n).astype(np.int32)
        kj, vj = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
        uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
            kj, vj, mesh, agg, max_groups=64, exchange_capacity_factor=4.0,
        )
        suk, sav, scnt = query.hash_aggregate(
            jnp.asarray(keys), jnp.asarray(vals), agg
        )
        assert not bool(ovf)
        cnt = int(cnt)
        assert cnt == int(scnt)
        np.testing.assert_array_equal(
            np.asarray(uk)[:cnt], np.asarray(suk)[:cnt]
        )
        if agg in ("var", "std"):
            np.testing.assert_allclose(
                np.asarray(av)[:cnt], np.asarray(sav)[:cnt],
                rtol=1e-4, atol=1e-5,
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(av)[:cnt], np.asarray(sav)[:cnt]
            )

    def test_multi_agg_with_holistic_member(self, rng, mesh):
        from radix_sort_tpu.ops import query

        n = 8 * 256
        keys = rng.integers(0, 20, n).astype(np.uint32)
        v1 = rng.integers(0, 1000, n).astype(np.uint32)
        v2 = rng.integers(-50, 50, n).astype(np.int32)
        kj, v1j, v2j = runtime.shard_rows(
            mesh, jnp.asarray(keys), jnp.asarray(v1), jnp.asarray(v2)
        )
        uk, outs, cnt, ovf = dist_query.distributed_hash_aggregate(
            kj, [v1j, v2j, v2j], mesh, ["sum", "median", "first"],
            max_groups=64, exchange_capacity_factor=4.0,
        )
        suk, souts, scnt = query.hash_aggregate(
            jnp.asarray(keys),
            [jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(v2)],
            ["sum", "median", "first"],
        )
        assert not bool(ovf)
        cnt = int(cnt)
        assert cnt == int(scnt)
        np.testing.assert_array_equal(
            np.asarray(uk)[:cnt], np.asarray(suk)[:cnt]
        )
        for got, want in zip(outs, souts):
            np.testing.assert_array_equal(
                np.asarray(got)[:cnt], np.asarray(want)[:cnt]
            )

    def test_composite_keys(self, rng, mesh):
        from radix_sort_tpu.ops import query

        n = 8 * 256
        k1 = rng.integers(0, 3, n).astype(np.uint32)   # low-cardinality lead
        k2 = rng.integers(0, 11, n).astype(np.int32)
        vals = rng.integers(0, 100, n).astype(np.int32)
        k1j, k2j, vj = runtime.shard_rows(
            mesh, jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(vals)
        )
        uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
            [k1j, k2j], vj, mesh, "median", max_groups=64,
            exchange_capacity_factor=4.0,
        )
        suk, sav, scnt = query.hash_aggregate(
            [jnp.asarray(k1), jnp.asarray(k2)], jnp.asarray(vals), "median"
        )
        assert not bool(ovf)
        cnt = int(cnt)
        assert cnt == int(scnt)
        for g, w in zip(uk, suk):
            np.testing.assert_array_equal(np.asarray(g)[:cnt],
                                          np.asarray(w)[:cnt])
        np.testing.assert_array_equal(np.asarray(av)[:cnt],
                                      np.asarray(sav)[:cnt])

    def test_skew_overflow_exact_fallback(self, rng, mesh):
        # all-equal keys concentrate every row on one shard: the exchange
        # buffer (factor 1.0) cannot hold them — the exact replicated
        # fallback (round 3) must produce the correct result with
        # overflow=False, never a silent truncation
        n = 8 * 256
        keys = np.zeros(n, np.uint32)
        vals = rng.integers(0, 10, n).astype(np.int32)
        kj, vj = runtime.shard_rows(mesh, jnp.asarray(keys), jnp.asarray(vals))
        uk, av, cnt, ovf = dist_query.distributed_hash_aggregate(
            kj, vj, mesh, "median", max_groups=8,
            exchange_capacity_factor=1.0,
        )
        assert not bool(ovf)
        assert int(cnt) == 1
        assert np.asarray(uk)[0] == 0
        assert np.asarray(av)[0] == np.sort(vals)[(n - 1) // 2]
