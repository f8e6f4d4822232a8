"""DistTable (the MPP relation facade) vs the single-chip Table on the
8-virtual-device CPU mesh.

Every verb must agree with the single-chip facade (itself oracle-tested in
test_table.py) on the same logical relation: ``DistTable.from_table(t)``
carries t's rows at the same global positions, so row-shaped verbs compare
via ``to_numpy()`` (valid rows in global order) and reduction-shaped verbs
return replicated Tables compared directly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import radix_sort_tpu as rst
from radix_sort_tpu.parallel.dist_table import DistTable
from radix_sort_tpu.table import Table

N = 8 * 128


def _mesh():
    return Mesh(np.array(jax.devices()), ("x",))


@pytest.fixture
def tbl(rng):
    return {
        "k": rng.integers(0, 13, N).astype(np.uint32),
        "v": rng.integers(-500, 500, N).astype(np.int32),
        "w": rng.standard_normal(N).astype(np.float32),
    }


def _pair(tbl, frac_valid=0.7):
    """The same padded relation as a Table and a DistTable."""
    t = Table({k: jnp.asarray(v) for k, v in tbl.items()},
              jnp.int32(int(N * frac_valid)))
    d = DistTable.from_table(t, _mesh())
    return t, d


def _rows(np_dict):
    names = sorted(np_dict)
    return sorted(zip(*[np_dict[n].tolist() for n in names]))


class TestBasics:
    def test_from_table_counts_and_roundtrip(self, tbl):
        t, d = _pair(tbl, 0.6)
        cnts = np.asarray(d.counts)
        assert cnts.sum() == int(N * 0.6)
        got, want = d.to_numpy(), t.to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_fully_valid(self, tbl):
        t = Table({k: jnp.asarray(v) for k, v in tbl.items()})
        d = DistTable.from_table(t, _mesh())
        assert d.counts is None
        assert int(d.total_count()) == N
        got = d.to_numpy()
        np.testing.assert_array_equal(got["k"], tbl["k"])

    def test_projection(self, tbl):
        _, d = _pair(tbl)
        assert d.select("k", "v").column_names == ["k", "v"]
        assert d.drop("w").column_names == ["k", "v"]
        assert d.rename({"k": "key"}).column_names == ["key", "v", "w"]
        d2 = d.with_columns(z=jnp.arange(N, dtype=jnp.int32))
        assert "z" in d2

    def test_to_table(self, tbl):
        t, d = _pair(tbl, 0.5)
        back = d.to_table()
        got, want = back.to_numpy(), t.to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_validation(self, tbl):
        mesh = _mesh()
        with pytest.raises(ValueError, match="divide"):
            DistTable({"k": jnp.zeros(N + 1, jnp.int32)}, mesh)
        with pytest.raises(ValueError, match="counts"):
            DistTable({"k": jnp.zeros(N, jnp.int32)}, mesh,
                      jnp.zeros(3, jnp.int32))


class TestRowShaped:
    def test_filter(self, tbl):
        t, d = _pair(tbl)
        got = d.filter(lambda x: x["v"] > 0).to_numpy()
        want = t.filter(lambda x: x["v"] > 0).to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_sort_by(self, tbl):
        t, d = _pair(tbl)
        got = d.sort_by(["k", "v"], descending=[False, True]).to_numpy()
        want = t.sort_by(["k", "v"], descending=[False, True]).to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_sort_by_all_valid(self, tbl):
        t = Table({k: jnp.asarray(v) for k, v in tbl.items()})
        d = DistTable.from_table(t, _mesh())
        got = d.sort_by("v").to_numpy()
        want = t.sort_by("v").to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_window(self, tbl):
        t, d = _pair(tbl)
        ops = {"rn": "row_number", "s": ("sum", "v"),
               "prev": ("lag", "v", 1), "roll": ("rolling_sum", "v", 3, 1)}
        got = d.window(ops, partition_by="k", order_by="w").to_numpy()
        want = t.window(ops, partition_by="k", order_by="w").to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)

    def test_window_descending(self, tbl):
        t, d = _pair(tbl)
        ops = {"rn": "row_number", "cs": ("cumsum", "v")}
        got = d.window(ops, partition_by="k", order_by="w",
                       descending=True).to_numpy()
        want = t.window(ops, partition_by="k", order_by="w",
                        descending=True).to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)

    def test_sql_window_over_disttable(self, tbl):
        # the SQL frontend's OVER clause must compile onto the MPP window
        # plan when the registered relation is a DistTable
        from radix_sort_tpu.sql import sql

        t, d = _pair(tbl)
        q = ("SELECT k, ROW_NUMBER() OVER (PARTITION BY k ORDER BY w) "
             "AS rn, SUM(v) OVER (PARTITION BY k ORDER BY w) AS rs "
             "FROM r")
        got = sql(q, {"r": d}).collect().to_numpy()
        want = sql(q, {"r": t}).collect().to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)

    def test_sql_group_window_union_over_disttable(self, tbl):
        # round-3 frontend features over the MPP facade: inline-aggregate
        # HAVING, window over GROUP BY, and a UNION compound — identical
        # results whether the registered relation is Table or DistTable
        from radix_sort_tpu.sql import sql

        t, d = _pair(tbl)
        q = ("SELECT k, SUM(v) AS total, "
             "RANK() OVER (ORDER BY SUM(v) DESC) AS rnk "
             "FROM r GROUP BY k HAVING COUNT(*) > 1 ORDER BY k")
        got = sql(q, {"r": d}, max_groups=64).collect().to_numpy()
        want = sql(q, {"r": t}, max_groups=64).collect().to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)
        qu = ("SELECT k FROM r WHERE v > 250 UNION "
              "SELECT k FROM r WHERE v < -250")
        gu = sql(qu, {"r": d}, max_unique=256).collect().to_numpy()
        wu = sql(qu, {"r": t}, max_unique=256).collect().to_numpy()
        np.testing.assert_array_equal(np.sort(gu["k"]), np.sort(wu["k"]))

    def test_limit_offset(self, tbl):
        from radix_sort_tpu.sql import sql

        t, d = _pair(tbl)
        # ORDER BY + LIMIT OFFSET fuses to distributed top_k + head slice
        q = "SELECT k, v FROM r ORDER BY v LIMIT 9 OFFSET 4"
        got = sql(q, {"r": d}).collect().to_numpy()
        want = sql(q, {"r": t}).collect().to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)
        # plain LIMIT (no ORDER BY) over a DistTable: shard-major row order
        # == the Table's global row order
        q2 = "SELECT k FROM r LIMIT 6 OFFSET 2"
        g2 = sql(q2, {"r": d}).collect().to_numpy()
        w2 = sql(q2, {"r": t}).collect().to_numpy()
        np.testing.assert_array_equal(g2["k"], w2["k"])

    def test_unnest(self, tbl):
        t, d = _pair(tbl, 0.5)
        t = t.with_columns(c=jnp.asarray(np.tile([2, 0, 1, 3], N // 4)))
        d = d.with_columns(c=jnp.asarray(np.tile([2, 0, 1, 3], N // 4)))
        dd, ovf = d.unnest("c", total_size_per_shard=N)
        tt, tovf = t.unnest("c", total_size=8 * N)
        assert not bool(ovf) and not bool(tovf)
        got, want = dd.to_numpy(), tt.to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_unnest_overflow_flag(self, tbl):
        _, d = _pair(tbl, 1.0)
        big = jnp.full((N,), 100, jnp.int32)
        d = d.with_columns(c=big)
        _, ovf = d.unnest("c", total_size_per_shard=8)
        assert bool(ovf)

    def test_concat(self, tbl, rng):
        t, d = _pair(tbl, 0.5)
        t2, d2 = _pair(
            {k: rng.permutation(v) for k, v in tbl.items()}, 0.25
        )
        got = d.concat(d2).to_numpy()
        want = t.concat(t2).to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])
        assert int(d.concat(d2).total_count()) == int(N * 0.75)

    @pytest.mark.parametrize("how", ["inner", "left", "semi", "anti",
                                     "right", "full"])
    def test_join(self, rng, how):
        # wider key space (0..97) keeps per-shard pair counts bounded
        lt = {
            "k": rng.integers(0, 97, N).astype(np.uint32),
            "v": rng.integers(-500, 500, N).astype(np.int32),
        }
        t, d = _pair(lt)
        rt = Table({
            "k": jnp.asarray(rng.integers(0, 97, N).astype(np.uint32)),
            "p": jnp.asarray(rng.integers(0, 9999, N).astype(np.int32)),
        }, jnp.int32(N // 2))
        rd = DistTable.from_table(rt, _mesh())
        dj, dovf = d.join(rd, "k", capacity_per_shard=N * 4, how=how,
                          exchange_capacity_factor=4.0)
        tj, tovf = t.join(rt, "k", capacity=8 * N * 4, how=how)
        assert not bool(dovf) and not bool(tovf)
        got, want = dj.to_numpy(), tj.to_numpy()
        assert sorted(got) == sorted(want)  # same columns
        assert _rows(got) == _rows(want)    # same row multiset

    def test_join_asof(self, tbl):
        t, d = _pair(tbl)
        rt = Table({
            "k": jnp.asarray(np.arange(N, dtype=np.uint32) * 3),
            "px": jnp.asarray(np.arange(N, dtype=np.int32) + 1000),
        })
        rd = DistTable.from_table(rt, _mesh())
        got = d.join_asof(rd, "k", direction="backward",
                          matched_col="m").to_numpy()
        want = t.join_asof(rt, "k", direction="backward",
                           matched_col="m").to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)

    def test_join_asof_needs_valid_right(self, tbl):
        _, d = _pair(tbl)
        with pytest.raises(ValueError, match="fully-valid"):
            d.join_asof(d, "k")


class TestReductionShaped:
    def test_aggregate(self, tbl):
        t, d = _pair(tbl)
        aggs = {"s": ("sum", "v"), "m": ("median", "v"),
                "am": ("argmin", "v"), "sd": ("std", "w"),
                "n": "count"}
        got = d.aggregate("k", aggs, max_groups=64,
                          exchange_capacity_factor=4.0).to_numpy()
        want = t.aggregate("k", aggs).to_numpy()
        for n in ("k", "s", "m", "am", "n"):
            np.testing.assert_array_equal(got[n], want[n], err_msg=n)
        np.testing.assert_allclose(got["sd"], want["sd"], rtol=1e-4,
                                   atol=1e-5)

    def test_distinct(self, tbl):
        t, d = _pair(tbl)
        got = d.distinct("k", max_unique=64).to_numpy()
        want = t.distinct("k").to_numpy()
        np.testing.assert_array_equal(got["k"], want["k"])

    def test_top_k(self, tbl):
        t, d = _pair(tbl)
        got = d.top_k(10, "v").to_numpy()
        want = t.top_k(10, "v").to_numpy()
        for n in want:
            np.testing.assert_array_equal(got[n], want[n])

    def test_quantiles(self, tbl):
        t, d = _pair(tbl)
        qs = [0.0, 0.25, 0.5, 1.0]
        np.testing.assert_array_equal(
            np.asarray(d.quantiles("v", qs)),
            np.asarray(t.quantiles("v", qs)),
        )
        # fully-valid path
        tf = Table({k: jnp.asarray(v) for k, v in tbl.items()})
        df = DistTable.from_table(tf, _mesh())
        np.testing.assert_array_equal(
            np.asarray(df.quantiles("v", qs)),
            np.asarray(tf.quantiles("v", qs)),
        )

    def test_set_ops(self, tbl, rng):
        t, d = _pair(tbl)
        t2, d2 = _pair(
            {k: rng.permutation(v) for k, v in tbl.items()}, 0.4
        )
        for op in ("union", "intersect", "difference"):
            got = getattr(d, op)(d2, "k", max_unique=64).to_numpy()
            want = getattr(t, op)(t2, "k").to_numpy()
            np.testing.assert_array_equal(got["k"], want["k"], err_msg=op)


def test_jit_pipeline(tbl):
    """A composed pipeline (filter -> window -> aggregate) under one jit."""
    mesh = _mesh()

    def run(k, v, w):
        d = DistTable({"k": k, "v": v, "w": w}, mesh)
        d = d.filter(d["v"] > -200)
        d = d.window({"rn": "row_number"}, partition_by="k", order_by="w")
        out = d.aggregate("k", {"s": ("sum", "v"), "top": ("max", "rn")},
                          max_groups=64)
        return out["k"], out["s"], out["top"], out.count

    got = jax.jit(run)(jnp.asarray(tbl["k"]), jnp.asarray(tbl["v"]),
                       jnp.asarray(tbl["w"]))
    t = Table({k: jnp.asarray(v) for k, v in tbl.items()})
    t = t.filter(t["v"] > -200)
    t = t.window({"rn": "row_number"}, partition_by="k", order_by="w")
    want = t.aggregate("k", {"s": ("sum", "v"), "top": ("max", "rn")})
    cnt = int(got[3])
    assert cnt == int(want.count)
    np.testing.assert_array_equal(np.asarray(got[0])[:cnt],
                                  want.to_numpy()["k"])
    np.testing.assert_array_equal(np.asarray(got[1])[:cnt],
                                  want.to_numpy()["s"])
    np.testing.assert_array_equal(np.asarray(got[2])[:cnt],
                                  want.to_numpy()["top"])


class TestBroadcastLookupJoin:
    """how="lookup" against a replicated key-unique Table: membership +
    first-match rank gather per shard, one distributed filter, NO
    exchange — and the planner's eager-aggregation rewrite that builds
    on it must match the single-chip result exactly."""

    def test_facade_matches_oracle(self, tbl, rng):
        t, dt = _pair(tbl)
        nc = 13
        ct = Table({"k": np.arange(0, nc, 2, dtype=np.uint32),
                    "m": (np.arange(0, nc, 2) * 10).astype(np.int32)})
        out, dup = dt.join(ct, "k", how="lookup")
        assert not bool(dup)
        got = out.to_table().to_numpy()
        valid = int(np.asarray(t._count))
        kk = tbl["k"][:valid]
        keep = (kk % 2 == 0) & (kk < nc)
        assert len(got["k"]) == keep.sum()
        np.testing.assert_array_equal(got["m"], got["k"] * 10)
        np.testing.assert_array_equal(
            np.sort(got["w"]), np.sort(tbl["w"][:valid][keep])
        )
        # non-unique right side raises eagerly (never silent truncation)
        ct2 = Table({"k": np.array([0, 0, 2], np.uint32),
                     "m": np.zeros(3, np.int32)})
        with pytest.raises(TypeError, match="not key-unique"):
            dt.join(ct2, "k", how="lookup")
        # assume_unique (the planner's contract) keeps the traced flag
        _, dup2 = dt.join(ct2, "k", how="lookup", assume_unique=True)
        assert bool(dup2)

    def test_sql_eager_aggregation_matches_single_chip(self, tbl):
        t, dt = _pair(tbl)
        ccols = {"k": np.repeat(np.arange(32, dtype=np.uint32), 2),
                 "seg": np.tile(np.arange(32, dtype=np.int32) % 3, 2)}
        ct, dct = Table(ccols), DistTable(ccols, _mesh())
        q = ("SELECT k, SUM(v) AS s, COUNT(*) AS cnt, MAX(w) AS mx "
             "FROM l JOIN c USING (k) WHERE seg = 1 "
             "GROUP BY k ORDER BY k")
        a = rst.sql(q, {"l": t, "c": ct}).collect().to_numpy()
        b = rst.sql(q, {"l": dt, "c": dct}, max_groups=64,
                    capacity_per_shard=2048).collect().to_numpy()
        # the dist plan must have used the lookup join (rewrite fired)
        lt = rst.sql(q, {"l": dt, "c": dct}, max_groups=64,
                     capacity_per_shard=2048)
        assert "join[lookup on k]" in lt.explain()
        for key in a:
            av, bv = np.ma.getdata(a[key]), np.ma.getdata(b[key])
            if av.dtype.kind == "f":
                np.testing.assert_allclose(av, bv, rtol=1e-5,
                                           err_msg=key)
            else:
                np.testing.assert_array_equal(av, bv, err_msg=key)
