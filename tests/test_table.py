"""Table facade: the named-column relation API over the operators —
oracle tests against plain numpy relational algebra, including the
validity-count (padded static shape) threading between chained ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu import Table

N = 1_024


@pytest.fixture
def tbl(rng):
    return {
        "k": rng.integers(0, 20, N).astype(np.uint32),
        "v": rng.integers(0, 1000, N).astype(np.int32),
        "w": (rng.random(N) * 10 - 5).astype(np.float32),
    }


def _t(cols):
    return Table({n: jnp.asarray(c) for n, c in cols.items()})


class TestBasics:
    def test_projection(self, tbl):
        t = _t(tbl)
        assert t.num_rows == N and t.count is None
        assert t.select("k", "v").column_names == ["k", "v"]
        assert t.drop("w").column_names == ["k", "v"]
        assert t.rename({"k": "key"}).column_names == ["key", "v", "w"]
        t2 = t.with_columns(z=jnp.arange(N, dtype=jnp.uint32))
        np.testing.assert_array_equal(t2.to_numpy()["z"], np.arange(N))

    def test_validation(self, tbl):
        with pytest.raises(ValueError, match="length"):
            Table({"a": jnp.zeros(4), "b": jnp.zeros(5)})
        with pytest.raises(ValueError, match="at least one"):
            Table({})
        t = _t(tbl)
        with pytest.raises(ValueError, match="length"):
            t.with_columns(bad=jnp.zeros(3))


class TestFilterSort:
    def test_filter_then_sort(self, tbl):
        t = _t(tbl).filter(lambda t: t["v"] > 500).sort_by("k")
        out = t.to_numpy()
        keep = tbl["v"] > 500
        order = np.argsort(tbl["k"][keep], kind="stable")
        np.testing.assert_array_equal(out["k"], tbl["k"][keep][order])
        np.testing.assert_array_equal(out["v"], tbl["v"][keep][order])
        np.testing.assert_array_equal(out["w"], tbl["w"][keep][order])

    def test_sort_mixed_directions(self, tbl):
        t = _t(tbl).sort_by(["k", "v"], descending=[False, True])
        out = t.to_numpy()
        order = np.lexsort((-tbl["v"].astype(np.int64), tbl["k"]))
        np.testing.assert_array_equal(out["v"], tbl["v"][order])

    def test_chained_filters(self, tbl):
        t = (_t(tbl).filter(lambda t: t["v"] > 300)
                     .filter(lambda t: t["k"] < 10))
        keep = (tbl["v"] > 300) & (tbl["k"] < 10)
        out = t.to_numpy()
        np.testing.assert_array_equal(out["v"], tbl["v"][keep])

    def test_limit_and_concat(self, tbl):
        t = _t(tbl).filter(lambda t: t["k"] < 5)
        a, b = t.limit(7), t.limit(3)
        c = a.concat(b).to_numpy()
        kept = tbl["k"][tbl["k"] < 5]
        np.testing.assert_array_equal(
            c["k"], np.concatenate([kept[:7], kept[:3]])
        )

    def test_limit_offset(self, tbl):
        t = _t(tbl).filter(lambda t: t["k"] < 5)
        kept = tbl["k"][tbl["k"] < 5]
        np.testing.assert_array_equal(t.limit(4, 6).to_numpy()["k"],
                                      kept[6:10])
        # offset beyond the valid count -> empty
        assert t.limit(4, len(kept) + 1).to_numpy()["k"].size == 0
        # k past the end clamps
        np.testing.assert_array_equal(
            t.limit(10 ** 6, 2).to_numpy()["k"], kept[2:]
        )

    def test_top_k_clamps(self, tbl):
        t = _t(tbl)
        out = t.top_k(10 ** 6, "v").to_numpy()
        np.testing.assert_array_equal(out["v"], np.sort(tbl["v"])[::-1])


class TestAggregate:
    def test_group_by_multi_agg(self, tbl):
        t = _t(tbl).aggregate(
            "k", {"total": ("sum", "v"), "n": "count", "lo": ("min", "w")}
        )
        out = t.to_numpy()
        uk = np.unique(tbl["k"])
        np.testing.assert_array_equal(out["k"], uk)
        for i, u in enumerate(uk):
            sel = tbl["k"] == u
            assert out["total"][i] == tbl["v"][sel].sum()
            assert out["n"][i] == sel.sum()
            assert out["lo"][i] == tbl["w"][sel].min()

    def test_global_aggregate(self, tbl):
        out = _t(tbl).aggregate(None, {"s": ("sum", "v")}).to_numpy()
        assert out["s"].shape == (1,)
        assert out["s"][0] == tbl["v"].sum()

    def test_aggregate_after_filter_excludes_padding(self, tbl):
        t = _t(tbl).filter(lambda t: t["v"] > 500)
        out = t.aggregate("k", {"n": "count"}).to_numpy()
        keep = tbl["v"] > 500
        uk, cnts = np.unique(tbl["k"][keep], return_counts=True)
        np.testing.assert_array_equal(out["k"], uk)
        np.testing.assert_array_equal(out["n"], cnts)

    def test_holistic_aggs(self, tbl):
        t = _t(tbl).aggregate(
            "k", {"med": ("median", "v"), "f": ("first", "v"),
                  "sd": ("std", "w"), "nd": ("count_distinct", "v")}
        )
        out = t.to_numpy()
        uk = np.unique(tbl["k"])
        np.testing.assert_array_equal(out["k"], uk)
        for i, u in enumerate(uk):
            grp = tbl["v"][tbl["k"] == u]
            assert out["med"][i] == np.sort(grp)[(len(grp) - 1) // 2]
            assert out["f"][i] == grp[0]
            assert out["nd"][i] == len(np.unique(grp))
            np.testing.assert_allclose(
                out["sd"][i],
                tbl["w"][tbl["k"] == u].astype(np.float64).std(),
                rtol=1e-4, atol=1e-5,
            )

    def test_distinct(self, tbl):
        t = _t(tbl).filter(lambda t: t["v"] > 900).distinct("k")
        np.testing.assert_array_equal(
            t.to_numpy()["k"], np.unique(tbl["k"][tbl["v"] > 900])
        )


class TestJoin:
    def test_inner_join_after_filter(self, rng, tbl):
        rt = {
            "k": rng.integers(0, 20, 64).astype(np.uint32),
            "name": rng.integers(100, 200, 64).astype(np.uint32),
        }
        lt = _t(tbl).filter(lambda t: t["v"] > 800)
        t, ovf = lt.join(_t(rt), on="k", capacity=1 << 14)
        assert not bool(ovf)
        out = t.to_numpy()
        # numpy oracle: nested-loop inner join, left-row-major
        keep = np.flatnonzero(tbl["v"] > 800)
        rorder = np.argsort(rt["k"], kind="stable")
        rows = []
        for li in keep:
            for rj in rorder:
                if tbl["k"][li] == rt["k"][rj]:
                    rows.append((tbl["k"][li], tbl["v"][li], tbl["w"][li],
                                 rt["name"][rj]))
        assert len(rows) == out["k"].shape[0]
        exp = np.array(rows, dtype=np.float64)
        np.testing.assert_array_equal(out["k"], exp[:, 0].astype(np.uint32))
        np.testing.assert_array_equal(out["v"], exp[:, 1].astype(np.int32))
        np.testing.assert_array_equal(out["name"],
                                      exp[:, 3].astype(np.uint32))

    def test_lookup_duplicate_right_degrades_to_exact_inner(self, rng):
        # a lookup join against a NON-key-unique right side must return
        # the exact inner join (runtime lax.cond degrade), never a
        # flagged first-match truncation
        lt = Table({"k": rng.integers(0, 5, 32).astype(np.uint32),
                    "a": np.arange(32, dtype=np.int32)})
        rt = Table({"k": np.array([0, 0, 1, 3, 3, 3], np.uint32),
                    "b": np.arange(6, dtype=np.int32)})
        out, ovf = lt.join(rt, "k", how="lookup", capacity=256)
        want, _ = lt.join(rt, "k", how="inner", capacity=256)
        got, exp = out.to_numpy(), want.to_numpy()
        assert not bool(np.asarray(ovf))
        for c in ("k", "a", "b"):
            np.testing.assert_array_equal(got[c], exp[c])
        # and a key-unique right side still takes the cheap path exactly
        rtu = Table({"k": np.arange(5, dtype=np.uint32),
                     "b": np.arange(5, dtype=np.int32) * 7})
        out_u, ovf_u = lt.join(rtu, "k", how="lookup")
        assert not bool(np.asarray(ovf_u))
        o = out_u.to_numpy()
        np.testing.assert_array_equal(o["b"], o["k"] * 7)

    def test_left_join_unmatched_zero(self):
        lt = Table({"k": jnp.asarray([1, 2, 3], jnp.uint32),
                    "v": jnp.asarray([10, 20, 30], jnp.int32)})
        rt = Table({"k": jnp.asarray([2], jnp.uint32),
                    "u": jnp.asarray([7], jnp.int32)})
        t, ovf = lt.join(rt, on="k", how="left", capacity=8)
        out = t.to_numpy()
        np.testing.assert_array_equal(out["k"], [1, 2, 3])
        np.testing.assert_array_equal(out["u"], [0, 7, 0])

    def test_semi_anti(self, tbl):
        rt = Table({"k": jnp.asarray(np.arange(10, dtype=np.uint32))})
        lt = _t(tbl).filter(lambda t: t["v"] > 500)
        keep = tbl["v"] > 500
        semi, _ = lt.join(rt, on="k", how="semi", capacity=N)
        anti, _ = lt.join(rt, on="k", how="anti", capacity=N)
        np.testing.assert_array_equal(
            semi.to_numpy()["v"], tbl["v"][keep & (tbl["k"] < 10)]
        )
        np.testing.assert_array_equal(
            anti.to_numpy()["v"], tbl["v"][keep & (tbl["k"] >= 10)]
        )
        assert "name" not in semi.column_names

    def test_right_join_unmatched_zero(self):
        lt = Table({"k": jnp.asarray([2], jnp.uint32),
                    "v": jnp.asarray([20], jnp.int32)})
        rt = Table({"k": jnp.asarray([1, 2, 3], jnp.uint32),
                    "u": jnp.asarray([10, 7, 30], jnp.int32)})
        t, ovf = lt.join(rt, on="k", how="right", capacity=8)
        out = t.to_numpy()
        np.testing.assert_array_equal(out["k"], [1, 2, 3])
        np.testing.assert_array_equal(out["u"], [10, 7, 30])
        np.testing.assert_array_equal(out["v"], [0, 20, 0])

    def test_full_join_both_sides(self):
        lt = Table({"k": jnp.asarray([1, 2], jnp.uint32),
                    "v": jnp.asarray([10, 20], jnp.int32)})
        rt = Table({"k": jnp.asarray([2, 3], jnp.uint32),
                    "u": jnp.asarray([7, 9], jnp.int32)})
        t, ovf = lt.join(rt, on="k", how="full", capacity=8)
        out = t.to_numpy()
        np.testing.assert_array_equal(out["k"], [1, 2, 3])
        np.testing.assert_array_equal(out["v"], [10, 20, 0])
        np.testing.assert_array_equal(out["u"], [0, 7, 9])

    def test_full_join_padding_never_emits(self, tbl, rng):
        # filtered (padded) tables on both sides: padding rows must not
        # appear as phantom unmatched rows under full outer join
        rt_cols = {
            "k": rng.integers(0, 30, 128).astype(np.uint32),
            "u": rng.integers(0, 100, 128).astype(np.int32),
        }
        lt = _t(tbl).filter(lambda t: t["v"] > 800)
        rt = _t(rt_cols).filter(lambda t: t["u"] > 50)
        t, ovf = lt.join(rt, on="k", how="full", capacity=1 << 14)
        assert not bool(ovf)
        out = t.to_numpy()
        lkeep = tbl["v"] > 800
        rkeep = rt_cols["u"] > 50
        lk, rk = tbl["k"][lkeep], rt_cols["k"][rkeep]
        n_pairs = sum(
            (rk == k).sum() if (rk == k).any() else 1 for k in lk
        )
        n_unmatched_r = (~np.isin(rk, lk)).sum()
        assert out["k"].shape[0] == n_pairs + n_unmatched_r
        # every unmatched-right row carries zeros in the left columns
        tail = out["k"][n_pairs:]
        assert not np.isin(tail, lk).any()

    def test_name_collision_suffix(self):
        lt = Table({"k": jnp.asarray([1], jnp.uint32),
                    "v": jnp.asarray([10], jnp.int32)})
        rt = Table({"k": jnp.asarray([1], jnp.uint32),
                    "v": jnp.asarray([99], jnp.int32)})
        t, _ = lt.join(rt, on="k", capacity=4)
        out = t.to_numpy()
        assert out["v"][0] == 10 and out["v_r"][0] == 99


class TestWindowTopK:
    def test_window_after_filter(self, tbl):
        t = _t(tbl).filter(lambda t: t["v"] > 500).window(
            {"rn": "row_number", "s": ("sum", "v")},
            partition_by="k", order_by="v",
        )
        out = t.to_numpy()
        keep = tbl["v"] > 500
        k, v = tbl["k"][keep], tbl["v"][keep]
        for u in np.unique(k):
            sel = k == u
            assert (np.sort(out["rn"][sel]) == np.arange(1, sel.sum() + 1)).all()
            np.testing.assert_array_equal(out["s"][sel], v[sel].sum())

    def test_top_k_after_filter(self, tbl):
        t = _t(tbl).filter(lambda t: t["k"] < 10).top_k(5, "v")
        out = t.to_numpy()
        keep = tbl["k"] < 10
        exp = np.sort(tbl["v"][keep])[::-1][:5]
        np.testing.assert_array_equal(out["v"], exp)

    def test_quantiles_after_filter(self, tbl):
        t = _t(tbl).filter(lambda t: t["k"] < 10)
        got = np.asarray(t.quantiles("v", [0.0, 0.5, 1.0]))
        v = np.sort(tbl["v"][tbl["k"] < 10])
        exp = v[[0, int(np.floor(0.5 * (len(v) - 1))), len(v) - 1]]
        np.testing.assert_array_equal(got, exp)


class TestWindowParamOps:
    def test_ntile_rolling_through_facade(self, tbl):
        t = _t(tbl).window(
            {"nt": ("ntile", 4), "rs": ("rolling_sum", "v", 2),
             "pr": "percent_rank"},
            partition_by="k", order_by="v",
        )
        out = t.to_numpy()
        ref = rst.window(
            [("ntile", 4), ("rolling_sum", jnp.asarray(tbl["v"]), 2),
             "percent_rank"],
            partition_by=jnp.asarray(tbl["k"]),
            order_by=jnp.asarray(tbl["v"]),
        )
        np.testing.assert_array_equal(out["nt"], np.asarray(ref[0]))
        np.testing.assert_array_equal(out["rs"], np.asarray(ref[1]))
        np.testing.assert_allclose(out["pr"], np.asarray(ref[2]))


class TestJit:
    def test_pipeline_is_jittable(self, tbl):
        """The whole chained pipeline traces as ONE jitted function: counts
        stay on device, no host round trips."""

        @jax.jit
        def pipeline(k, v, w):
            t = (Table({"k": k, "v": v, "w": w})
                 .filter(lambda t: t["v"] > 500)
                 .aggregate("k", {"total": ("sum", "v"), "n": "count"}))
            return t["k"], t["total"], t["n"], t.count

        uk, tot, n_, cnt = pipeline(*(jnp.asarray(tbl[c]) for c in "kvw"))
        cnt = int(cnt)
        keep = tbl["v"] > 500
        uk_np, cnts = np.unique(tbl["k"][keep], return_counts=True)
        assert cnt == len(uk_np)
        np.testing.assert_array_equal(np.asarray(uk)[:cnt], uk_np)
        np.testing.assert_array_equal(np.asarray(n_)[:cnt], cnts)


class TestAsofAndSetOps:
    def test_join_asof_with_padding(self, rng):
        trades = Table({
            "t": jnp.asarray([3, 8, 15, 22], jnp.int32),
            "qty": jnp.asarray([1, 2, 3, 4], jnp.int32),
        })
        quotes_all = Table({
            "t": jnp.asarray([1, 5, 9, 14, 20], jnp.int32),
            "px": jnp.asarray([10, 50, 90, 140, 200], jnp.int32),
            "ok": jnp.asarray([1, 0, 1, 1, 0], jnp.int32),
        })
        quotes = quotes_all.filter(lambda t: t["ok"] == 1)  # px 10/90/140
        t = trades.join_asof(quotes.drop("ok"), "t",
                             matched_col="matched")
        out = t.to_numpy()
        np.testing.assert_array_equal(out["t"], [3, 8, 15, 22])
        # backward against valid quotes {1:10, 9:90, 14:140}
        np.testing.assert_array_equal(out["px"], [10, 10, 140, 140])
        assert out["matched"].all()

    def test_join_asof_unmatched_zero(self):
        lt = Table({"t": jnp.asarray([1, 9], jnp.int32)})
        rt = Table({"t": jnp.asarray([5], jnp.int32),
                    "px": jnp.asarray([55], jnp.int32)})
        t = lt.join_asof(rt, "t", matched_col="m")
        out = t.to_numpy()
        np.testing.assert_array_equal(out["px"], [0, 55])
        np.testing.assert_array_equal(out["m"], [False, True])

    def test_unnest(self, rng):
        t = Table({
            "k": jnp.asarray(np.array([7, 8, 9, 10], np.uint32)),
            "c": jnp.asarray(np.array([2, 0, 3, 5], np.int32)),
        }, jnp.int32(3))  # row 10/5 is padding -> emits nothing
        out, ovf = t.unnest("c", total_size=8)
        assert not bool(ovf)
        assert int(out.count) == 5
        np.testing.assert_array_equal(
            out.to_numpy()["k"], [7, 7, 9, 9, 9]
        )
        # overflow: truncated prefix exact, flag set
        out2, ovf2 = t.unnest("c", total_size=3)
        assert bool(ovf2)
        np.testing.assert_array_equal(out2.to_numpy()["k"], [7, 7, 9])

    def test_set_ops_with_padding(self, tbl, rng):
        a = _t(tbl).filter(lambda t: t["v"] > 600)
        b = _t(tbl).filter(lambda t: t["v"] < 400)
        ka = np.unique(tbl["k"][tbl["v"] > 600])
        kb = np.unique(tbl["k"][tbl["v"] < 400])
        got_u = a.union(b, "k").to_numpy()["k"]
        got_i = a.intersect(b, "k").to_numpy()["k"]
        got_d = a.difference(b, "k").to_numpy()["k"]
        np.testing.assert_array_equal(got_u, np.union1d(ka, kb))
        np.testing.assert_array_equal(got_i, np.intersect1d(ka, kb))
        np.testing.assert_array_equal(got_d, np.setdiff1d(ka, kb))


class TestAggregateSets:
    """Table.aggregate_sets: typed NULL keys, dictionary propagation,
    GROUPING indicators, holistic aggregates exact at every level."""

    def test_rollup_masks_and_dicts(self, rng):
        a = np.array(["p", "q"] * 8)
        b = rng.integers(0, 3, 16).astype(np.int32)
        v = rng.integers(0, 9, 16).astype(np.int32)
        t = Table({"a": a, "b": b, "v": v})
        out = t.aggregate_sets([["a", "b"], ["a"], []],
                               {"s": ("sum", "v"), "m": ("median", "v")},
                               grouping={"ga": "a", "gb": "b"})
        d = out.to_numpy()
        n_ab = len({(x, y) for x, y in zip(a, b)})
        assert len(d["s"]) == n_ab + 2 + 1
        # rolled-up rows: b is masked NULL, a keeps its dictionary
        bm = np.ma.getmaskarray(d["b"])
        assert bm[n_ab:].all() and not bm[:n_ab].any()
        np.testing.assert_array_equal(d["gb"][n_ab:], 1)
        # the grand-total row
        am = np.ma.getmaskarray(d["a"])
        assert am[-1] and d["ga"][-1] == 1
        assert int(np.ma.getdata(d["s"])[-1]) == int(v.sum())
        # holistic at the rolled level: median over ALL of a's rows
        med_p = int(np.median(np.sort(v[a == "p"])[: (a == "p").sum()]))
        got_p = int(np.ma.getdata(d["m"])[n_ab])
        assert got_p == med_p or abs(got_p - med_p) <= 1  # lower method

    def test_prefix_chain_matches_per_set_aggregates(self, rng):
        """The shared-sort chain path (all segment-computable aggs; one
        sort per chain via hash_aggregate_levels) must match the per-set
        fallback exactly — across NULL keys/values, a valid-prefix
        count, CUBE-shaped multi-chain sets, and duplicate sets."""
        n = 40
        a = np.array(["p", "q", "r"] * 14)[:n]
        b = rng.integers(0, 3, n).astype(np.int32)
        v = rng.integers(0, 9, n).astype(np.int32)
        f = rng.random(n).astype(np.float32)
        aggs = {"s": ("sum", "v"), "n": "count", "mn": ("min", "v"),
                "mx": ("max", "v"), "mu": ("mean", "f"),
                "sd": ("std", "f"), "av": ("any", "v"),
                "fs": ("sum", "f")}
        cases = [
            (Table({"a": a, "b": b, "v": v, "f": f}), aggs),
            (Table({"a": a, "b": b, "v": v, "f": f},
                   null_masks={"b": rng.random(n) < 0.3,
                               "v": rng.random(n) < 0.3}),
             {"s": ("sum", "v"), "n": ("count", "v"),
              "mn": ("min", "v"), "mx": ("max", "v"),
              "mu": ("mean", "f")}),
            (Table({"a": a, "b": b, "v": v, "f": f}, count=n - 11),
             aggs),
        ]
        set_lists = [
            [["a", "b"], ["a"], []],          # one rollup chain
            [["a", "b"], ["a"], ["b"], []],   # CUBE: two chains
            [["a"], ["a"], ["b"]],            # duplicates, no nesting
        ]
        for t, ag in cases:
            for sets in set_lists:
                grouping = {"ga": "a", "gb": "b"}
                new = t.aggregate_sets(sets, ag,
                                       grouping=grouping).to_numpy()
                # a (key,value)-sorted holistic forces the per-set path
                ag2 = {**ag, "zmed": ("median", "f")}
                old = t.aggregate_sets(sets, ag2,
                                       grouping=grouping).to_numpy()
                for k in new:
                    gm, om = (np.ma.getmaskarray(new[k]),
                              np.ma.getmaskarray(old[k]))
                    np.testing.assert_array_equal(gm, om, err_msg=k)
                    gd = np.ma.getdata(new[k])[~gm]
                    od = np.ma.getdata(old[k])[~gm]
                    if gd.dtype.kind == "f":
                        np.testing.assert_allclose(
                            gd, od, rtol=1e-5, atol=1e-5, err_msg=k)
                    else:
                        np.testing.assert_array_equal(gd, od, err_msg=k)

    def test_needs_a_set(self):
        t = Table({"v": jnp.arange(4)})
        with pytest.raises(ValueError, match="grouping set"):
            t.aggregate_sets([], {"n": "count"})

    def test_grouping_key_validated(self):
        t = Table({"a": jnp.arange(4), "v": jnp.arange(4)})
        with pytest.raises(ValueError, match="GROUPING"):
            t.aggregate_sets([["a"]], {"n": "count"},
                             grouping={"g": "v"})
