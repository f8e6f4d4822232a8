"""Expression AST + lazy logical planner: Expr evaluation vs numpy,
lazy-vs-eager result equality over pipeline matrices, and structural
assertions that each optimizer pass fired (fusion node counts, pruned
source projections, dead-spec elimination) — the planner's contract is
"same result, fewer/narrower sort passes"."""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu import Table, col, lit, udf
from radix_sort_tpu import plan as P
from radix_sort_tpu.expr import where

N = 512


@pytest.fixture
def tbl(rng):
    return {
        "k": rng.integers(0, 16, N).astype(np.uint32),
        "v": rng.integers(0, 1000, N).astype(np.int32),
        "w": (rng.random(N) * 10 - 5).astype(np.float32),
        "g": rng.integers(0, 4, N).astype(np.uint32),
    }


def _t(cols):
    return Table({n: jnp.asarray(c) for n, c in cols.items()})


def _nodes(plan, kind):
    out = []
    stack = [plan]
    while stack:
        n = stack.pop()
        if isinstance(n, kind):
            out.append(n)
        stack.extend(c for _, c in n.children())
    return out


def _same(a: Table, b: Table):
    an, bn = a.to_numpy(), b.to_numpy()
    assert set(an) >= set(bn)
    for name in bn:
        np.testing.assert_array_equal(an[name], bn[name], err_msg=name)


class TestExpr:
    def test_arithmetic_comparison(self, tbl):
        t = _t(tbl)
        e = (col("v") * 2 + 1 - col("k").cast(np.int32)) % 7
        got = np.asarray(e.evaluate(t))
        want = (tbl["v"] * 2 + 1 - tbl["k"].astype(np.int32)) % 7
        np.testing.assert_array_equal(got, want)
        m = (col("v") > 500) & ~(col("k") == 3)
        np.testing.assert_array_equal(
            np.asarray(m.evaluate(t)), (tbl["v"] > 500) & ~(tbl["k"] == 3)
        )

    def test_where_abs_minmax_isin(self, tbl):
        t = _t(tbl)
        e = where(col("w") < 0, col("w").abs(), col("w").maximum(1.0))
        want = np.where(tbl["w"] < 0, np.abs(tbl["w"]),
                        np.maximum(tbl["w"], np.float32(1.0)))
        np.testing.assert_allclose(np.asarray(e.evaluate(t)), want)
        m = col("k").isin([1, 5, 9])
        np.testing.assert_array_equal(
            np.asarray(m.evaluate(t)), np.isin(tbl["k"], [1, 5, 9])
        )

    def test_columns_and_rename(self):
        e = (col("a") + col("b")) > col("c")
        assert e.columns == {"a", "b", "c"}
        r = e.rename({"a": "x"})
        assert r.columns == {"x", "b", "c"}
        u = udf(lambda a, b: a + b, ["a", "b"])
        assert u.columns == {"a", "b"}

    def test_udf_evaluates(self, tbl):
        t = _t(tbl)
        e = udf(lambda v, k: v + k.astype(jnp.int32), ["v", "k"])
        np.testing.assert_array_equal(
            np.asarray(e.evaluate(t)),
            tbl["v"] + tbl["k"].astype(np.int32),
        )

    def test_no_truth_value(self):
        with pytest.raises(TypeError, match="truth value"):
            bool(col("a") > 1)

    def test_repr_roundtrippable_labels(self):
        s = repr((col("a") * 2 > lit(5)) & ~col("b"))
        assert "col('a')" in s and "~" in s and ">" in s


class TestLazyMatchesEager:
    def test_filter_sort_select(self, tbl):
        t = _t(tbl)
        lazy = (t.lazy()
                .filter(col("v") > 200)
                .sort_by("k")
                .select("k", "v")
                .collect())
        eager = (t.filter(lambda tb: tb["v"] > 200)
                 .sort_by("k").select("k", "v"))
        _same(lazy, eager)

    def test_with_columns_window_aggregate(self, tbl):
        t = _t(tbl)
        lazy = (t.lazy()
                .with_columns(v2=col("v") * 2)
                .window({"rn": "row_number", "s": ("sum", "v2")},
                        partition_by="g", order_by="v")
                .aggregate("g", {"tot": ("sum", "v2"),
                                 "peak": ("max", "s"),
                                 "n": "count"})
                .collect())
        eager = (t.with_columns(v2=t["v"] * 2)
                 .window({"rn": "row_number",
                          "s": ("sum", jnp.asarray(tbl["v"]) * 2)},
                         partition_by="g", order_by="v"))
        eager = eager.aggregate("g", {"tot": ("sum", "v2"),
                                      "peak": ("max", "s"),
                                      "n": "count"})
        _same(lazy, eager)

    def test_join_and_overflow_flag(self, tbl, rng):
        t = _t(tbl)
        dim = Table({
            "k": jnp.asarray(np.arange(16, dtype=np.uint32)),
            "name": jnp.asarray(rng.integers(0, 99, 16).astype(np.uint32)),
        })
        lazy, ovf = (t.lazy()
                     .join(dim.lazy(), "k", capacity=2 * N)
                     .collect(return_overflow=True))
        eager, eovf = t.join(dim, "k", capacity=2 * N)
        assert bool(ovf) == bool(eovf)
        _same(lazy, eager)

    def test_set_ops_concat_limit(self, tbl):
        t = _t(tbl)
        a = t.lazy().filter(col("v") > 600)
        b = t.lazy().filter(col("v") < 400)
        lazy = a.concat(b).collect()
        eager = (t.filter(lambda tb: tb["v"] > 600)
                 .concat(t.filter(lambda tb: tb["v"] < 400)))
        _same(lazy, eager)
        li = a.intersect(b, subset=["k"]).sort_by("k").collect()
        ei = (t.filter(lambda tb: tb["v"] > 600)
              .intersect(t.filter(lambda tb: tb["v"] < 400), ["k"])
              .sort_by("k"))
        _same(li, ei)

    def test_unnest_distinct_topk(self, tbl):
        t = _t(tbl)
        lazy, ovf = (t.lazy()
                     .with_columns(c=col("k") % 3)
                     .unnest("c", total_size=2 * N)
                     .collect(return_overflow=True))
        eager, eovf = (t.with_columns(c=t["k"] % 3)
                       .unnest("c", total_size=2 * N))
        assert not bool(ovf) and not bool(eovf)
        _same(lazy, eager)
        _same(t.lazy().distinct(["k"]).collect(), t.distinct(["k"]))
        _same(t.lazy().top_k(7, "v").collect(), t.top_k(7, "v"))

    def test_join_asof(self, tbl, rng):
        t = _t(tbl)
        quotes = Table({
            "v": jnp.asarray(np.sort(
                rng.integers(0, 1000, 64).astype(np.int32))),
            "px": jnp.asarray(rng.integers(1, 500, 64).astype(np.uint32)),
        })
        lazy = (t.lazy()
                .join_asof(quotes.lazy(), "v", direction="backward",
                           matched_col="m")
                .collect())
        eager = t.join_asof(quotes, "v", direction="backward",
                            matched_col="m")
        _same(lazy, eager)

    def test_callable_and_array_predicates_still_work(self, tbl):
        t = _t(tbl)
        mask = jnp.asarray(tbl["v"] % 2 == 0)
        lazy = (t.lazy().filter(mask)
                .filter(lambda tb: tb["k"] < 8).collect())
        eager = (t.filter(mask).filter(lambda tb: tb["k"] < 8))
        _same(lazy, eager)


class TestOptimizerStructure:
    def test_filter_fusion(self, tbl):
        t = _t(tbl)
        lt = (t.lazy().filter(col("v") > 100).filter(col("k") < 9)
              .filter(col("v") < 900))
        opt = lt.optimized().plan
        assert len(_nodes(opt, P.Filter)) == 1
        _same(lt.collect(),
              t.filter(lambda tb: (tb["v"] > 100) & (tb["k"] < 9)
                       & (tb["v"] < 900)))

    def test_filter_pushes_through_sort_and_fuses(self, tbl):
        t = _t(tbl)
        lt = (t.lazy().filter(col("v") > 100).sort_by("k")
              .filter(col("v") < 900))
        opt = lt.optimized().plan
        assert len(_nodes(opt, P.Filter)) == 1
        # the surviving filter sits BELOW the sort
        (s,) = _nodes(opt, P.SortBy)
        assert _nodes(s, P.Filter)
        eager = (t.filter(lambda tb: tb["v"] > 100).sort_by("k")
                 .filter(lambda tb: tb["v"] < 900))
        _same(lt.collect(), eager)

    def test_filter_pushes_below_join(self, tbl):
        # single-side predicates sink into the join's inputs (fewer rows
        # reach the capacity-bounded join); key predicates of an inner
        # join sink into BOTH sides
        t = _t(tbl)
        rt = Table({"k": np.arange(13, dtype=np.uint32),
                    "w": np.arange(13, dtype=np.int32) * 10})
        lt = (t.lazy().join(rt.lazy(), ["k"], how="inner", capacity=4096)
              .filter(col("v") > 100).filter(col("w") > 20)
              .filter(col("k") < 9))
        opt = lt.optimized().plan
        (j,) = _nodes(opt, P.Join)
        # no filter remains above the join
        assert not isinstance(opt, P.Filter)
        assert _nodes(j.left, P.Filter) and _nodes(j.right, P.Filter)
        raw, _ = t.join(rt, ["k"], how="inner", capacity=4096)
        m = ((raw["v"] > 100) & (raw["w"] > 20) & (raw["k"] < 9))
        _same(lt.collect(), raw.filter(np.asarray(m)))

    def test_filter_stays_above_outer_joins(self, tbl):
        # a right-column predicate cannot sink through a LEFT join
        # (unmatched left rows zero-fill right columns)
        t = _t(tbl)
        rt = Table({"k": np.arange(5, dtype=np.uint32),
                    "z": np.arange(5, dtype=np.int32) - 2})
        lt = (t.lazy().join(rt.lazy(), ["k"], how="left", capacity=4096)
              .filter(col("z") > 0))
        opt = lt.optimized().plan
        assert isinstance(opt, P.Filter)
        raw, _ = t.join(rt, ["k"], how="left", capacity=4096)
        _same(lt.collect(), raw.filter(np.asarray(raw["z"] > 0)))

    def test_join_pushdown_suffix_collision(self, tbl):
        # right column colliding with a left name: the output-suffixed
        # predicate renames back to the right-side name when sinking
        t = _t(tbl)
        rt = Table({"k": np.arange(13, dtype=np.uint32),
                    "v": np.arange(13, dtype=np.int32) * 100})
        lt = (t.lazy().join(rt.lazy(), ["k"], how="inner", capacity=4096)
              .filter(col("v_r") > 500))
        opt = lt.optimized().plan
        (j,) = _nodes(opt, P.Join)
        assert _nodes(j.right, P.Filter) and not isinstance(opt, P.Filter)
        raw, _ = t.join(rt, ["k"], how="inner", capacity=4096)
        _same(lt.collect(), raw.filter(np.asarray(raw["v_r"] > 500)))

    def test_filter_pushes_below_window_on_partition_keys(self, tbl):
        # partition-key predicates drop whole partitions, so they commute
        # with every (partition-scoped) window op; other predicates stay
        t = _t(tbl)
        lt = (t.lazy().window({"rn": "row_number", "cs": ("cumsum", "v")},
                              partition_by="k", order_by="v")
              .filter(col("k") < 7))
        opt = lt.optimized().plan
        assert not isinstance(opt, P.Filter)
        ref = t.window({"rn": "row_number", "cs": ("cumsum", "v")},
                       partition_by="k", order_by="v")
        _same(lt.collect(), ref.filter(np.asarray(ref["k"] < 7)))
        lt2 = (t.lazy().window({"rn": "row_number"}, partition_by="k",
                               order_by="v").filter(col("v") > 100))
        assert isinstance(lt2.optimized().plan, P.Filter)

    def test_filter_pushes_below_concat(self, tbl):
        t = _t(tbl)
        t2 = Table({k: jnp.asarray(np.asarray(v)[:32])
                    for k, v in tbl.items()})
        lt = t.lazy().concat(t2.lazy()).filter(col("v") > 100)
        opt = lt.optimized().plan
        assert isinstance(opt, P.Concat)
        ref = t.concat(t2)
        _same(lt.collect(), ref.filter(np.asarray(ref["v"] > 100)))

    def test_sort_fusion_matches_two_pass_order(self, tbl):
        t = _t(tbl)
        lt = t.lazy().sort_by("v", descending=True).sort_by("k")
        opt = lt.optimized().plan
        sorts = _nodes(opt, P.SortBy)
        assert len(sorts) == 1
        assert sorts[0].by == ("k", "v")
        assert sorts[0].descending == (False, True)
        eager = t.sort_by("v", descending=True).sort_by("k")
        _same(lt.collect(), eager)

    def test_sort_fusion_dedups_columns(self, tbl):
        t = _t(tbl)
        lt = t.lazy().sort_by(["k", "v"]).sort_by("k", descending=True)
        opt = lt.optimized().plan
        (s,) = _nodes(opt, P.SortBy)
        assert s.by == ("k", "v") and s.descending == (True, False)
        _same(lt.collect(),
              t.sort_by(["k", "v"]).sort_by("k", descending=True))

    def test_window_fusion(self, tbl):
        t = _t(tbl)
        lt = (t.lazy()
              .window({"rn": "row_number"}, partition_by="g", order_by="v")
              .window({"s": ("sum", "v")}, partition_by="g", order_by="v"))
        opt = lt.optimized().plan
        ws = _nodes(opt, P.Window)
        assert len(ws) == 1 and len(ws[0].ops) == 2
        eager = (t.window({"rn": "row_number"}, partition_by="g",
                          order_by="v")
                 .window({"s": ("sum", "v")}, partition_by="g",
                         order_by="v"))
        _same(lt.collect(), eager)

    def test_window_fusion_blocked_by_dependency(self, tbl):
        t = _t(tbl)
        lt = (t.lazy()
              .window({"rn": "row_number"}, partition_by="g", order_by="v")
              .window({"s": ("sum", "rn")}, partition_by="g", order_by="v"))
        assert len(_nodes(lt.optimized().plan, P.Window)) == 2

    def test_sort_limit_becomes_topk(self, tbl):
        t = _t(tbl)
        lt = t.lazy().sort_by("v", descending=True).limit(17)
        opt = lt.optimized().plan
        assert len(_nodes(opt, P.TopK)) == 1
        assert not _nodes(opt, P.SortBy) and not _nodes(opt, P.Limit)
        _same(lt.collect(), t.sort_by("v", descending=True).limit(17))
        # ascending flavor
        lt2 = t.lazy().sort_by("v").limit(17)
        _same(lt2.collect(), t.sort_by("v").limit(17))

    def test_projection_pruning_at_source(self, tbl):
        t = _t(tbl)
        lt = (t.lazy().filter(col("v") > 100).sort_by("k")
              .select("k", "v"))
        opt = lt.optimized().plan
        sels = _nodes(opt, P.Select)
        # a projection sits directly on the source and drops w and g
        src_sel = [s for s in sels if isinstance(s.child, P.Source)]
        assert src_sel and set(src_sel[0].names) == {"k", "v"}
        _same(lt.collect(),
              t.filter(lambda tb: tb["v"] > 100).sort_by("k")
              .select("k", "v"))

    def test_dead_with_columns_and_window_specs_dropped(self, tbl):
        t = _t(tbl)
        lt = (t.lazy()
              .with_columns(dead=col("w") * 3, live=col("v") + 1)
              .window({"rn": "row_number", "unused": ("sum", "v")},
                      partition_by="g")
              .select("k", "live", "rn"))
        opt = lt.optimized().plan
        (wc,) = _nodes(opt, P.WithColumns)
        assert [n for n, _ in wc.exprs] == ["live"]
        (w,) = _nodes(opt, P.Window)
        assert [n for n, _ in w.ops] == ["rn"]
        eager = (t.with_columns(dead=t["w"] * 3, live=t["v"] + 1)
                 .window({"rn": "row_number",
                          "unused": ("sum", "v")}, partition_by="g")
                 .select("k", "live", "rn"))
        _same(lt.collect(), eager)

    def test_window_dropped_entirely_when_unused(self, tbl):
        t = _t(tbl)
        lt = (t.lazy()
              .window({"rn": "row_number"}, partition_by="g")
              .select("k", "v"))
        assert not _nodes(lt.optimized().plan, P.Window)
        _same(lt.collect(), t.select("k", "v"))

    def test_join_side_pruning_keeps_suffix_semantics(self, tbl, rng):
        t = _t(tbl)
        # right shares non-key name "v": output v_r must survive pruning
        dim = Table({
            "k": jnp.asarray(np.arange(16, dtype=np.uint32)),
            "v": jnp.asarray(rng.integers(0, 99, 16).astype(np.int32)),
            "extra": jnp.asarray(np.arange(16, dtype=np.uint32)),
        })
        lt = (t.lazy().join(dim.lazy(), "k", capacity=2 * N)
              .select("k", "v", "v_r"))
        opt = lt.optimized().plan
        (j,) = _nodes(opt, P.Join)
        right_schema = P._schema(j.right)
        assert "extra" not in right_schema
        eager, _ = t.join(dim, "k", capacity=2 * N)
        _same(lt.collect(), eager.select("k", "v", "v_r"))

    def test_aggregate_prunes_dead_outputs(self, tbl):
        t = _t(tbl)
        lt = (t.lazy()
              .aggregate("g", {"a": ("sum", "v"), "b": ("max", "w"),
                               "c": "count"})
              .select("g", "a"))
        opt = lt.optimized().plan
        (ag,) = _nodes(opt, P.Aggregate)
        assert [n for n, _ in ag.aggs] == ["a"]
        eager = t.aggregate("g", {"a": ("sum", "v")}).select("g", "a")
        _same(lt.collect(), eager)

    def test_rename_pushdown_remaps_predicate(self, tbl):
        t = _t(tbl)
        lt = (t.lazy().rename({"v": "value"})
              .filter(col("value") > 500).select("k", "value"))
        opt = lt.optimized().plan
        (f,) = _nodes(opt, P.Filter)
        assert isinstance(f.child, (P.Source, P.Select))
        assert f.pred.columns == {"v"}
        eager = (t.filter(lambda tb: tb["v"] > 500)
                 .rename({"v": "value"}).select("k", "value"))
        _same(lt.collect(), eager)

    def test_explain_renders(self, tbl):
        t = _t(tbl)
        s = (t.lazy().filter(col("v") > 1).sort_by("k")
             .select("k").explain())
        assert "sort_by" in s and "filter" in s and "source" in s

    def test_unoptimized_collect_matches(self, tbl):
        t = _t(tbl)
        lt = (t.lazy().filter(col("v") > 100).sort_by("k")
              .select("k", "v"))
        _same(lt.collect(optimize_plan=False), lt.collect())


class TestLazyDistTable:
    def test_dist_pipeline_matches_local(self, tbl, rng):
        from jax.sharding import Mesh
        import jax

        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        t = _t(tbl)
        dt = rst.DistTable.from_table(t, mesh)
        lazy = (dt.lazy()
                .filter(col("v") > 200)
                .with_columns(v2=col("v") * 2)
                .aggregate("g", {"tot": ("sum", "v2")}, max_groups=16)
                .collect())
        fw = t.filter(lambda tb: tb["v"] > 200)
        want = (fw.with_columns(v2=fw["v"] * 2)
                .aggregate("g", {"tot": ("sum", "v2")}))
        got, wantn = lazy.to_numpy(), want.to_numpy()
        for name in wantn:
            np.testing.assert_array_equal(got[name], wantn[name],
                                          err_msg=name)

    def test_dist_sorted_select_prunes(self, tbl):
        from jax.sharding import Mesh
        import jax

        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        t = _t(tbl)
        dt = rst.DistTable.from_table(t, mesh)
        lt = dt.lazy().sort_by("k").select("k", "v")
        opt = lt.optimized().plan
        src_sel = [s for s in _nodes(opt, P.Select)
                   if isinstance(s.child, P.Source)]
        assert src_sel and set(src_sel[0].names) == {"k", "v"}
        got = lt.collect().to_table().to_numpy()
        order = np.argsort(tbl["k"], kind="stable")
        np.testing.assert_array_equal(got["k"], tbl["k"][order])
        np.testing.assert_array_equal(got["v"], tbl["v"][order])


class TestEagerJoinAggregate:
    """aggregate-over-inner-join with group keys ⊇ join keys and
    left-only aggregations rewrites to a lookup join against the
    pre-aggregated (key-unique) right side, with sum/count post-scaled
    by the right-match multiplicity — exact for any fanout."""

    def _tables(self, rng, dup=1):
        n, nc = 600, 40
        line = Table({"k": rng.integers(0, nc, n).astype(np.int32),
                      "p": rng.random(n).astype(np.float32),
                      "q": rng.integers(1, 9, n).astype(np.int32)})
        right = Table({"k": np.repeat(np.arange(nc, dtype=np.int32), dup),
                       "seg": np.tile(
                           rng.integers(0, 4, nc).astype(np.int32), dup)})
        return line, right

    def _q(self, line, right, capacity=4096):
        return (line.lazy()
                .join(right.lazy(), "k", how="inner", capacity=capacity)
                .aggregate(["k"], {"s": ("sum", "p"), "n": "count",
                                   "a": ("mean", "q"), "m": ("max", "p")})
                .sort_by("k"))

    @pytest.mark.parametrize("dup", [1, 3])
    def test_rewrite_fires_and_matches(self, rng, dup):
        line, right = self._tables(rng, dup)
        lt = self._q(line, right)
        opt = lt.optimized().plan
        joins = _nodes(opt, P.Join)
        assert [j.how for j in joins] == ["lookup"]
        # the right side of the lookup join is a count aggregate
        assert isinstance(joins[0].right, P.Aggregate)
        got = lt.collect().to_numpy()
        k = np.asarray(line["k"])
        p = np.asarray(line["p"])
        q = np.asarray(line["q"])
        keys = sorted(set(k.tolist()))
        np.testing.assert_array_equal(got["k"], keys)
        np.testing.assert_allclose(
            np.ma.getdata(got["s"]),
            [p[k == kk].sum() * dup for kk in keys], rtol=2e-5)
        np.testing.assert_array_equal(
            got["n"], [(k == kk).sum() * dup for kk in keys])
        np.testing.assert_allclose(
            got["a"], [q[k == kk].mean() for kk in keys], rtol=1e-6)
        np.testing.assert_allclose(
            np.ma.getdata(got["m"]),
            [p[k == kk].max() for kk in keys], rtol=1e-6)

    def test_no_rewrite_when_agg_reads_right(self, rng):
        line, right = self._tables(rng)
        lt = (line.lazy()
              .join(right.lazy(), "k", how="inner", capacity=4096)
              .aggregate(["k"], {"s": ("sum", "seg")}))
        opt = lt.optimized().plan
        assert [j.how for j in _nodes(opt, P.Join)] == ["inner"]

    def test_no_rewrite_for_order_dependent_aggs(self, rng):
        line, right = self._tables(rng)
        lt = (line.lazy()
              .join(right.lazy(), "k", how="inner", capacity=4096)
              .aggregate(["k"], {"s": ("argmax", "p")}))
        opt = lt.optimized().plan
        assert [j.how for j in _nodes(opt, P.Join)] == ["inner"]

    def test_no_rewrite_when_group_keys_miss_join_key(self, rng):
        line, right = self._tables(rng)
        lt = (line.lazy()
              .join(right.lazy(), "k", how="inner", capacity=4096)
              .aggregate(["q"], {"s": ("sum", "p")}))
        opt = lt.optimized().plan
        assert [j.how for j in _nodes(opt, P.Join)] == ["inner"]


class TestFilterAggregateFusion:
    """A Filter under Aggregate/AggregateSets (possibly through the
    hoisted with_columns) fuses into the aggregate's where= — excluded
    rows ride the key sort's validity flag instead of paying a separate
    compaction sort. Results must match the unfused plan exactly."""

    def test_fuses_and_matches(self, rng):
        n = 400
        t = Table({"s": rng.integers(0, 6, n).astype(np.uint32),
                   "q": rng.integers(1, 50, n).astype(np.int32),
                   "p": rng.random(n).astype(np.float32)})
        lt = (t.lazy().filter(col("q") < 30)
              .aggregate(["s"], {"n": "count", "sq": ("sum", "q"),
                                 "mp": ("median", "p")})
              .sort_by("s"))
        ex = lt.explain()
        assert "; where]" in ex and "filter[" not in ex
        got = lt.collect().to_numpy()
        want = (t.filter(t["q"] < 30)
                .aggregate(["s"], {"n": "count", "sq": ("sum", "q"),
                                   "mp": ("median", "p")})
                .sort_by("s").to_numpy())
        for k in got:
            np.testing.assert_array_equal(
                np.ma.getdata(got[k]), np.ma.getdata(want[k]), err_msg=k
            )

    def test_fuses_above_with_columns_it_reads(self, rng):
        t = Table({"s": jnp.arange(8, dtype=jnp.uint32) % 3,
                   "q": jnp.arange(8, dtype=jnp.int32)})
        lt = (t.lazy().with_columns(d=col("q") * 2)
              .filter(col("d") > 4)
              .aggregate(["s"], {"n": "count"}))
        # the filter sits ABOVE the with_columns (it reads d), so the
        # fused where= still evaluates after it — fusion is sound
        ex = lt.explain()
        assert "; where]" in ex and "filter[" not in ex
        got = lt.collect().to_numpy()
        want = {0: 2, 1: 2, 2: 1}
        assert dict(zip(got["s"].tolist(), got["n"].tolist())) == want

    def test_no_fuse_when_hoist_shadows_pred_column(self, rng):
        # filter below a with_columns that OVERWRITES the predicate's
        # column: re-evaluating the predicate above would read the new
        # values — must NOT fuse
        t = Table({"s": jnp.arange(8, dtype=jnp.uint32) % 3,
                   "q": jnp.arange(8, dtype=jnp.int32)})
        lt = (t.lazy().filter(col("q") > 4)
              .with_columns(q=col("q") * 0)
              .aggregate(["s"], {"n": "count"}))
        ex = lt.explain()
        assert "filter[" in ex and "; where]" not in ex
        got = lt.collect().to_numpy()
        # rows 5, 6, 7 survive the filter
        assert dict(zip(got["s"].tolist(), got["n"].tolist())) == \
            {0: 1, 1: 1, 2: 1}

    def test_grouping_sets_where(self, rng):
        n = 96
        t = Table({"a": rng.integers(0, 4, n).astype(np.int32),
                   "b": rng.integers(0, 3, n).astype(np.int32),
                   "v": rng.integers(0, 9, n).astype(np.int32)})
        lt = (t.lazy().filter(col("v") > 2)
              .aggregate_sets([["a", "b"], ["a"], []],
                              {"s": ("sum", "v"), "n": "count"}))
        ex = lt.explain()
        assert "; where]" in ex and "filter[" not in ex
        got = lt.collect().to_numpy()
        want = (t.filter(t["v"] > 2)
                .aggregate_sets([["a", "b"], ["a"], []],
                                {"s": ("sum", "v"), "n": "count"})
                .to_numpy())
        for k in got:
            np.testing.assert_array_equal(
                np.ma.getdata(got[k]), np.ma.getdata(want[k]), err_msg=k
            )
            np.testing.assert_array_equal(
                np.ma.getmaskarray(got[k]), np.ma.getmaskarray(want[k]),
                err_msg=k
            )
