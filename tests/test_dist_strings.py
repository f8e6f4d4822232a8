"""String expressions over the MPP facade: the computed-string surface
(scalar string functions, concat, string comparisons) must behave on a
DistTable over the 8-virtual-device mesh exactly as on the single-chip
Table (itself oracle-tested in test_strings_fns.py) — codes stay
sharded, vocabularies replicated on host.

The reference crate is numeric-only (src/radix_sort/mod.rs); strings
belong to the north-star query-engine scope (BASELINE.json).
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

import radix_sort_tpu as rst
from radix_sort_tpu.parallel.dist_table import DistTable
from radix_sort_tpu.table import Table

WORDS = ["ada", "grace", "alan", "Ada", "", "bob", "eve", "mallory"]
N = 8 * 16


def _mesh():
    return Mesh(np.array(jax.devices()), ("x",))


@pytest.fixture
def cols(rng):
    return {
        "w": np.array([WORDS[i] for i in rng.integers(0, 8, N)]),
        "v": rng.integers(-50, 50, N).astype(np.int32),
    }


def _pair(cols):
    return Table(cols), DistTable(cols, _mesh())


def _np(t):
    out = t.to_numpy()
    return {k: np.asarray(v) for k, v in out.items()}


class TestDistStrings:
    def test_filter_on_string_fn(self, cols):
        t, dt = _pair(cols)
        pred = (rst.col("w").length() > 3) & rst.col("w").contains("a")
        a = _np(t.filter(pred))
        b = _np(dt.filter(pred))
        np.testing.assert_array_equal(a["v"], b["v"])
        np.testing.assert_array_equal(a["w"], b["w"])

    def test_with_columns_computed_string(self, cols):
        t, dt = _pair(cols)
        e = rst.concat(rst.col("w").upper(), "-x")
        a = _np(t.with_columns(u=e))
        b = _np(dt.with_columns(u=e))
        np.testing.assert_array_equal(a["u"], b["u"])

    def test_sql_group_order_limit(self, cols):
        t, dt = _pair(cols)
        q = ("SELECT UPPER(w) AS u, COUNT(*) AS n, SUM(v) AS s FROM t "
             "GROUP BY UPPER(w) ORDER BY u LIMIT 6")
        a = _np(rst.sql(q, {"t": t}).collect())
        b = _np(rst.sql(q, {"t": dt}, max_groups=16).collect())
        for k in ("u", "n", "s"):
            np.testing.assert_array_equal(a[k], b[k])

    def test_sql_string_compare_chain(self, cols):
        t, dt = _pair(cols)
        q = ("SELECT v FROM t WHERE LOWER(w) = 'ada' OR w > 'f' "
             "ORDER BY v")
        a = _np(rst.sql(q, {"t": t}).collect())
        b = _np(rst.sql(q, {"t": dt}).collect())
        np.testing.assert_array_equal(a["v"], b["v"])


class TestDistGroupingSets:
    def test_rollup_matches_single_chip(self, cols):
        t, dt = _pair(cols)
        q = ("SELECT w, COUNT(*) AS n, SUM(v) AS s, GROUPING(w) AS g "
             "FROM t GROUP BY ROLLUP(w) ORDER BY g, w")
        a = _np(rst.sql(q, {"t": t}).collect())
        b = _np(rst.sql(q, {"t": dt}, max_groups=16).collect())
        for k in ("w", "n", "s", "g"):
            np.testing.assert_array_equal(a[k], b[k])

    def test_facade_sets_match(self, cols):
        t, dt = _pair(cols)
        a = t.aggregate_sets([["w"], []], {"n": "count"})
        b = dt.aggregate_sets([["w"], []], {"n": "count"}, max_groups=16)
        np.testing.assert_array_equal(_np(a)["n"], _np(b)["n"])
        np.testing.assert_array_equal(_np(a)["w"], _np(b)["w"])

    def test_replicated_reaggregation_full_matrix(self, cols):
        """The coarse levels re-aggregate the finest level's replicated
        result (one exchange total) — every re-combinable aggregation,
        mean included (hidden sum+count helpers), must match the
        single-chip chain path exactly."""
        t, dt = _pair(cols)
        aggs = {"n": "count", "s": ("sum", "v"), "mn": ("min", "v"),
                "mx": ("max", "v"), "av": ("mean", "v"),
                "any_": ("any", "v"), "all_": ("all", "v"),
                "wmin": ("min", "w")}
        sets = [["w", "v"], ["w"], []]
        a = t.aggregate_sets(sets, aggs, grouping={"g": "w"})
        b = dt.aggregate_sets(sets, aggs, grouping={"g": "w"},
                              max_groups=256)
        an, bn = _np(a), _np(b)
        assert "__gs_s_av" not in an and "__gs_s_av" not in bn
        for k in an:
            if an[k].dtype.kind == "f":
                np.testing.assert_allclose(an[k], bn[k],
                                           rtol=1e-5, atol=1e-5,
                                           err_msg=k)
            else:
                np.testing.assert_array_equal(an[k], bn[k], err_msg=k)


class TestDistWhereFusion:
    def test_where_fused_aggregate_matches_single_chip(self, cols):
        t, dt = _pair(cols)
        q = ("SELECT w, COUNT(*) AS n, SUM(v) AS s FROM t "
             "WHERE v > 0 GROUP BY w ORDER BY w")
        lt = rst.sql(q, {"t": dt}, max_groups=16)
        assert "; where]" in lt.explain()
        a = _np(rst.sql(q, {"t": t}).collect())
        b = _np(lt.collect())
        for k in ("w", "n", "s"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_where_fused_rollup_matches_single_chip(self, cols):
        t, dt = _pair(cols)
        q = ("SELECT w, COUNT(*) AS n, GROUPING(w) AS g FROM t "
             "WHERE v > 0 GROUP BY ROLLUP(w) ORDER BY g, w")
        a = _np(rst.sql(q, {"t": t}).collect())
        b = _np(rst.sql(q, {"t": dt}, max_groups=16).collect())
        for k in ("w", "n", "g"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
