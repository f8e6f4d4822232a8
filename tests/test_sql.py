"""SQL frontend: queries compile onto the lazy planner and must match
plain numpy/Python relational algebra on the same data — selection,
predicates (incl. string literals over dictionary columns), joins,
GROUP BY / HAVING, ORDER BY / LIMIT, DISTINCT, CASE."""

import numpy as np
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu import Table, SqlError
from radix_sort_tpu.sql import sql

N = 256


@pytest.fixture
def db(rng):
    orders = {
        "oid": np.arange(N, dtype=np.uint32),
        "cust": rng.integers(0, 8, N).astype(np.uint32),
        "item": rng.choice(["bolt", "nut", "gear", "cam"], size=N),
        "qty": rng.integers(1, 20, N).astype(np.int32),
        "price": (rng.random(N) * 9 + 1).astype(np.float32),
    }
    custs = {
        "cust": np.arange(8, dtype=np.uint32),
        "region": np.array(["north", "south"] * 4),
    }
    return orders, custs


def _tables(db):
    orders, custs = db
    return {"orders": Table(orders), "custs": Table(custs)}


class TestBasics:
    def test_select_where_order_limit(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, qty FROM orders WHERE qty >= 10 "
            "ORDER BY qty DESC, oid ASC LIMIT 5",
            _tables(db),
        ).collect().to_numpy()
        mask = orders["qty"] >= 10
        ref = sorted(zip(-orders["qty"][mask], orders["oid"][mask]))[:5]
        np.testing.assert_array_equal(out["oid"], [o for _, o in ref])
        np.testing.assert_array_equal(out["qty"], [-q for q, _ in ref])

    def test_computed_columns_and_case(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, qty * 2 + 1 AS qq, "
            "CASE WHEN qty >= 10 THEN 1 ELSE 0 END AS big "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        np.testing.assert_array_equal(out["qq"], orders["qty"] * 2 + 1)
        np.testing.assert_array_equal(out["big"],
                                      (orders["qty"] >= 10).astype(int))

    def test_string_predicates(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders WHERE item = 'gear' OR item < 'cam'",
            _tables(db),
        ).collect().to_numpy()
        ref = orders["oid"][(orders["item"] == "gear")
                            | (orders["item"] < "cam")]
        np.testing.assert_array_equal(np.sort(out["oid"]), np.sort(ref))

    def test_in_between_not(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders WHERE item IN ('nut', 'cam') "
            "AND qty NOT BETWEEN 5 AND 15",
            _tables(db),
        ).collect().to_numpy()
        ref = orders["oid"][np.isin(orders["item"], ["nut", "cam"])
                            & ~((orders["qty"] >= 5)
                                & (orders["qty"] <= 15))]
        np.testing.assert_array_equal(np.sort(out["oid"]), np.sort(ref))

    def test_like(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders WHERE item LIKE '%a%' "
            "AND item NOT LIKE 'c__'",
            _tables(db),
        ).collect().to_numpy()
        it = orders["item"].astype(str)
        keep = (np.char.find(it, "a") >= 0) & ~(
            np.char.startswith(it, "c") & (np.char.str_len(it) == 3))
        np.testing.assert_array_equal(np.sort(out["oid"]),
                                      np.sort(orders["oid"][keep]))

    def test_distinct(self, db):
        orders, _ = db
        out = sql("SELECT DISTINCT item FROM orders",
                  _tables(db)).collect().to_numpy()
        np.testing.assert_array_equal(out["item"],
                                      np.unique(orders["item"]))

    def test_scalar_math_functions(self, db):
        orders, _ = db
        out = sql(
            "SELECT FLOOR(price) AS f, CEILING(price) AS c, "
            "ROUND(price) AS r, ROUND(price, 1) AS r1, SIGN(price - 5) AS s, "
            "SQRT(price) AS sq, EXP(0 - price) AS e, LN(price) AS l, "
            "LOG10(price) AS l10, POWER(qty, 2) AS p2, MOD(qty, 3) AS m, "
            "LEAST(qty, 5, 7) AS lo, GREATEST(qty, 5, 7) AS hi "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        pr, q = db[0]["price"], db[0]["qty"]
        np.testing.assert_allclose(out["f"], np.floor(pr))
        np.testing.assert_allclose(out["c"], np.ceil(pr))
        np.testing.assert_allclose(out["r"], np.round(pr))
        np.testing.assert_allclose(out["r1"], np.round(pr * 10) / 10,
                                   rtol=1e-6)
        np.testing.assert_allclose(out["s"], np.sign(pr - 5))
        np.testing.assert_allclose(out["sq"], np.sqrt(pr), rtol=1e-6)
        np.testing.assert_allclose(out["e"], np.exp(-pr), rtol=1e-5)
        np.testing.assert_allclose(out["l"], np.log(pr), rtol=1e-6)
        np.testing.assert_allclose(out["l10"], np.log10(pr), rtol=1e-6)
        np.testing.assert_array_equal(out["p2"], q.astype(np.int64) ** 2)
        np.testing.assert_array_equal(out["m"], q % 3)
        np.testing.assert_array_equal(out["lo"], np.minimum(q, 5))
        np.testing.assert_array_equal(out["hi"], np.maximum(q, 7))

    def test_limit_offset(self, db):
        orders, _ = db
        srt = np.sort(orders["qty"])
        # with ORDER BY: fuses to top_k(k+offset) + head slice
        out = sql("SELECT qty FROM orders ORDER BY qty LIMIT 7 OFFSET 5",
                  _tables(db)).collect().to_numpy()
        np.testing.assert_array_equal(out["qty"], srt[5:12])
        # plain OFFSET without ORDER BY: input row order
        out = sql("SELECT oid FROM orders LIMIT 4 OFFSET 250",
                  _tables(db)).collect().to_numpy()
        np.testing.assert_array_equal(out["oid"], orders["oid"][250:254])
        # offset past the end -> empty
        out = sql("SELECT oid FROM orders ORDER BY oid LIMIT 5 OFFSET 300",
                  _tables(db)).collect().to_numpy()
        assert out["oid"].shape[0] == 0
        # LIMIT larger than the table clamps (through the top_k fusion)
        out = sql("SELECT oid FROM orders ORDER BY oid DESC "
                  "LIMIT 999 OFFSET 254", _tables(db)).collect().to_numpy()
        np.testing.assert_array_equal(out["oid"], [1, 0])


class TestAggregates:
    def test_group_by_having(self, db):
        orders, _ = db
        out = sql(
            "SELECT item, SUM(qty) AS total, COUNT(*) AS n, "
            "AVG(price) AS avgp "
            "FROM orders GROUP BY item HAVING total >= 0 ORDER BY item",
            _tables(db),
        ).collect().to_numpy()
        items = np.unique(orders["item"])
        np.testing.assert_array_equal(out["item"], items)
        for i, it in enumerate(items):
            m = orders["item"] == it
            assert out["total"][i] == orders["qty"][m].sum()
            assert out["n"][i] == m.sum()
            np.testing.assert_allclose(out["avgp"][i],
                                       orders["price"][m].mean(),
                                       rtol=1e-5)

    def test_global_aggregate(self, db):
        orders, _ = db
        out = sql(
            "SELECT SUM(qty) AS s, COUNT(DISTINCT cust) AS nc FROM orders",
            _tables(db),
        ).collect().to_numpy()
        assert out["s"][0] == orders["qty"].sum()
        assert out["nc"][0] == np.unique(orders["cust"]).size

    def test_having_inline_aggregates(self, db):
        # aggregates called inline in HAVING (not selected) hoist into
        # synthetic columns and are dropped from the output
        orders, _ = db
        out = sql(
            "SELECT cust, COUNT(*) AS n FROM orders GROUP BY cust "
            "HAVING SUM(qty) > 300 AND MIN(price) < 5",
            _tables(db),
        ).collect().to_numpy()
        assert set(out.keys()) == {"cust", "n"}
        uk = np.unique(orders["cust"])
        sums = np.array([orders["qty"][orders["cust"] == c].sum()
                         for c in uk])
        mins = np.array([orders["price"][orders["cust"] == c].min()
                         for c in uk])
        keep = (sums > 300) & (mins < 5)
        np.testing.assert_array_equal(np.sort(out["cust"]), uk[keep])

    def test_having_count_star(self, db):
        orders, _ = db
        out = sql(
            "SELECT item FROM orders GROUP BY item HAVING COUNT(*) > 60",
            _tables(db),
        ).collect().to_numpy()
        items, counts = np.unique(orders["item"], return_counts=True)
        np.testing.assert_array_equal(np.sort(out["item"]),
                                      items[counts > 60])

    def test_window_over_group_by(self, db):
        # RANK() over the aggregated rows, ordering by an inline aggregate
        orders, _ = db
        out = sql(
            "SELECT item, SUM(qty) AS total, "
            "RANK() OVER (ORDER BY SUM(qty) DESC) AS rnk "
            "FROM orders GROUP BY item ORDER BY item",
            _tables(db),
        ).collect().to_numpy()
        assert set(out.keys()) == {"item", "total", "rnk"}
        items = np.unique(orders["item"])
        totals = np.array([orders["qty"][orders["item"] == it].sum()
                           for it in items])
        exp_rank = np.array([1 + (totals > t).sum() for t in totals])
        np.testing.assert_array_equal(out["total"], totals)
        np.testing.assert_array_equal(out["rnk"], exp_rank)

    def test_window_arg_aggregate_lag(self, db):
        # LAG(SUM(qty)) OVER (ORDER BY cust): window argument is itself a
        # hoisted aggregate over the grouped rows
        orders, _ = db
        out = sql(
            "SELECT cust, LAG(SUM(qty), 1, 0) OVER (ORDER BY cust) AS prev "
            "FROM orders GROUP BY cust ORDER BY cust",
            _tables(db),
        ).collect().to_numpy()
        uk = np.sort(np.unique(orders["cust"]))
        sums = np.array([orders["qty"][orders["cust"] == c].sum()
                         for c in uk])
        np.testing.assert_array_equal(out["prev"],
                                      np.concatenate([[0], sums[:-1]]))

    def test_expression_aggregate_args(self, db):
        # SUM(price * qty): the expression hoists into a pre-aggregation
        # computed column and never leaks into the output
        orders, _ = db
        out = sql(
            "SELECT item, SUM(price * qty) AS rev, "
            "SUM(CASE WHEN qty >= 10 THEN 1 ELSE 0 END) AS big "
            "FROM orders GROUP BY item ORDER BY item",
            _tables(db),
        ).collect().to_numpy()
        assert set(out.keys()) == {"item", "rev", "big"}
        for i, it in enumerate(np.unique(orders["item"])):
            m = orders["item"] == it
            np.testing.assert_allclose(
                out["rev"][i],
                (orders["price"][m] * orders["qty"][m]).sum(), rtol=2e-5)
            assert out["big"][i] == (orders["qty"][m] >= 10).sum()

    def test_expression_agg_in_having(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust FROM orders GROUP BY cust "
            "HAVING SUM(price * qty) > 700",
            _tables(db),
        ).collect().to_numpy()
        uk = np.unique(orders["cust"])
        rev = np.array([(orders["price"][orders["cust"] == c]
                         * orders["qty"][orders["cust"] == c]).sum()
                        for c in uk])
        np.testing.assert_array_equal(np.sort(out["cust"]), uk[rev > 700])

    def test_expression_agg_needs_alias(self, db):
        with pytest.raises(SqlError, match="alias"):
            sql("SELECT SUM(price * qty) FROM orders GROUP BY cust",
                _tables(db))

    def test_computed_group_keys(self, db):
        orders, _ = db
        out = sql(
            "SELECT qty % 5 AS r, COUNT(*) AS n, "
            "CASE WHEN qty >= 10 THEN 1 ELSE 0 END AS big, SUM(qty) AS s "
            "FROM orders GROUP BY r, big ORDER BY r, big",
            _tables(db),
        ).collect().to_numpy()
        r = orders["qty"] % 5
        big = (orders["qty"] >= 10).astype(int)
        seen = 0
        for rv in np.unique(r):
            for bv in np.unique(big[r == rv]):
                m = (r == rv) & (big == bv)
                assert out["r"][seen] == rv and out["big"][seen] == bv
                assert out["n"][seen] == m.sum()
                assert out["s"][seen] == orders["qty"][m].sum()
                seen += 1
        assert seen == out["r"].size

    def test_is_null_on_non_nullable(self, db):
        # a never-null column: IS NULL keeps nothing, IS NOT NULL keeps all
        out = sql("SELECT oid FROM orders WHERE qty IS NULL",
                  _tables(db)).collect().to_numpy()
        assert len(out["oid"]) == 0
        out = sql("SELECT oid FROM orders WHERE qty IS NOT NULL",
                  _tables(db)).collect().to_numpy()
        assert len(out["oid"]) == N

    def test_quantile_aggregate(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, QUANTILE(qty, 0.9) AS q90, "
            "PERCENTILE_DISC(price, 0.5) AS p50 "
            "FROM orders GROUP BY cust ORDER BY cust",
            _tables(db),
        ).collect().to_numpy()
        for i, c in enumerate(np.unique(orders["cust"])):
            sq = np.sort(orders["qty"][orders["cust"] == c])
            sp = np.sort(orders["price"][orders["cust"] == c])
            assert out["q90"][i] == sq[int(np.floor(0.9 * (len(sq) - 1)
                                                    + 1e-6))]
            assert out["p50"][i] == sp[(len(sp) - 1) // 2]
        with pytest.raises(SqlError, match=r"q in \[0, 1\]"):
            sql("SELECT QUANTILE(qty) AS x FROM orders GROUP BY cust",
                _tables(db))
        with pytest.raises(SqlError, match="not a window function"):
            sql("SELECT QUANTILE(qty, 0.5) OVER (PARTITION BY cust) AS x "
                "FROM orders", _tables(db))

    def test_string_group_min_max(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, MIN(item) AS lo, MAX(item) AS hi "
            "FROM orders GROUP BY cust ORDER BY cust",
            _tables(db),
        ).collect().to_numpy()
        for i, c in enumerate(np.unique(orders["cust"])):
            m = orders["cust"] == c
            # np.min/max lack a str ufunc loop; use Python builtins
            assert out["lo"][i] == min(orders["item"][m].tolist())
            assert out["hi"][i] == max(orders["item"][m].tolist())


class TestWindowExprArgs:
    def test_window_value_fn_expression(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, SUM(price * qty) OVER (PARTITION BY cust) AS s "
            "FROM orders ORDER BY oid",
            _tables(db),
        ).collect().to_numpy()
        pq = orders["price"] * orders["qty"]
        for c in np.unique(orders["cust"]):
            m = orders["cust"] == c
            np.testing.assert_allclose(out["s"][m], pq[m].sum(), rtol=2e-5)

    def test_select_star_does_not_leak_pre(self, db):
        orders, _ = db
        out = sql(
            "SELECT *, MAX(price * qty) OVER (PARTITION BY cust) AS mx "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        assert set(out.keys()) == set(orders) | {"mx"}

    def test_window_expr_arg_rejected_under_group_by(self, db):
        with pytest.raises(SqlError, match="pre-aggregation"):
            sql("SELECT cust, SUM(qty) AS s, "
                "LAG(price * qty, 1, 0) OVER (ORDER BY cust) AS x "
                "FROM orders GROUP BY cust", _tables(db))


class TestCompounds:
    """Set operations between SELECTs and derived-table subqueries."""

    @pytest.fixture
    def two(self):
        t1 = Table({"k": np.array([1, 2, 3, 4, 5], np.uint32),
                    "s": ["a", "b", "c", "b", "a"]})
        t2 = Table({"k": np.array([3, 4, 5, 6, 7], np.uint32),
                    "s": ["c", "x", "a", "y", "z"]})
        return {"t1": t1, "t2": t2}

    def test_union_distinct_and_all(self, two):
        o = sql("SELECT k FROM t1 UNION SELECT k FROM t2",
                two).collect().to_numpy()
        np.testing.assert_array_equal(np.sort(o["k"]), np.arange(1, 8))
        o = sql("SELECT k FROM t1 UNION ALL SELECT k FROM t2",
                two).collect().to_numpy()
        assert o["k"].size == 10

    def test_intersect_except_strings(self, two):
        o = sql("SELECT s FROM t1 INTERSECT SELECT s FROM t2",
                two).collect().to_numpy()
        np.testing.assert_array_equal(np.sort(o["s"]), ["a", "c"])
        o = sql("SELECT s FROM t1 EXCEPT SELECT s FROM t2",
                two).collect().to_numpy()
        np.testing.assert_array_equal(o["s"], ["b"])

    def test_intersect_binds_tighter(self, two):
        tables = dict(two, t3=Table({"k": np.array([5, 6, 99], np.uint32)}))
        o = sql("SELECT k FROM t1 UNION SELECT k FROM t2 "
                "INTERSECT SELECT k FROM t3", tables).collect().to_numpy()
        # == t1 UNION (t2 INTERSECT t3), not (t1 UNION t2) INTERSECT t3
        np.testing.assert_array_equal(np.sort(o["k"]), [1, 2, 3, 4, 5, 6])

    def test_compound_order_limit_and_parens(self, two):
        o = sql("SELECT k FROM t1 UNION SELECT k FROM t2 "
                "ORDER BY k DESC LIMIT 3", two).collect().to_numpy()
        np.testing.assert_array_equal(o["k"], [7, 6, 5])
        o = sql("(SELECT k FROM t1 UNION SELECT k FROM t2) "
                "EXCEPT SELECT k FROM t1", two).collect().to_numpy()
        np.testing.assert_array_equal(np.sort(o["k"]), [6, 7])

    def test_derived_table_subqueries(self, two):
        # FROM subquery keeps its inner ORDER/LIMIT scoped to the parens
        o = sql("SELECT k FROM (SELECT k FROM t2 ORDER BY k DESC LIMIT 2) "
                "AS top ORDER BY k", two).collect().to_numpy()
        np.testing.assert_array_equal(o["k"], [6, 7])
        # JOIN against a subquery, aggregate on top
        o = sql("SELECT s, COUNT(*) AS n FROM t1 "
                "JOIN (SELECT k FROM t2 WHERE k <= 5) sub ON k = k "
                "GROUP BY s ORDER BY s", two,
                capacity=16).collect().to_numpy()
        np.testing.assert_array_equal(o["s"], ["a", "b", "c"])
        np.testing.assert_array_equal(o["n"], [1, 1, 1])

    def test_setop_schema_mismatch(self, two):
        with pytest.raises(SqlError, match="same column names"):
            sql("SELECT k FROM t1 UNION SELECT k, s FROM t2", two)


class TestJoinKeyForms:
    def test_on_different_names_renames_right(self, rng):
        orders = Table({"cust_id": rng.integers(0, 8, 64).astype(np.uint32),
                        "qty": rng.integers(1, 20, 64).astype(np.int32)})
        custs = Table({"cid": np.arange(8, dtype=np.uint32),
                       "region": np.array(["n", "s"] * 4)})
        T = {"orders": orders, "custs": custs}
        oc = np.asarray(orders.to_numpy()["cust_id"])
        for on in ("cust_id = cid", "cid = cust_id"):  # either side order
            out = sql(f"SELECT cust_id, region FROM orders "
                      f"JOIN custs ON {on}", T,
                      capacity=128).collect().to_numpy()
            np.testing.assert_array_equal(out["cust_id"], oc, err_msg=on)
            np.testing.assert_array_equal(
                out["region"], np.array(["n", "s"] * 4)[oc], err_msg=on)

    def test_using(self):
        a = Table({"k": np.array([1, 2, 3], np.uint32),
                   "x": np.array([1, 2, 3], np.int32)})
        b = Table({"k": np.array([2, 3, 4], np.uint32),
                   "y": np.array([20, 30, 40], np.int32)})
        out = sql("SELECT k, x, y FROM a JOIN b USING (k) ORDER BY k",
                  {"a": a, "b": b}, capacity=8).collect().to_numpy()
        np.testing.assert_array_equal(out["k"], [2, 3])
        np.testing.assert_array_equal(out["y"], [20, 30])

    def test_on_bad_key_raises(self, db):
        with pytest.raises(SqlError, match="left column"):
            sql("SELECT qty FROM orders JOIN custs ON qty = nope",
                _tables(db), capacity=8)


class TestSubqueriesAndCtes:
    def test_in_subquery_semi_join(self, db):
        orders, custs = db
        out = sql(
            "SELECT oid, cust FROM orders "
            "WHERE cust IN (SELECT cust FROM custs WHERE region = 'north')",
            _tables(db),
        ).collect().to_numpy()
        north = custs["cust"][custs["region"] == "north"]
        keep = np.isin(orders["cust"], north)
        np.testing.assert_array_equal(out["oid"], orders["oid"][keep])

    def test_not_in_subquery_anti_join_with_rename(self, db):
        # subquery column name differs from the left column -> renamed
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders WHERE qty NOT IN "
            "(SELECT qty FROM orders WHERE qty >= 10) AND oid < 100",
            _tables(db),
        ).collect().to_numpy()
        keep = (orders["qty"] < 10) & (orders["oid"] < 100)
        np.testing.assert_array_equal(out["oid"], orders["oid"][keep])

    def test_having_in_subquery(self, db):
        orders, custs = db
        out = sql(
            "SELECT cust, SUM(qty) AS s FROM orders GROUP BY cust "
            "HAVING cust IN (SELECT cust FROM custs WHERE region = 'south')",
            _tables(db),
        ).collect().to_numpy()
        south = set(custs["cust"][custs["region"] == "south"].tolist())
        np.testing.assert_array_equal(
            np.sort(out["cust"]), sorted(south & set(orders["cust"])))

    def test_ctes_chain(self, db):
        orders, _ = db
        out = sql(
            "WITH big AS (SELECT cust, qty FROM orders WHERE qty > 10), "
            "     agg AS (SELECT cust, COUNT(*) AS n FROM big GROUP BY cust) "
            "SELECT cust, n FROM agg ORDER BY cust",
            _tables(db),
        ).collect().to_numpy()
        uk, cnts = np.unique(orders["cust"][orders["qty"] > 10],
                             return_counts=True)
        np.testing.assert_array_equal(out["cust"], uk)
        np.testing.assert_array_equal(out["n"], cnts)

    def test_scalar_subqueries(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders WHERE qty > (SELECT AVG(qty) FROM "
            "orders)",
            _tables(db),
        ).collect().to_numpy()
        keep = orders["qty"] > orders["qty"].mean()
        np.testing.assert_array_equal(out["oid"], orders["oid"][keep])
        # in HAVING with arithmetic, and as a SELECT expression
        out = sql(
            "SELECT cust, SUM(qty) AS s FROM orders GROUP BY cust "
            "HAVING SUM(qty) > (SELECT SUM(qty) FROM orders) / 10",
            _tables(db),
        ).collect().to_numpy()
        uk = np.unique(orders["cust"])
        sums = np.array([orders["qty"][orders["cust"] == c].sum()
                         for c in uk])
        np.testing.assert_array_equal(
            np.sort(out["cust"]), uk[sums > orders["qty"].sum() / 10])
        out = sql(
            "SELECT oid, qty - (SELECT MIN(qty) FROM orders) AS rel "
            "FROM orders", _tables(db),
        ).collect().to_numpy()
        np.testing.assert_array_equal(
            out["rel"], orders["qty"] - orders["qty"].min())
        with pytest.raises(SqlError, match="exactly one"):
            sql("SELECT oid FROM orders WHERE qty > "
                "(SELECT oid, qty FROM orders)", _tables(db))

    def test_in_subquery_guards(self, db):
        t = _tables(db)
        with pytest.raises(SqlError, match="OR"):
            sql("SELECT oid FROM orders WHERE cust IN "
                "(SELECT cust FROM custs) OR qty > 3", t)
        with pytest.raises(SqlError, match="conjunct"):
            sql("SELECT oid FROM orders WHERE NOT "
                "(cust IN (SELECT cust FROM custs))", t)
        with pytest.raises(SqlError, match="exactly one column"):
            sql("SELECT oid FROM orders WHERE cust IN "
                "(SELECT cust, region FROM custs)", t)


class TestJoins:
    def test_inner_join_group(self, db):
        orders, custs = db
        out = sql(
            "SELECT region, SUM(qty) AS total FROM orders "
            "JOIN custs ON orders.cust = custs.cust "
            "GROUP BY region ORDER BY region",
            _tables(db), capacity=2 * N, max_groups=8,
        ).collect().to_numpy()
        region_of = dict(zip(custs["cust"], custs["region"]))
        ref = {}
        for c, q in zip(orders["cust"], orders["qty"]):
            ref[region_of[c]] = ref.get(region_of[c], 0) + int(q)
        np.testing.assert_array_equal(out["region"],
                                      sorted(ref))
        np.testing.assert_array_equal(out["total"],
                                      [ref[r] for r in sorted(ref)])

    def test_left_join_filter(self, db):
        orders, custs = db
        # restrict custs to region north and LEFT JOIN: south orders
        # get "" region
        t = _tables(db)
        t["north"] = Table(custs).filter(
            Table(custs)["region"] == Table(custs).code("region", "north")
        )
        out = sql(
            "SELECT oid, region FROM orders "
            "LEFT JOIN north ON orders.cust = north.cust",
            t, capacity=2 * N,
        ).collect().to_numpy()
        region_of = dict(zip(custs["cust"], custs["region"]))
        got = dict(zip(out["oid"].tolist(), out["region"].tolist()))
        for o, c in zip(orders["oid"], orders["cust"]):
            # unmatched LEFT JOIN cells are SQL NULL (None via tolist)
            want = "north" if region_of[c] == "north" else None
            assert got[int(o)] == want


class TestExplain:
    def test_explain_returns_plan_text(self, db):
        out = sql(
            "EXPLAIN SELECT cust, SUM(qty) AS total FROM orders "
            "WHERE qty > 5 GROUP BY cust",
            _tables(db), max_groups=16,
        )
        assert isinstance(out, str)
        assert "aggregate" in out


class TestGroupOrderByAll:
    """DuckDB conveniences: GROUP BY ALL / ORDER BY ALL."""

    def test_group_by_all(self, db):
        orders, _ = db
        out = sql(
            "SELECT item, cust, SUM(qty) AS total FROM orders "
            "GROUP BY ALL ORDER BY item, cust",
            _tables(db), max_groups=64,
        ).collect().to_numpy()
        ref = {}
        for i, c, q in zip(orders["item"], orders["cust"], orders["qty"]):
            ref[(i, int(c))] = ref.get((i, int(c)), 0) + int(q)
        keys = sorted(ref)
        np.testing.assert_array_equal(out["item"], [k[0] for k in keys])
        np.testing.assert_array_equal(out["cust"], [k[1] for k in keys])
        np.testing.assert_array_equal(out["total"],
                                      [ref[k] for k in keys])

    def test_group_by_all_expr_key(self, db):
        orders, _ = db
        out = sql(
            "SELECT qty % 3 AS r, COUNT(*) AS n FROM orders "
            "GROUP BY ALL ORDER BY r",
            _tables(db), max_groups=8,
        ).collect().to_numpy()
        ref = {}
        for q in orders["qty"]:
            ref[int(q) % 3] = ref.get(int(q) % 3, 0) + 1
        np.testing.assert_array_equal(out["r"], sorted(ref))
        np.testing.assert_array_equal(out["n"],
                                      [ref[k] for k in sorted(ref)])

    def test_order_by_all(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, qty FROM orders ORDER BY ALL",
            _tables(db),
        ).collect().to_numpy()
        ref = sorted(zip(orders["cust"].tolist(), orders["qty"].tolist()))
        np.testing.assert_array_equal(out["cust"], [r[0] for r in ref])
        np.testing.assert_array_equal(out["qty"], [r[1] for r in ref])

    def test_order_by_all_desc_limit(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, qty FROM orders ORDER BY ALL DESC LIMIT 5",
            _tables(db),
        ).collect().to_numpy()
        ref = sorted(zip(orders["cust"].tolist(), orders["qty"].tolist()),
                     reverse=True)[:5]
        np.testing.assert_array_equal(out["cust"], [r[0] for r in ref])
        np.testing.assert_array_equal(out["qty"], [r[1] for r in ref])

    def test_group_by_all_star_rejected(self, db):
        with pytest.raises(SqlError, match="SELECT [*]"):
            sql("SELECT *, COUNT(*) AS n FROM orders GROUP BY ALL",
                _tables(db))

    def test_group_by_all_no_keys_rejected(self, db):
        with pytest.raises(SqlError, match="no plain"):
            sql("SELECT COUNT(*) AS n FROM orders GROUP BY ALL",
                _tables(db))


class TestAsofJoin:
    """ASOF [LEFT] JOIN (DuckDB syntax) vs a Python nearest-key oracle."""

    @staticmethod
    def _oracle(lts, rts, rvals, direction):
        """For each left t: value of the nearest right row (backward:
        at-or-before; forward: at-or-after), or None."""
        out = []
        for t in lts:
            if direction == "backward":
                cands = [(rt, v) for rt, v in zip(rts, rvals) if rt <= t]
                pick = max(cands, key=lambda p: p[0]) if cands else None
            else:
                cands = [(rt, v) for rt, v in zip(rts, rvals) if rt >= t]
                pick = min(cands, key=lambda p: p[0]) if cands else None
            out.append(None if pick is None else pick[1])
        return out

    @pytest.fixture
    def ts(self, rng):
        lt = rng.integers(0, 1000, N).astype(np.int32)
        rt = np.unique(rng.integers(0, 1000, 40).astype(np.int32))
        px = (np.arange(rt.size, dtype=np.int32) + 1) * 10
        return ({"t": lt, "qty": np.arange(N, dtype=np.int32)},
                {"qt": rt, "px": px})

    def test_inner_backward(self, ts):
        trades, quotes = ts
        out = sql(
            "SELECT t, qty, px FROM trades ASOF JOIN quotes ON t >= qt",
            {"trades": Table(trades), "quotes": Table(quotes)},
        ).collect().to_numpy()
        ref = self._oracle(trades["t"], quotes["qt"], quotes["px"],
                           "backward")
        keep = [i for i, v in enumerate(ref) if v is not None]
        np.testing.assert_array_equal(out["t"], trades["t"][keep])
        np.testing.assert_array_equal(out["qty"], trades["qty"][keep])
        np.testing.assert_array_equal(out["px"],
                                      [ref[i] for i in keep])

    def test_left_forward_mirrored(self, ts):
        trades, quotes = ts
        # operand order mirrored: qt <= t is the same backward join;
        # LEFT keeps unmatched rows zero-filled
        out = sql(
            "SELECT t, px FROM trades ASOF LEFT JOIN quotes ON qt <= t",
            {"trades": Table(trades), "quotes": Table(quotes)},
        ).collect().to_numpy()
        ref = self._oracle(trades["t"], quotes["qt"], quotes["px"],
                           "backward")
        np.testing.assert_array_equal(out["t"], trades["t"])
        np.testing.assert_array_equal(
            out["px"], [0 if v is None else v for v in ref])

    def test_inner_forward_then_group(self, ts):
        trades, quotes = ts
        out = sql(
            "SELECT px, COUNT(*) AS n FROM trades "
            "ASOF JOIN quotes ON t <= qt GROUP BY px ORDER BY px",
            {"trades": Table(trades), "quotes": Table(quotes)},
            max_groups=64,
        ).collect().to_numpy()
        ref = self._oracle(trades["t"], quotes["qt"], quotes["px"],
                           "forward")
        want = {}
        for v in ref:
            if v is not None:
                want[v] = want.get(v, 0) + 1
        np.testing.assert_array_equal(out["px"], sorted(want))
        np.testing.assert_array_equal(out["n"],
                                      [want[k] for k in sorted(want)])

    def test_same_named_key(self):
        a = Table({"t": np.array([5, 1], np.int32),
                   "x": np.array([1, 2], np.int32)})
        b = Table({"t": np.array([2, 4], np.int32),
                   "y": np.array([7, 8], np.int32)})
        out = sql("SELECT x, y FROM a ASOF JOIN b ON a.t >= b.t",
                  {"a": a, "b": b}).collect().to_numpy()
        np.testing.assert_array_equal(out["x"], [1])
        np.testing.assert_array_equal(out["y"], [8])

    def test_errors(self, ts):
        trades, quotes = ts
        t = {"trades": Table(trades), "quotes": Table(quotes)}
        with pytest.raises(SqlError, match=">= or <="):
            sql("SELECT * FROM trades ASOF JOIN quotes ON t > qt", t)
        with pytest.raises(SqlError, match="one inequality conjunct"):
            sql("SELECT * FROM trades ASOF JOIN quotes "
                "ON t >= qt AND qty = px", t)
        with pytest.raises(SqlError, match="left column"):
            sql("SELECT * FROM trades ASOF JOIN quotes ON qt >= px", t)


class TestWindows:
    """fn(...) OVER (...) vs numpy oracles (ROWS semantics; ties in
    ORDER BY break by input order)."""

    def test_row_number_and_running_sum(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, cust, "
            "ROW_NUMBER() OVER (PARTITION BY cust ORDER BY oid) AS rn, "
            "SUM(qty) OVER (PARTITION BY cust ORDER BY oid) AS rs "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        # output stays in input row order
        np.testing.assert_array_equal(out["oid"], orders["oid"])
        for c in np.unique(orders["cust"]):
            m = orders["cust"] == c
            np.testing.assert_array_equal(
                out["rn"][m], np.arange(1, m.sum() + 1))
            np.testing.assert_array_equal(
                out["rs"][m], np.cumsum(orders["qty"][m]))

    def test_partition_wide_agg(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, SUM(qty) OVER (PARTITION BY cust) AS tot "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        for c in np.unique(orders["cust"]):
            m = orders["cust"] == c
            np.testing.assert_array_equal(out["tot"][m],
                                          orders["qty"][m].sum())

    def test_rolling_frame(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, AVG(price) OVER (PARTITION BY cust ORDER BY oid "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS ma "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        for c in np.unique(orders["cust"]):
            m = np.flatnonzero(orders["cust"] == c)
            for j, i in enumerate(m):
                lo = max(0, j - 3)
                ref = orders["price"][m[lo:j + 1]].mean()
                np.testing.assert_allclose(out["ma"][i], ref, rtol=1e-5)

    def test_lag_with_default(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, LAG(qty, 1, -1) OVER "
            "(PARTITION BY cust ORDER BY oid) AS prev FROM orders",
            _tables(db),
        ).collect().to_numpy()
        for c in np.unique(orders["cust"]):
            m = np.flatnonzero(orders["cust"] == c)
            ref = np.concatenate([[-1], orders["qty"][m[:-1]]])
            np.testing.assert_array_equal(out["prev"][m], ref)

    def test_rank_desc(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid, RANK() OVER (ORDER BY qty DESC) AS r "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        ref = 1 + np.array([(orders["qty"] > q).sum()
                            for q in orders["qty"]])
        np.testing.assert_array_equal(out["r"], ref)

    def test_count_and_first_value(self, db):
        orders, _ = db
        out = sql(
            "SELECT COUNT(*) OVER (PARTITION BY cust) AS n, "
            "FIRST_VALUE(qty) OVER (PARTITION BY cust ORDER BY oid) AS fv "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        for c in np.unique(orders["cust"]):
            m = np.flatnonzero(orders["cust"] == c)
            np.testing.assert_array_equal(out["n"][m], len(m))
            np.testing.assert_array_equal(out["fv"][m],
                                          orders["qty"][m[0]])

    def test_window_errors(self, db):
        t = _tables(db)
        with pytest.raises(SqlError, match="OVER"):
            sql("SELECT ROW_NUMBER() AS rn FROM orders", t)
        # window + GROUP BY in one SELECT is supported (post-aggregation
        # windows): the row numbers cover the grouped rows exactly
        out = sql("SELECT cust, SUM(qty) AS s, ROW_NUMBER() OVER "
                  "(ORDER BY cust) AS rn FROM orders GROUP BY cust",
                  t).collect().to_numpy()
        np.testing.assert_array_equal(
            np.sort(out["rn"]), np.arange(1, out["cust"].size + 1))
        with pytest.raises(SqlError, match="top-level"):
            sql("SELECT ROW_NUMBER() OVER (ORDER BY oid) + 1 AS x "
                "FROM orders", t)
        with pytest.raises(SqlError, match="explicit"):
            # running AVG has no engine form without a frame
            sql("SELECT AVG(qty) OVER (ORDER BY oid) AS a FROM orders", t)
        with pytest.raises(SqlError, match="cannot end"):
            sql("SELECT SUM(qty) OVER (ORDER BY oid ROWS BETWEEN "
                "CURRENT ROW AND 2 PRECEDING) AS s FROM orders", t)


class TestErrors:
    def test_parse_errors(self, db):
        t = _tables(db)
        with pytest.raises(SqlError, match="expected FROM"):
            sql("SELECT oid", t)
        with pytest.raises(SqlError, match="unknown table"):
            sql("SELECT x FROM nope", t)
        with pytest.raises(SqlError, match="alias"):
            sql("SELECT qty + 1 FROM orders", t)
        with pytest.raises(SqlError, match="GROUP BY key"):
            sql("SELECT qty, SUM(price) AS s FROM orders GROUP BY item", t)
        # differently-named ON keys are legal (rename join) — but joining
        # a numeric column against a string column errors at execution
        with pytest.raises(TypeError, match="string"):
            sql("SELECT oid FROM orders JOIN custs ON cust = region", t,
                capacity=8).collect()
        with pytest.raises(SqlError, match="top-level"):
            sql("SELECT SUM(qty) + 1 AS x FROM orders", t)
        with pytest.raises(SqlError, match="top-level"):
            sql("SELECT oid FROM orders WHERE SUM(qty) > 3", t)
        with pytest.raises(SqlError, match="nested"):
            sql("SELECT COUNT(SUM(qty)) AS x FROM orders GROUP BY cust", t)
        with pytest.raises(SqlError, match="ROUND digits"):
            sql("SELECT ROUND(price, qty) AS x FROM orders", t)
        with pytest.raises(SqlError, match="at least two"):
            sql("SELECT LEAST(qty) AS x FROM orders", t)
        with pytest.raises(SqlError, match="OFFSET needs an integer"):
            sql("SELECT oid FROM orders LIMIT 3 OFFSET x", t)

    def test_string_arithmetic_rejected(self, db):
        # arithmetic over a dictionary-encoded string column would
        # silently compute on uint32 codes — must raise instead
        with pytest.raises(TypeError, match="string column"):
            sql("SELECT item + 1 AS x FROM orders",
                _tables(db)).collect()
        with pytest.raises(TypeError, match="string column"):
            sql("SELECT -item AS x FROM orders", _tables(db)).collect()

    def test_distinct_with_group_by(self, db):
        orders, _ = db
        # GROUP BY on a superset of the selected keys: DISTINCT must
        # dedup the post-aggregate rows
        out = sql(
            "SELECT DISTINCT cust FROM orders GROUP BY cust, item",
            _tables(db),
        ).collect().to_numpy()
        np.testing.assert_array_equal(np.sort(out["cust"]),
                                      np.unique(orders["cust"]))

    def test_explain_renders(self, db):
        plan = sql(
            "SELECT item, SUM(qty) AS s FROM orders "
            "WHERE qty > 3 GROUP BY item ORDER BY s DESC LIMIT 2",
            _tables(db),
        )
        text = plan.explain()
        assert "aggregate" in text.lower() or "Aggregate" in text
        out = plan.collect().to_numpy()
        assert out["item"].size == 2


class TestOrderByDeferredProjection:
    """ORDER BY may reference base / group-key columns the SELECT
    projection drops (standard SQL): the frontend sorts the stashed
    pre-projection relation and re-projects after the (sort, limit)
    tail. Not available under DISTINCT or set-op compounds."""

    def test_base_column_not_selected(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders ORDER BY qty DESC, oid LIMIT 7",
            _tables(db),
        ).collect()
        ref = [o for q, o in sorted(zip(-orders["qty"],
                                        orders["oid"]))][:7]
        np.testing.assert_array_equal(out.to_numpy()["oid"], ref)
        assert list(out.column_names) == ["oid"]  # qty not leaked

    def test_expression_over_base_column(self, db):
        orders, _ = db
        out = sql(
            "SELECT oid FROM orders ORDER BY qty % 5, oid LIMIT 9",
            _tables(db),
        ).collect()
        ref = [o for k, o in sorted(zip(orders["qty"] % 5,
                                        orders["oid"]))][:9]
        np.testing.assert_array_equal(out.to_numpy()["oid"], ref)

    def test_group_key_not_selected(self, db):
        orders, _ = db
        out = sql(
            "SELECT SUM(qty) AS s FROM orders GROUP BY cust "
            "ORDER BY cust DESC",
            _tables(db),
        ).collect()
        sums = {}
        for c, q in zip(orders["cust"], orders["qty"]):
            sums[c] = sums.get(c, 0) + q
        ref = [sums[c] for c in sorted(sums, reverse=True)]
        np.testing.assert_array_equal(out.to_numpy()["s"], ref)
        assert list(out.column_names) == ["s"]

    def test_unknown_column_typed_error(self, db):
        with pytest.raises(SqlError, match="ORDER BY column 'nope'"):
            sql("SELECT oid FROM orders ORDER BY nope", _tables(db))

    def test_distinct_restricts_to_output(self, db):
        with pytest.raises(SqlError, match="ORDER BY column 'qty'"):
            sql("SELECT DISTINCT item FROM orders ORDER BY qty",
                _tables(db))

    def test_compound_restricts_to_output(self, db):
        with pytest.raises(SqlError, match="ORDER BY column 'qty'"):
            sql("SELECT item FROM orders UNION ALL "
                "SELECT item FROM orders ORDER BY qty", _tables(db))

    def test_selected_columns_still_work_after_union(self, db):
        out = sql(
            "SELECT item FROM orders UNION SELECT item FROM orders "
            "ORDER BY item",
            _tables(db),
        ).collect()
        got = list(out.decode("item", out.to_numpy_codes("item"))
                   if hasattr(out, "to_numpy_codes") else
                   out.to_numpy()["item"])
        assert got == sorted(got)


class TestGroupingSets:
    """ROLLUP / CUBE / GROUPING SETS: UNION ALL of one aggregate per
    grouping set, rolled-up keys as typed NULLs, GROUPING() indicators
    (vs a Python dict oracle)."""

    def _oracle(self, db, sets):
        orders, _ = db
        rows = []
        for s in sets:
            groups = {}
            for i in range(N):
                key = tuple(orders[k][i] for k in s)
                groups.setdefault(key, []).append(orders["qty"][i])
            for key, qs in groups.items():
                row = dict(zip(s, key))
                rows.append((row, sum(qs), len(qs)))
        return rows

    def test_rollup_vs_oracle(self, db):
        out = sql(
            "SELECT cust, item, SUM(qty) AS s, COUNT(*) AS n, "
            "GROUPING(item) AS gi FROM orders GROUP BY ROLLUP(cust, item)",
            _tables(db),
        ).collect()
        d = out.to_numpy()
        ref = self._oracle(db, [["cust", "item"], ["cust"], []])
        assert len(d["s"]) == len(ref)
        got = set()
        mc, mi = out.to_numpy()["cust"], d["item"]
        cust_mask = np.ma.getmaskarray(d["cust"]) \
            if isinstance(d["cust"], np.ma.MaskedArray) else \
            np.zeros(len(d["s"]), bool)
        item_mask = np.ma.getmaskarray(d["item"]) \
            if isinstance(d["item"], np.ma.MaskedArray) else \
            np.zeros(len(d["s"]), bool)
        for i in range(len(d["s"])):
            c = None if cust_mask[i] else int(np.ma.getdata(d["cust"])[i])
            it = None if item_mask[i] else str(np.ma.getdata(d["item"])[i])
            got.add((c, it, int(d["s"][i]), int(d["n"][i]),
                     int(d["gi"][i])))
        want = set()
        for row, s, n in ref:
            want.add((row.get("cust"),
                      str(row["item"]) if "item" in row else None,
                      s, n, 0 if "item" in row else 1))
        assert got == want

    def test_cube_count(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, item, COUNT(*) AS n FROM orders "
            "GROUP BY CUBE(cust, item)",
            _tables(db),
        ).collect().to_numpy()
        ref = self._oracle(db, [["cust", "item"], ["cust"], ["item"], []])
        assert len(out["n"]) == len(ref)
        assert sum(out["n"]) == sum(n for _, _, n in ref)

    def test_grouping_sets_explicit(self, db):
        orders, _ = db
        out = sql(
            "SELECT item, SUM(qty) AS s FROM orders "
            "GROUP BY GROUPING SETS ((item), ())",
            _tables(db),
        ).collect().to_numpy()
        per_item = {}
        for it, q in zip(orders["item"], orders["qty"]):
            per_item[it] = per_item.get(it, 0) + int(q)
        assert len(out["s"]) == len(per_item) + 1
        assert int(out["s"][-1]) == int(orders["qty"].sum()) \
            or int(max(out["s"])) == int(orders["qty"].sum())

    def test_factor_cross_product(self, db):
        orders, _ = db
        # GROUP BY a, ROLLUP(b) == GROUPING SETS ((a, b), (a))
        a = sql("SELECT cust, item, COUNT(*) AS n FROM orders "
                "GROUP BY cust, ROLLUP(item) ORDER BY cust, item",
                _tables(db)).collect().to_numpy()
        b = sql("SELECT cust, item, COUNT(*) AS n FROM orders "
                "GROUP BY GROUPING SETS ((cust, item), (cust)) "
                "ORDER BY cust, item",
                _tables(db)).collect().to_numpy()
        np.testing.assert_array_equal(a["n"], b["n"])
        np.testing.assert_array_equal(a["cust"], b["cust"])

    def test_grouping_without_sets_rejected(self, db):
        with pytest.raises(SqlError, match="GROUPING"):
            sql("SELECT GROUPING(item) AS g FROM orders GROUP BY item",
                _tables(db))
        with pytest.raises(SqlError, match="GROUPING"):
            sql("SELECT GROUPING(item) AS g FROM orders", _tables(db))

    def test_rollup_with_expression_key(self, db):
        orders, _ = db
        out = sql(
            "SELECT qty % 3 AS m, COUNT(*) AS n FROM orders "
            "GROUP BY ROLLUP(qty % 3) ORDER BY m",
            _tables(db),
        ).collect().to_numpy()
        from collections import Counter
        c = Counter(int(q) % 3 for q in orders["qty"])
        assert sorted(out["n"])[-1] == N  # the grand total row
        assert len(out["n"]) == len(c) + 1


class TestNullsFirstLast:
    @pytest.fixture
    def nt(self):
        return {"t": Table({
            "k": np.ma.MaskedArray([3, 1, 2, 9, 5],
                                   [False, True, False, True, False]),
            "v": np.arange(5, dtype=np.int32)})}

    @pytest.mark.parametrize("q,want", [
        ("SELECT v FROM t ORDER BY k", [2, 0, 4, 1, 3]),
        ("SELECT v FROM t ORDER BY k NULLS FIRST", [1, 3, 2, 0, 4]),
        ("SELECT v FROM t ORDER BY k NULLS LAST", [2, 0, 4, 1, 3]),
        ("SELECT v FROM t ORDER BY k DESC", [1, 3, 4, 0, 2]),
        ("SELECT v FROM t ORDER BY k DESC NULLS LAST", [4, 0, 2, 1, 3]),
    ])
    def test_orders(self, nt, q, want):
        out = sql(q, nt).collect().to_numpy()
        np.testing.assert_array_equal(out["v"], want)

    def test_mixed_with_limit(self, nt):
        # an override blocks the top_k rewrite; semantics must hold
        plan = sql("SELECT v FROM t ORDER BY k NULLS FIRST LIMIT 3", nt)
        assert "top_k" not in plan.explain()
        np.testing.assert_array_equal(
            plan.collect().to_numpy()["v"], [1, 3, 2])

    def test_default_still_converts_to_topk(self, nt):
        plan = sql("SELECT v FROM t ORDER BY k LIMIT 2", nt)
        assert "top_k" in plan.explain()

    def test_bad_word_after_nulls(self, nt):
        with pytest.raises(SqlError, match="FIRST or LAST"):
            sql("SELECT v FROM t ORDER BY k NULLS MAYBE", nt)


class TestSelfJoin:
    def test_alias_on_plain_table(self, db):
        orders, _ = db
        # employee->manager style self-join: alias the same table twice;
        # the flat namespace resolves e.cust/m.oid to bare columns and
        # the join suffix renames right-side collisions
        t = Table({"id": np.arange(8, dtype=np.int32),
                   "par": np.array([0, 0, 1, 1, 2, 2, 3, 3], np.int32),
                   "v": np.arange(8, dtype=np.int32) * 10})
        out = sql(
            "SELECT id, par, v, v_r FROM t c JOIN t p ON c.par = p.id "
            "ORDER BY id",
            {"t": t}, capacity=16,
        ).collect().to_numpy()
        np.testing.assert_array_equal(out["v_r"], out["par"] * 10)
        np.testing.assert_array_equal(out["id"], np.arange(8))


class TestSqlCompleteness:
    """Simple CASE, COUNT(DISTINCT expr), IS [NOT] DISTINCT FROM,
    PERCENTILE_CONT."""

    @pytest.fixture
    def t5(self):
        return {"t": Table({
            "k": np.array([1, 2, 3, 2, 1], np.int32),
            "v": np.array([10., 20., 30., 40., 50.], np.float32)})}

    def test_simple_case(self, t5):
        out = sql("SELECT CASE k WHEN 1 THEN 10 WHEN 2 THEN 20 "
                  "ELSE 0 END AS c FROM t", t5).collect().to_numpy()
        np.testing.assert_array_equal(out["c"], [10, 20, 0, 20, 10])

    def test_count_distinct_expr(self, t5):
        out = sql("SELECT COUNT(DISTINCT k % 2) AS n FROM t",
                  t5).collect().to_numpy()
        np.testing.assert_array_equal(out["n"], [2])

    def test_is_distinct_from(self, t5):
        out = sql("SELECT v FROM t WHERE k IS DISTINCT FROM 2",
                  t5).collect().to_numpy()
        np.testing.assert_array_equal(out["v"], [10., 30., 50.])

    def test_is_not_distinct_from_nulls(self):
        tn = {"tn": Table({
            "a": np.ma.MaskedArray([1, 2, 3], [True, False, False]),
            "b": np.ma.MaskedArray([9, 2, 9], [True, False, True]),
            "v": np.arange(3, dtype=np.int32)})}
        out = sql("SELECT v FROM tn WHERE a IS NOT DISTINCT FROM b",
                  tn).collect().to_numpy()
        np.testing.assert_array_equal(out["v"], [0, 1])  # NULL==NULL
        out2 = sql("SELECT v FROM tn WHERE a IS DISTINCT FROM b",
                   tn).collect().to_numpy()
        np.testing.assert_array_equal(out2["v"], [2])

    def test_percentile_cont(self, t5):
        out = sql("SELECT k, PERCENTILE_CONT(v, 0.25) AS p, "
                  "PERCENTILE_DISC(v, 0.25) AS d FROM t "
                  "GROUP BY k ORDER BY k", t5).collect().to_numpy()
        np.testing.assert_allclose(out["p"], [20., 25., 30.])
        np.testing.assert_allclose(out["d"], [10., 20., 30.])

    def test_percentile_cont_ungrouped_oracle(self, db):
        orders, _ = db
        out = sql("SELECT PERCENTILE_CONT(price, 0.7) AS p FROM orders",
                  _tables(db)).collect().to_numpy()
        want = np.quantile(orders["price"].astype(np.float64), 0.7,
                           method="linear")
        np.testing.assert_allclose(out["p"][0], want, rtol=2e-5)

    def test_percentile_cont_float64_precision(self):
        # wide int64 values whose interpolation is exact in float64 and
        # wrong in float32 (f32 rounds 33554435 -> 33554436 above 2^25):
        # the x64 backend must interpolate in f64 (ops/query.py)
        t = {"t": Table({
            "v": np.array([33554432, 33554435], np.int64)})}
        out = sql("SELECT PERCENTILE_CONT(v, 0.5) AS p FROM t",
                  t).collect().to_numpy()
        assert out["p"].dtype == np.float64
        assert out["p"][0] == 33554433.5

    def test_percentile_cont_string_rejected(self, db):
        with pytest.raises(TypeError, match="string"):
            sql("SELECT PERCENTILE_CONT(item, 0.5) AS p FROM orders",
                _tables(db)).collect()


class TestSqlRangeFrames:
    def test_range_frame_vs_oracle(self, db):
        orders, _ = db
        out = sql(
            "SELECT cust, qty, "
            "SUM(qty) OVER (PARTITION BY cust ORDER BY qty "
            "RANGE BETWEEN 3 PRECEDING AND 2 FOLLOWING) AS rs, "
            "COUNT(*) OVER (PARTITION BY cust ORDER BY qty "
            "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS rc "
            "FROM orders",
            _tables(db),
        ).collect().to_numpy()
        C, Q = out["cust"], out["qty"]
        for i in range(0, N, 17):
            m = (C == C[i]) & (Q >= Q[i] - 3) & (Q <= Q[i] + 2)
            assert out["rs"][i] == Q[m].sum()
            m2 = (C == C[i]) & (Q >= Q[i] - 3) & (Q <= Q[i])
            assert out["rc"][i] == m2.sum()

    def test_range_interval_over_dates(self):
        d = np.array(["2026-01-01", "2026-01-03", "2026-01-04",
                      "2026-01-10"], "datetime64[D]")
        t = {"t": Table({"d": d, "v": np.array([1, 2, 4, 8], np.int32)})}
        out = sql(
            "SELECT SUM(v) OVER (ORDER BY d RANGE BETWEEN "
            "INTERVAL 2 DAY PRECEDING AND CURRENT ROW) AS s FROM t",
            t,
        ).collect().to_numpy()
        np.testing.assert_array_equal(out["s"], [1, 3, 6, 8])

    def test_range_errors(self, db):
        with pytest.raises(SqlError, match="RANGE frame needs ORDER BY"):
            sql("SELECT SUM(qty) OVER (RANGE BETWEEN 1 PRECEDING AND "
                "CURRENT ROW) AS s FROM orders", _tables(db))
        with pytest.raises(SqlError, match="MONTH/YEAR"):
            sql("SELECT SUM(qty) OVER (ORDER BY qty RANGE BETWEEN "
                "INTERVAL 1 MONTH PRECEDING AND CURRENT ROW) AS s "
                "FROM orders", _tables(db))
        with pytest.raises(SqlError, match="not supported as a window"):
            sql("SELECT VAR(qty) OVER (ORDER BY qty RANGE BETWEEN 1 "
                "PRECEDING AND CURRENT ROW) AS s FROM orders",
                _tables(db))
