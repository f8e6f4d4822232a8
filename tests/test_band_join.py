"""Band / non-equi / cross joins (ops.query.band_join, Table.join_band,
Table.cross_join, SQL ON inequality conjuncts).

Oracle pattern (SURVEY §4): every result is checked against a nested-loop
numpy oracle, including the output ORDER contract (left row major, right
band-sorted position minor). The reference crate has no joins at all —
this is north-star surface (BASELINE.json)."""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu.ops import query as Q
from radix_sort_tpu.table import Table
from radix_sort_tpu.sql import SqlError


def _oracle_pairs(lx, ry, op, lk=None, rk=None):
    """Nested-loop oracle in the engine's output order: left row major,
    right sorted (by (equi, band), stable) position minor."""
    cmp = {"lt": np.less, "le": np.less_equal,
           "gt": np.greater, "ge": np.greater_equal}[op]
    if rk is None:
        r_order = np.argsort(ry, kind="stable")
    else:
        r_order = np.lexsort((ry, rk))
    pairs = []
    for i in range(len(lx)):
        for j in r_order:
            if (lk is None or lk[i] == rk[j]) and cmp(lx[i], ry[j]):
                pairs.append((i, int(j)))
    return pairs


class TestEngineBandJoin:
    @pytest.mark.parametrize("op", ["lt", "le", "gt", "ge"])
    def test_ineq_oracle_int(self, rng, op):
        lx = rng.integers(-40, 40, 120).astype(np.int32)
        ry = rng.integers(-40, 40, 90).astype(np.int32)
        lv = np.arange(120, dtype=np.int32)
        rv = np.arange(90, dtype=np.int32)
        jl, jr, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op=op, capacity=16384)
        assert not bool(ovf)
        got = list(zip(np.asarray(jl)[:int(cnt)].tolist(),
                       np.asarray(jr)[:int(cnt)].tolist()))
        assert got == _oracle_pairs(lx, ry, op)

    @pytest.mark.parametrize("op", ["lt", "ge"])
    def test_ineq_oracle_float(self, rng, op):
        # negative floats: comparisons must happen in rank space
        lx = (rng.standard_normal(80) * 10).astype(np.float32)
        ry = (rng.standard_normal(60) * 10).astype(np.float32)
        lv = np.arange(80, dtype=np.int32)
        rv = np.arange(60, dtype=np.int32)
        jl, jr, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op=op, capacity=8192)
        got = list(zip(np.asarray(jl)[:int(cnt)].tolist(),
                       np.asarray(jr)[:int(cnt)].tolist()))
        assert got == _oracle_pairs(lx, ry, op)

    def test_ineq_u64_limb_keys(self, rng):
        lx = rng.integers(0, 1 << 63, 60, dtype=np.uint64)
        ry = rng.integers(0, 1 << 63, 50, dtype=np.uint64)
        lv = np.arange(60, dtype=np.int32)
        rv = np.arange(50, dtype=np.int32)
        jl, jr, cnt, _ = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op="lt", capacity=4096)
        got = list(zip(np.asarray(jl)[:int(cnt)].tolist(),
                       np.asarray(jr)[:int(cnt)].tolist()))
        assert got == _oracle_pairs(lx, ry, "lt")

    def test_empty_and_full_overlap(self):
        lx = np.array([1, 2, 3], np.int32)
        ry_lo = np.array([10, 20], np.int32)  # all left < all right
        lv = np.arange(3, dtype=np.int32)
        rv = np.arange(2, dtype=np.int32)
        jl, jr, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry_lo),
            jnp.asarray(rv), op="lt", capacity=16)
        assert int(cnt) == 6 and not bool(ovf)  # full overlap
        jl, jr, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry_lo),
            jnp.asarray(rv), op="gt", capacity=16)
        assert int(cnt) == 0 and not bool(ovf)  # empty overlap

    def test_between_oracle(self, rng):
        lx = rng.integers(0, 100, 100).astype(np.int32)
        rlo = rng.integers(0, 90, 70).astype(np.int32)
        rhi = (rlo + rng.integers(0, 25, 70)).astype(np.int32)
        rhi[::7] = rlo[::7] - 1  # reversed intervals match nothing
        lv = np.arange(100, dtype=np.int32)
        rv = np.arange(70, dtype=np.int32)
        jl, jr, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv),
            (jnp.asarray(rlo), jnp.asarray(rhi)), jnp.asarray(rv),
            op="between", capacity=16384)
        assert not bool(ovf)
        got = sorted(zip(np.asarray(jl)[:int(cnt)].tolist(),
                         np.asarray(jr)[:int(cnt)].tolist()))
        want = sorted((i, j) for i in range(100) for j in range(70)
                      if rlo[j] <= lx[i] <= rhi[j])
        assert got == want

    def test_between_candidate_bound_tight(self, rng):
        # non-overlapping intervals: the segmented running-max(hi) lower
        # bound makes candidates == matches, so capacity = n_l suffices
        # even though most intervals have lo <= x
        lx = rng.integers(0, 1000, 500).astype(np.int32)
        rlo = np.arange(0, 1000, 10).astype(np.int32)     # 100 tiers
        rhi = rlo + 9
        rv = np.arange(100, dtype=np.int32)
        jl, jr, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.arange(500, dtype=jnp.int32),
            (jnp.asarray(rlo), jnp.asarray(rhi)), jnp.asarray(rv),
            op="between", capacity=500)
        assert not bool(ovf)  # candidates == matches == 500
        assert int(cnt) == 500
        np.testing.assert_array_equal(np.asarray(jr)[:500], lx // 10)

    def test_between_inverted_intervals_adversarial(self, rng):
        # round-5 review repro: inverted intervals (hi < lo, which match
        # nothing) can push the running-max lower bound PAST the upper
        # bound; crossed ranges must clamp to empty, never emit negative
        # widths (duplicate-flooded / missing rows). Many trials — the
        # corruption was probabilistic (4/60 seeds).
        for trial in range(25):
            r2 = np.random.default_rng(1000 + trial)
            n_l, n_r = 40, 25
            lx = r2.integers(0, 60, n_l).astype(np.int32)
            rlo = r2.integers(0, 60, n_r).astype(np.int32)
            rhi = r2.integers(0, 60, n_r).astype(np.int32)  # ~half inverted
            jl, jr, cnt, ovf = Q.band_join(
                jnp.asarray(lx), jnp.arange(n_l, dtype=jnp.int32),
                (jnp.asarray(rlo), jnp.asarray(rhi)),
                jnp.arange(n_r, dtype=jnp.int32),
                op="between", capacity=2048)
            got = sorted(zip(np.asarray(jl)[:int(cnt)].tolist(),
                             np.asarray(jr)[:int(cnt)].tolist()))
            want = sorted((i, j) for i in range(n_l) for j in range(n_r)
                          if rlo[j] <= lx[i] <= rhi[j])
            assert got == want, (trial, len(got), len(want))
            assert not bool(ovf), trial

    def test_equi_conjunct(self, rng):
        lx = rng.integers(0, 50, 90).astype(np.int32)
        ry = rng.integers(0, 50, 80).astype(np.int32)
        lk = rng.integers(0, 6, 90).astype(np.uint32)
        rk = rng.integers(0, 6, 80).astype(np.uint32)
        lv = np.arange(90, dtype=np.int32)
        rv = np.arange(80, dtype=np.int32)
        jl, jr, cnt, _ = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op="le", capacity=8192,
            left_equi=[jnp.asarray(lk)], right_equi=[jnp.asarray(rk)])
        got = sorted(zip(np.asarray(jl)[:int(cnt)].tolist(),
                         np.asarray(jr)[:int(cnt)].tolist()))
        want = sorted((i, j) for i in range(90) for j in range(80)
                      if lk[i] == rk[j] and lx[i] <= ry[j])
        assert got == want

    def test_semi_anti_left(self, rng):
        lx = rng.integers(0, 20, 40).astype(np.int32)
        ry = rng.integers(5, 15, 30).astype(np.int32)
        lv = np.arange(40, dtype=np.int32)
        rv = np.arange(30, dtype=np.int32)
        has = np.array([bool((lx[i] < ry).any()) for i in range(40)])
        jl, _, cnt, _ = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op="lt", capacity=64, how="semi")
        np.testing.assert_array_equal(np.asarray(jl)[:int(cnt)],
                                      np.nonzero(has)[0])
        jl, _, cnt, _ = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op="lt", capacity=64, how="anti")
        np.testing.assert_array_equal(np.asarray(jl)[:int(cnt)],
                                      np.nonzero(~has)[0])
        jl, jr, cnt, _ = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lv), jnp.asarray(ry),
            jnp.asarray(rv), op="lt", capacity=4096, how="left")
        got = list(zip(np.asarray(jl)[:int(cnt)].tolist(),
                       np.asarray(jr)[:int(cnt)].tolist()))
        # left join: unmatched left rows emit one row with right value 0
        want, order = [], np.argsort(ry, kind="stable")
        for i in range(40):
            ms = [(i, int(rv[j])) for j in order if lx[i] < ry[j]]
            want += ms or [(i, 0)]
        assert got == want

    def test_capacity_overflow_flag(self):
        lx = np.zeros(8, np.int32)
        ry = np.ones(8, np.int32)
        _, _, cnt, ovf = Q.band_join(
            jnp.asarray(lx), jnp.asarray(lx), jnp.asarray(ry),
            jnp.asarray(ry), op="lt", capacity=16)
        assert bool(ovf) and int(cnt) == 16  # true result 64 pairs

    def test_errors(self):
        a = jnp.zeros((4,), jnp.int32)
        b = jnp.zeros((4,), jnp.int64)
        with pytest.raises(ValueError, match="op must be"):
            Q.band_join(a, a, a, a, op="ne", capacity=4)
        with pytest.raises(TypeError, match="share one dtype"):
            Q.band_join(a, a, b, b, op="lt", capacity=4)
        with pytest.raises(ValueError, match="between"):
            Q.band_join(a, a, a, a, op="between", capacity=4)
        with pytest.raises(ValueError, match='how="inner" only'):
            Q.band_join(a, a, (a, a), a, op="between", capacity=4,
                        how="semi")
        with pytest.raises(ValueError, match="equal length"):
            Q.band_join(a, jnp.zeros((3,), jnp.int32), a, a, op="lt",
                        capacity=4)


class TestTableBandJoin:
    def test_columns_and_order(self, rng):
        n_l, n_r = 60, 40
        lx = rng.integers(0, 50, n_l).astype(np.int32)
        ry = rng.integers(0, 50, n_r).astype(np.int32)
        t1 = Table({"x": lx, "a": np.arange(n_l, dtype=np.int32)})
        t2 = Table({"y": ry, "a": np.arange(n_r, dtype=np.int32) * 10})
        out, ovf = t1.join_band(t2, "x", "<", "y", capacity=4096)
        assert not bool(np.asarray(ovf))
        o = out.to_numpy()
        assert set(o) == {"x", "a", "y", "a_r"}  # suffix on collision
        want = _oracle_pairs(lx, ry, "lt")
        np.testing.assert_array_equal(o["a"], [i for i, _ in want])
        np.testing.assert_array_equal(o["a_r"],
                                      [10 * j for _, j in want])

    def test_null_band_matches_nothing(self):
        lx = np.ma.MaskedArray(np.array([5, 5, 5], np.int32),
                               [False, True, False])
        t1 = Table({"x": lx, "ia": np.arange(3, dtype=np.int32)})
        t2 = Table({"y": np.array([9], np.int32),
                    "ib": np.array([7], np.int32)})
        out, _ = t1.join_band(t2, "x", "<", "y", capacity=16)
        o = out.to_numpy()
        np.testing.assert_array_equal(o["ia"], [0, 2])

    def test_valid_prefix_inputs(self, rng):
        # filtered (flagged) inputs: padding rows must never pair
        lx = rng.integers(0, 30, 32).astype(np.int32)
        ry = rng.integers(0, 30, 16).astype(np.int32)
        t1 = Table({"x": lx, "ia": np.arange(32, dtype=np.int32)})
        t1 = t1.filter(lambda t: t["x"] % 2 == 0)
        t2 = Table({"y": ry, "ib": np.arange(16, dtype=np.int32)})
        t2 = t2.filter(lambda t: t["y"] % 3 == 0)
        out, _ = t1.join_band(t2, "x", ">=", "y", capacity=4096)
        o = out.to_numpy()
        keep_l = np.nonzero(lx % 2 == 0)[0]
        keep_r = ry[ry % 3 == 0]
        got = sorted(zip(o["ia"].tolist(), o["ib"].tolist()))
        want = sorted(
            (int(i), int(jb)) for i in keep_l
            for jb, y in zip(np.nonzero(ry % 3 == 0)[0], keep_r)
            if lx[i] >= y)
        assert got == want

    def test_between_with_equi_and_dates(self):
        d = np.array(["2024-01-05", "2024-02-10", "2024-03-20"],
                     "datetime64[D]")
        lo = np.array(["2024-01-01", "2024-03-01"], "datetime64[D]")
        hi = np.array(["2024-01-31", "2024-03-31"], "datetime64[D]")
        t1 = Table({"d": d, "ia": np.arange(3, dtype=np.int32)})
        t2 = Table({"lo": lo, "hi": hi,
                    "per": np.array([1, 3], np.int32)})
        out, _ = t1.join_band(t2, "d", "between", ("lo", "hi"),
                              capacity=64)
        o = out.to_numpy()
        np.testing.assert_array_equal(o["ia"], [0, 2])
        np.testing.assert_array_equal(o["per"], [1, 3])

    def test_left_join_null_masks(self):
        t1 = Table({"x": np.array([1, 100], np.int32),
                    "ia": np.array([0, 1], np.int32)})
        t2 = Table({"y": np.array([5, 7], np.int32),
                    "ib": np.array([10, 11], np.int32)})
        out, _ = t1.join_band(t2, "x", "<", "y", capacity=16, how="left")
        o = out.to_numpy()
        np.testing.assert_array_equal(o["ia"], [0, 0, 1])
        assert isinstance(o["ib"], np.ma.MaskedArray)
        np.testing.assert_array_equal(np.ma.getmaskarray(o["ib"]),
                                      [False, False, True])

    def test_string_band_rejected(self):
        t1 = Table({"s": np.array(["a", "b"]),
                    "i": np.arange(2, dtype=np.int32)})
        t2 = Table({"y": np.array([1, 2], np.int32)})
        with pytest.raises(TypeError, match="string"):
            t1.join_band(t2, "s", "<", "y", capacity=4)

    def test_capacity_required(self):
        t = Table({"x": np.arange(4, dtype=np.int32)})
        with pytest.raises(TypeError, match="capacity"):
            t.join_band(t, "x", "<", "x")

    def test_cross_join(self, rng):
        t1 = Table({"a": np.arange(5, dtype=np.int32)})
        t1 = t1.filter(lambda t: t["a"] < 3)
        t2 = Table({"a": np.arange(4, dtype=np.int32) * 2})
        out, ovf = t1.cross_join(t2)
        o = out.to_numpy()
        assert not bool(np.asarray(ovf))
        got = list(zip(o["a"].tolist(), o["a_r"].tolist()))
        assert got == [(i, 2 * j) for i in range(3) for j in range(4)]


class TestSqlBandJoin:
    def _db(self, rng):
        n_l, n_r = 120, 60
        return {
            "o": Table({"oid": np.arange(n_l, dtype=np.int32),
                        "cust": rng.integers(0, 6, n_l).astype(np.int32),
                        "price": rng.integers(0, 300, n_l)
                        .astype(np.int32)}),
            "t": Table({"cust": np.arange(6, dtype=np.int32).repeat(2),
                        "lo": np.tile(np.array([0, 150], np.int32), 6),
                        "hi": np.tile(np.array([149, 299], np.int32), 6),
                        "tier": np.tile(np.array([1, 2], np.int32), 6)}),
        }

    def test_between_with_equi(self, rng):
        db = self._db(rng)
        q = rst.sql("SELECT oid, tier FROM o JOIN t ON o.cust = t.cust "
                    "AND o.price BETWEEN t.lo AND t.hi ORDER BY oid",
                    db, capacity=4096)
        assert "join_band[inner on cust; price between lo and hi]" \
            in q.explain()
        out = q.collect().to_numpy()
        price = np.asarray(db["o"]["price"])
        np.testing.assert_array_equal(out["oid"], np.arange(120))
        np.testing.assert_array_equal(out["tier"],
                                      1 + (price >= 150).astype(int))

    def test_theta_and_mirror(self, rng):
        a = Table({"x": rng.integers(0, 40, 30).astype(np.int32),
                   "ia": np.arange(30, dtype=np.int32)})
        b = Table({"y": rng.integers(0, 40, 20).astype(np.int32),
                   "ib": np.arange(20, dtype=np.int32)})
        xa, yb = np.asarray(a["x"]), np.asarray(b["y"])
        want = sorted((i, j) for i in range(30) for j in range(20)
                      if xa[i] >= yb[j])
        for sql_text in (
                "SELECT ia, ib FROM a JOIN b ON a.x >= b.y",
                "SELECT ia, ib FROM a JOIN b ON b.y <= a.x"):
            out = rst.sql(sql_text, {"a": a, "b": b},
                          capacity=2048).collect().to_numpy()
            assert sorted(zip(out["ia"].tolist(),
                              out["ib"].tolist())) == want

    def test_cross_join(self):
        a = Table({"ia": np.arange(3, dtype=np.int32)})
        b = Table({"ib": np.arange(4, dtype=np.int32)})
        out = rst.sql("SELECT ia, ib FROM a CROSS JOIN b",
                      {"a": a, "b": b}).collect().to_numpy()
        assert len(out["ia"]) == 12

    def test_band_errors(self):
        a = Table({"x": np.arange(3, dtype=np.int32)})
        b = Table({"y": np.arange(3, dtype=np.int32),
                   "z": np.arange(3, dtype=np.int32)})
        db = {"a": a, "b": b}
        with pytest.raises(SqlError, match="at most one band"):
            rst.sql("SELECT x FROM a JOIN b ON a.x < b.y AND a.x > b.z",
                    db, capacity=8).collect()
        with pytest.raises(SqlError, match="band"):
            rst.sql("SELECT x FROM a FULL JOIN b ON a.x < b.y",
                    db, capacity=8).collect()
        with pytest.raises(SqlError, match="INNER-only"):
            rst.sql("SELECT x FROM a LEFT JOIN b ON a.x BETWEEN b.y "
                    "AND b.z", db, capacity=8).collect()
        with pytest.raises(SqlError, match="LEFT table"):
            rst.sql("SELECT x FROM a JOIN b ON b.y BETWEEN a.x AND a.x",
                    db, capacity=8).collect()

    def test_dist_band_broadcast(self, rng):
        # a DistTable left side broadcast-band-joins a replicated Table
        # right side through SQL (capacity_per_shard routes per backend)
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        lx = rng.integers(0, 40, 32).astype(np.int32)
        dt = rst.DistTable(
            {"x": lx, "ia": np.arange(32, dtype=np.int32)}, mesh)
        b = Table({"y": np.array([10, 25], np.int32),
                   "ib": np.array([1, 2], np.int32)})
        out = rst.sql("SELECT ia, ib FROM d JOIN b ON d.x < b.y",
                      {"d": dt, "b": b},
                      capacity_per_shard=64).collect()
        got = sorted(zip(*(out.to_table().to_numpy()[c]
                           for c in ("ia", "ib"))))
        want = sorted((i, int(ib)) for i in range(32)
                      for y, ib in ((10, 1), (25, 2)) if lx[i] < y)
        assert [tuple(map(int, g)) for g in got] == want

    def test_dist_band_both_sides_filtered(self, rng):
        # round-5 review repro: left padding (flag 1) must never
        # equi-match right padding — the right side flags padding 2
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
        dt = rst.DistTable(
            {"x": np.array([5, 6, 7, 8, 100, 100, 100, 100], np.int32),
             "ia": np.arange(8, dtype=np.int32)}, mesh)
        dt = dt.filter(lambda t: t["x"] < 10)
        rt = Table({"y": np.array([10, 10, 200, 200], np.int32),
                    "pay": np.array([111, 222, 333, 444], np.int32)})
        rt = rt.filter(lambda t: t["pay"] < 300)
        out, ovf = dt.join_band(rt, "x", "<", "y",
                                capacity_per_shard=32)
        got = out.to_table().to_numpy()
        assert len(got["ia"]) == 8  # 4 kept left rows x 2 kept right
        assert set(got["pay"].tolist()) == {111, 222}
        assert (got["x"] < 10).all()

    def test_dist_band_nullable_band_col_and_no_false_overflow(self, rng):
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:2]), ("x",))
        # nullable right BAND column: NULL thresholds match nothing (not
        # a TypeError — only nullable PAYLOADS are rejected)
        dt = rst.DistTable(
            {"x": np.arange(8, dtype=np.int32),
             "ia": np.arange(8, dtype=np.int32)}, mesh)
        rt = Table({"y": np.ma.MaskedArray(
            np.array([4, 99], np.int32), [False, True]),
            "ib": np.array([1, 2], np.int32)})
        out, ovf = dt.join_band(rt, "x", "<", "y",
                                capacity_per_shard=32)
        got = out.to_table().to_numpy()
        assert got["ia"].tolist() == [0, 1, 2, 3]  # x < 4 only
        assert set(got["ib"].tolist()) == {1}
        # left join on a filtered left side: padding rows may transit
        # the engine but must not raise a spurious overflow when every
        # REAL result row fits the capacity
        dtf = rst.DistTable(
            {"x": np.arange(8, dtype=np.int32),
             "ia": np.arange(8, dtype=np.int32)}, mesh)
        dtf = dtf.filter(lambda t: t["x"] < 2)  # 2 real rows
        rt2 = Table({"y": np.array([10], np.int32),
                     "ib": np.array([5], np.int32)})
        out2, ovf2 = dtf.join_band(rt2, "x", "<", "y",
                                   capacity_per_shard=4, how="left")
        assert not bool(np.asarray(ovf2))
        got2 = out2.to_table().to_numpy()
        assert sorted(got2["ia"].tolist()) == [0, 1]

    def test_dist_cross_rejected(self, rng):
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
        dt = rst.DistTable(
            {"x": np.arange(8, dtype=np.int32)}, mesh)
        b = Table({"y": np.arange(4, dtype=np.int32)})
        with pytest.raises(TypeError, match="single-chip"):
            rst.sql("SELECT x FROM d CROSS JOIN b",
                    {"d": dt, "b": b}).collect()
