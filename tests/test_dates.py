"""Date/timestamp support (dates.py + expr datefn + SQL grammar):
vectorized civil-calendar math vs the numpy/datetime oracle, Arrow-style
epoch-integer ingestion, EXTRACT / DATE_TRUNC / INTERVAL arithmetic.

The reference crate is numeric-only; dates belong to the north-star
query-engine surface (BASELINE.json)."""

import datetime

import numpy as np
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu import Table, col, sql
from radix_sort_tpu import dates as D
from radix_sort_tpu.sql import SqlError


def _date(z):
    return datetime.date(1970, 1, 1) + datetime.timedelta(int(z))


class TestCivilMath:
    @pytest.fixture
    def zs(self, rng):
        # ~1690..2240, crossing eras, centuries, leap rules
        return rng.integers(-102000, 99000, 4096).astype(np.int32)

    def test_civil_roundtrip_vs_numpy(self, zs):
        y, m, d = (np.asarray(a) for a in D.civil_from_days(zs))
        dt = zs.astype("datetime64[D]")
        np.testing.assert_array_equal(
            y, dt.astype("datetime64[Y]").astype(int) + 1970)
        np.testing.assert_array_equal(
            m, dt.astype("datetime64[M]").astype(int) % 12 + 1)
        np.testing.assert_array_equal(
            d, (dt - dt.astype("datetime64[M]")).astype(int) + 1)
        np.testing.assert_array_equal(
            np.asarray(D.days_from_civil(y, m, d)), zs)

    def test_fields_vs_datetime(self, zs):
        sample = zs[:256]
        dow = np.asarray(D.day_of_week(sample))
        doy = np.asarray(D.day_of_year(sample))
        wk = np.asarray(D.week(sample))
        qt = np.asarray(D.quarter(sample))
        for z, w, dy, wn, q in zip(sample, dow, doy, wk, qt):
            py = _date(z)
            assert w == py.isoweekday()
            assert dy == py.timetuple().tm_yday
            assert wn == py.isocalendar()[1]
            assert q == (py.month - 1) // 3 + 1

    @pytest.mark.parametrize("unit,np_unit", [
        ("month", "M"), ("year", "Y")])
    def test_trunc_vs_numpy(self, zs, unit, np_unit):
        got = np.asarray(D.trunc_days(unit, zs))
        want = (zs.astype("datetime64[D]")
                .astype(f"datetime64[{np_unit}]")
                .astype("datetime64[D]").astype(int))
        np.testing.assert_array_equal(got, want)

    def test_trunc_week_is_monday(self, zs):
        got = np.asarray(D.trunc_days("week", zs[:256]))
        for z, g in zip(zs[:256], got):
            assert _date(g).isoweekday() == 1 and 0 <= z - g < 7

    def test_add_months_clamps(self):
        cases = [("2025-01-31", 1, "2025-02-28"),
                 ("2024-01-31", 1, "2024-02-29"),
                 ("2024-02-29", 12, "2025-02-28"),
                 ("2024-03-31", -1, "2024-02-29"),
                 ("2026-08-20", 0, "2026-08-20")]
        for s, n, want in cases:
            z = D.parse_date(s)
            got = int(np.asarray(D.add_months(np.int32(z), n)))
            assert str(D.decode_days([got])[0]) == want


class TestIngestionAndExpr:
    @pytest.fixture
    def t(self):
        d = np.array(["2025-11-30", "2026-01-31", "2026-02-14",
                      "2026-08-20", "2024-02-29"], "datetime64[D]")
        return Table({"d": d, "v": np.arange(5, dtype=np.int32)})

    def test_datetime64_becomes_epoch_days(self, t):
        assert t["d"].dtype == np.int32
        assert str(D.decode_days(np.asarray(t["d"]))[3]) == "2026-08-20"

    def test_expr_methods(self, t):
        out = t.lazy().with_columns(
            y=col("d").year(), q=col("d").quarter(),
            mo=col("d").date_trunc("month"),
        ).collect().to_numpy()
        np.testing.assert_array_equal(out["y"],
                                      [2025, 2026, 2026, 2026, 2024])
        np.testing.assert_array_equal(out["q"], [4, 1, 1, 3, 1])
        assert str(D.decode_days(out["mo"])[1]) == "2026-01-01"

    def test_datefn_on_string_rejected(self):
        t = Table({"w": ["a", "b"], "v": np.arange(2)})
        with pytest.raises(TypeError, match="epoch-days"):
            t.lazy().with_columns(y=col("w").year()).collect()


class TestSqlDates:
    @pytest.fixture
    def tbl(self):
        d = np.array(["2025-11-30", "2026-01-31", "2026-02-14",
                      "2026-08-20", "2024-02-29"], "datetime64[D]")
        return {"t": Table({"d": d, "v": np.arange(5, dtype=np.int32)})}

    def test_literal_filter_and_extract(self, tbl):
        out = sql(
            "SELECT v, YEAR(d) AS y, EXTRACT(DOW FROM d) AS dw FROM t "
            "WHERE d >= DATE '2026-01-01' AND d < DATE '2026-08-21' "
            "ORDER BY d",
            tbl,
        ).collect().to_numpy()
        np.testing.assert_array_equal(out["v"], [1, 2, 3])
        np.testing.assert_array_equal(out["dw"], [6, 6, 4])

    def test_interval_arithmetic(self, tbl):
        out = sql(
            "SELECT d + INTERVAL 30 DAY AS d30, "
            "d + INTERVAL 1 MONTH AS dm, "
            "d - INTERVAL 1 YEAR AS dy FROM t ORDER BY v",
            tbl,
        ).collect().to_numpy()
        assert str(D.decode_days(out["dm"])[1]) == "2026-02-28"
        assert str(D.decode_days(out["d30"])[0]) == "2025-12-30"
        assert str(D.decode_days(out["dy"])[4]) == "2023-02-28"

    def test_group_by_trunc(self, tbl):
        out = sql(
            "SELECT DATE_TRUNC('year', d) AS yr, COUNT(*) AS n FROM t "
            "GROUP BY DATE_TRUNC('year', d) ORDER BY yr",
            tbl,
        ).collect().to_numpy()
        got = [str(x)[:4] for x in D.decode_days(out["yr"])]
        assert got == ["2024", "2025", "2026"]
        np.testing.assert_array_equal(out["n"], [1, 1, 3])

    def test_make_date_and_week(self, tbl):
        out = sql("SELECT v FROM t WHERE d = MAKE_DATE(2026, 2, 14)",
                  tbl).collect().to_numpy()
        np.testing.assert_array_equal(out["v"], [2])
        out2 = sql("SELECT WEEK(d) AS w FROM t ORDER BY v",
                   tbl).collect().to_numpy()
        assert out2["w"][3] == datetime.date(2026, 8, 20).isocalendar()[1]

    def test_errors(self, tbl):
        with pytest.raises(SqlError, match="DATE literal"):
            sql("SELECT v FROM t WHERE d = DATE 'not-a-date'", tbl)
        with pytest.raises(SqlError, match="EXTRACT field"):
            sql("SELECT EXTRACT(EON FROM d) AS x FROM t", tbl)
        with pytest.raises(SqlError, match="DATE_TRUNC unit"):
            sql("SELECT DATE_TRUNC('fortnight', d) AS x FROM t", tbl)
        with pytest.raises(SqlError, match="INTERVAL unit"):
            sql("SELECT d + INTERVAL 3 PARSEC AS x FROM t", tbl)

    def test_timestamp_literal_and_floor(self):
        # x64 is enabled in tests: timestamps are int64 microseconds
        ts = np.array(["2026-08-20T12:34:56", "2026-08-21T01:00:00"],
                      "datetime64[us]")
        t = {"t": Table({"ts": ts, "v": np.arange(2, dtype=np.int32)})}
        out = sql(
            "SELECT v, DAY(ts) AS dd FROM t "
            "WHERE ts >= TIMESTAMP '2026-08-20 13:00:00'",
            t,
        ).collect().to_numpy()
        np.testing.assert_array_equal(out["v"], [1])
        np.testing.assert_array_equal(out["dd"], [21])


class TestTimestamps:
    """int64 epoch-microsecond fields, truncation, INTERVAL arithmetic —
    x64 is enabled in tests."""

    @pytest.fixture
    def t(self):
        ts = np.array(["2026-08-20T12:34:56.789123",
                       "2026-08-20T23:59:59",
                       "2026-08-21T00:00:01",
                       "1969-12-31T23:00:30"], "datetime64[us]")
        return {"t": Table({"ts": ts,
                            "v": np.arange(4, dtype=np.int32)})}

    def test_fields(self, t):
        out = sql(
            "SELECT HOUR(ts) AS h, MINUTE(ts) AS m, SECOND(ts) AS s, "
            "EXTRACT(MILLISECOND FROM ts) AS ms, DAY(ts) AS d FROM t",
            t).collect().to_numpy()
        np.testing.assert_array_equal(out["h"], [12, 23, 0, 23])
        np.testing.assert_array_equal(out["m"], [34, 59, 0, 0])
        np.testing.assert_array_equal(out["s"], [56, 59, 1, 30])
        np.testing.assert_array_equal(out["ms"], [789, 0, 0, 0])
        np.testing.assert_array_equal(out["d"], [20, 20, 21, 31])

    def test_trunc_and_epoch(self, t):
        out = sql(
            "SELECT DATE_TRUNC('hour', ts) AS th, "
            "DATE_TRUNC('month', ts) AS tm, "
            "EXTRACT(EPOCH FROM ts) AS ep FROM t", t
        ).collect().to_numpy()
        assert str(D.decode_us(out["th"])[0]) == \
            "2026-08-20T12:00:00.000000"
        assert str(D.decode_us(out["tm"])[2]) == \
            "2026-08-01T00:00:00.000000"
        assert str(D.decode_us(out["th"])[3]) == \
            "1969-12-31T23:00:00.000000"
        assert out["ep"][3] == -3570  # floored, pre-epoch

    def test_interval_arithmetic(self, t):
        out = sql(
            "SELECT ts + INTERVAL 90 MINUTES AS t90, "
            "ts - INTERVAL 1 DAY AS td, "
            "ts + INTERVAL 1 MONTH AS tm FROM t", t
        ).collect().to_numpy()
        assert str(D.decode_us(out["t90"])[1]) == \
            "2026-08-21T01:29:59.000000"
        assert str(D.decode_us(out["td"])[2]) == \
            "2026-08-20T00:00:01.000000"
        # add_months keeps the time of day
        assert str(D.decode_us(out["tm"])[0]) == \
            "2026-09-20T12:34:56.789123"

    def test_range_frame_subday_interval(self, t):
        out = sql(
            "SELECT COUNT(*) OVER (ORDER BY ts RANGE BETWEEN "
            "INTERVAL 12 HOURS PRECEDING AND CURRENT ROW) AS c FROM t",
            t).collect().to_numpy()
        # input-aligned: the 1969 row is last; 00:00:01 sees both
        # 2026-08-20 rows within 12h
        np.testing.assert_array_equal(out["c"], [1, 2, 3, 1])

    def test_subday_fn_on_date_rejected(self):
        d = np.array(["2026-01-01"], "datetime64[D]")
        t = {"t": Table({"d": d, "v": np.arange(1, dtype=np.int32)})}
        with pytest.raises(TypeError, match="no time of day"):
            sql("SELECT HOUR(d) AS h FROM t", t).collect()
        with pytest.raises(TypeError, match="no time of day"):
            sql("SELECT d + INTERVAL 1 HOUR AS x FROM t", t).collect()
