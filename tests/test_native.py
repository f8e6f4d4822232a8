"""Native host runtime tests: C++ LSD radix sort + dataset IO.

The native kernel is the host-side equivalent of the reference's production
engine; the oracle pattern matches its test suite (src/radix_sort/tests.rs):
bit-exact equality against numpy's stable comparison sort across the type
matrix, float specials included.
"""

import numpy as np
import pytest

from radix_sort_tpu.native import host_sort, host_sort_pairs, native_available
from radix_sort_tpu.utils import io as rio


def test_native_compiles():
    # g++ is part of the supported environment; if this fails the fallback
    # still keeps the API working, but we want to know.
    assert native_available()


@pytest.mark.parametrize(
    "dtype", [np.uint8, np.uint16, np.uint32, np.uint64,
              np.int8, np.int16, np.int32, np.int64]
)
def test_int_type_matrix(rng, dtype):
    info = np.iinfo(dtype)
    x = rng.integers(info.min, info.max, 100_000, dtype=dtype, endpoint=True)
    np.testing.assert_array_equal(host_sort(x), np.sort(x, kind="stable"))


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_float_total_order(rng, dtype):
    x = rng.standard_normal(100_000).astype(dtype)
    specials = np.array(
        [0.0, -0.0, np.nan, -np.nan, np.inf, -np.inf], dtype=dtype
    )
    x[rng.integers(0, len(x), len(specials))] = specials
    got = host_sort(x)
    # total_cmp oracle: the order-preserving transform, compared UNSIGNED
    isz = np.dtype(dtype).itemsize
    b = x.view(np.dtype(f"i{isz}"))
    mask = (b >> (isz * 8 - 1)) | np.iinfo(b.dtype).min
    ref = x[np.argsort((b ^ mask).view(f"u{isz}"), kind="stable")]
    np.testing.assert_array_equal(got.view(b.dtype), ref.view(b.dtype))


def test_pairs_stability(rng):
    keys = rng.integers(0, 100, 50_000).astype(np.uint32)
    vals = np.arange(50_000, dtype=np.uint32)
    sk, sv = host_sort_pairs(keys, vals)
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(sk, keys[perm])
    np.testing.assert_array_equal(sv, vals[perm])


def test_pairs_u64(rng):
    keys = rng.integers(0, 2**64, 30_000, dtype=np.uint64)
    vals = rng.integers(0, 2**64, 30_000, dtype=np.uint64)
    sk, sv = host_sort_pairs(keys, vals)
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(sk, keys[perm])
    np.testing.assert_array_equal(sv, vals[perm])


def test_duplicate_heavy(rng):
    x = rng.integers(0, 4, 200_000).astype(np.uint64)
    np.testing.assert_array_equal(host_sort(x), np.sort(x, kind="stable"))


class TestIO:
    def test_roundtrip(self, rng, tmp_path):
        arr = rng.integers(0, 2**64, 10_000, dtype=np.uint64)
        p = str(tmp_path / "data.bin")
        rio.write_raw(p, arr)
        np.testing.assert_array_equal(rio.read_raw(p), arr)

    def test_gen_data_deterministic(self, tmp_path):
        p1 = str(tmp_path / "a.bin")
        p2 = str(tmp_path / "b.bin")
        a = rio.gen_data(p1, 4096, np.uint32, "zipf", seed=7)
        b = rio.gen_data(p2, 4096, np.uint32, "zipf", seed=7)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(rio.read_raw(p1), a)

    def test_bad_dist_raises(self, tmp_path):
        with pytest.raises(ValueError, match="dist must be one of"):
            rio.gen_data(str(tmp_path / "x.bin"), 16, dist="normal")


class TestNativeCSV:
    """csv_loader.cpp: tokenizer (RFC4180 quoting), whole-column type
    inference, engine-native dictionary encoding, NULL masks."""

    def _write(self, tmp_path, text):
        import os
        p = os.path.join(tmp_path, "t.csv")
        with open(p, "w") as f:
            f.write(text)
        return p

    def test_types_quoting_nulls(self, tmp_path):
        from radix_sort_tpu.native.csvio import (parse_csv,
                                                 csv_native_available)
        if not csv_native_available():
            pytest.skip("no g++")
        p = self._write(
            tmp_path,
            'city,v,w,note\n'
            'osaka,3,1.5,"hi, there"\n'
            'lima,,2.5,"say ""ok"""\n'
            'osaka,9,.5e1,\n'
            ' lima ,1,-2,plain\n')
        cols, dicts, masks = parse_csv(p)
        assert cols["v"].dtype == np.int64
        assert masks["v"].tolist() == [False, True, False, False]
        assert cols["w"].dtype == np.float64
        assert cols["w"].tolist() == [1.5, 2.5, 5.0, -2.0]
        # sorted order-preserving vocabulary, "" at index 0
        assert dicts["city"].tolist() == ["", "lima", "osaka"]
        assert cols["city"].tolist() == [2, 1, 2, 1]  # autostripped
        assert dicts["note"][cols["note"][0]] == "hi, there"
        assert dicts["note"][cols["note"][1]] == 'say "ok"'
        assert masks["note"].tolist() == [False, False, True, False]

    def test_date_timestamp_inference(self, tmp_path):
        from radix_sort_tpu.native.csvio import (parse_csv,
                                                 csv_native_available)
        if not csv_native_available():
            pytest.skip("no g++")
        p = self._write(
            tmp_path,
            "d,ts,promo,bad_day,mixed,quoted\n"
            "2024-01-05,2024-01-05 10:30:00,2024-01-01,2023-02-29,"
            "2024-01-01,\"2024-01-01\"\n"
            "2023-12-31,2023-12-31T23:59:59.123456,"
            "2024-06-01T01:02:03,2024-13-01,7,\"2024-01-02\"\n"
            ",2024-02-29 00:00:00.1234567,2020-02-29,2024-01-32,x,"
            "\"2024-01-03\"\n")
        cols, dicts, masks = parse_csv(p)
        # pure ISO dates -> date32, empty = NULL
        assert cols["d"].dtype == np.dtype("datetime64[D]")
        assert cols["d"][0] == np.datetime64("2024-01-05")
        assert masks["d"].tolist() == [False, False, True]
        # timestamps (space or T separator, fraction truncates past us)
        assert cols["ts"].dtype == np.dtype("datetime64[us]")
        assert cols["ts"][1] == np.datetime64("2023-12-31T23:59:59.123456")
        assert cols["ts"][2] == np.datetime64("2024-02-29T00:00:00.123456")
        # dates mixed with timestamps promote to timestamp (midnight)
        assert cols["promo"].dtype == np.dtype("datetime64[us]")
        assert cols["promo"][0] == np.datetime64("2024-01-01T00:00:00")
        # calendar-invalid "dates" (non-leap Feb 29, month 13, day 32)
        # and date/garbage mixes stay strings
        assert "bad_day" in dicts and "mixed" in dicts
        # quoted fields are text by intent even if date-shaped
        assert "quoted" in dicts

    def test_sql_date_query_on_csv_no_casts(self, tmp_path):
        from radix_sort_tpu.native.csvio import csv_native_available
        if not csv_native_available():
            pytest.skip("no g++")
        import radix_sort_tpu as rst
        from radix_sort_tpu.table import Table
        p = self._write(
            tmp_path,
            "id,d,amt\n"
            "1,2024-01-05,10\n"
            "2,2024-02-10,20\n"
            "3,2023-11-30,30\n"
            "4,2024-02-29,40\n")
        t = Table.from_csv(p)
        out = rst.sql(
            "SELECT DATE_TRUNC('month', d) AS m, SUM(amt) AS s FROM t "
            "WHERE d >= DATE '2024-01-01' GROUP BY m ORDER BY m",
            {"t": t}).collect().to_numpy()
        assert out["s"].tolist() == [10, 60]

    def test_overlong_numeric_field_degrades_to_string(self, tmp_path):
        # round-5 review repro: a numeric field past the 63-char parser
        # cap must type the column STRING (data preserved), never
        # resolve float and silently load 0.0
        from radix_sort_tpu.native.csvio import (parse_csv,
                                                 csv_native_available)
        if not csv_native_available():
            pytest.skip("no g++")
        tiny = "0." + "0" * 70 + "1"  # 73 chars = 1e-71
        p = self._write(tmp_path, f"f\n{tiny}\n2.5\n")
        cols, dicts, masks = parse_csv(p)
        assert "f" in dicts  # string column, not float
        assert dicts["f"][cols["f"][0]] == tiny

    def test_native_intern_encode_matches_np_unique(self, rng):
        # strings.encode's native intern path must be bit-identical to
        # the np.unique fallback (sorted vocab, "" at 0, same codes)
        from radix_sort_tpu.native.csvio import csv_native_available
        from radix_sort_tpu import strings as S
        if not csv_native_available():
            pytest.skip("no g++")
        raw = np.char.add(
            "w", rng.integers(0, 500, 20000).astype(np.str_))
        raw[3] = ""
        codes, vocab = S.encode(raw)  # native path (lib available)
        v2, inv = np.unique(raw, return_inverse=True)
        assert vocab.tolist() == v2.tolist() and vocab[0] == ""
        np.testing.assert_array_equal(codes, inv)
        np.testing.assert_array_equal(vocab[codes], raw)

    def test_int_promotes_to_float_then_string(self, tmp_path):
        from radix_sort_tpu.native.csvio import (parse_csv,
                                                 csv_native_available)
        if not csv_native_available():
            pytest.skip("no g++")
        p = self._write(tmp_path, "a,b\n1,1\n2.5,x\n3,4\n")
        cols, dicts, _ = parse_csv(p)
        assert cols["a"].dtype == np.float64
        assert cols["a"].tolist() == [1.0, 2.5, 3.0]
        assert "b" in dicts
        assert dicts["b"][cols["b"]].tolist() == ["1", "x", "4"]

    def test_malformed_raises(self, tmp_path):
        from radix_sort_tpu.native.csvio import (parse_csv,
                                                 csv_native_available)
        if not csv_native_available():
            pytest.skip("no g++")
        p = self._write(tmp_path, "a,b\n1,2\n3\n")
        with pytest.raises(RuntimeError, match="fields"):
            parse_csv(p)
        p2 = self._write(tmp_path, 'a\n"unterminated\n')
        with pytest.raises(RuntimeError, match="unterminated"):
            parse_csv(p2)

    def test_table_from_csv_nulls_and_quotes(self, tmp_path):
        from radix_sort_tpu.table import Table
        p = self._write(
            tmp_path,
            "city,v\nosaka,3\nlima,\nosaka,9\n")
        t = Table.from_csv(p)
        out = t.aggregate("city", {"n": ("count", "v"),
                                   "s": ("sum", "v")}).to_numpy()
        assert out["city"].tolist() == ["lima", "osaka"]
        assert out["n"].tolist() == [0, 2]  # NULL v does not count
        assert np.ma.getdata(out["s"]).tolist()[1] == 12
