"""Scalar string functions (expr.py strfn/strnum/strbool/concat +
strings.py host vocabulary transforms): every function vs the Python
string oracle, comparisons/LIKE over computed string expressions, CASE
and COALESCE over strings, NULL propagation, dictionary attachment
through the lazy planner, and the SQL spellings (||, CONCAT, CAST,
UPPER/.../STRPOS).

The reference crate (jgrodzki/radix_sort) is numeric-only; this surface
belongs to the north-star query engine (BASELINE.json)."""

import numpy as np
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu import Table, col, lit, concat, sql, where, null
from radix_sort_tpu import strings as S
from radix_sort_tpu.sql import SqlError

WORDS = ["  Pear ", "apple", "FIG", "apple", "Kiwi-1", "", "apple", "plum"]
NUMS = [3, 1, 4, 1, 5, 9, 2, 6]


@pytest.fixture()
def t():
    return Table({"w": WORDS, "v": np.array(NUMS, np.int32)})


def _strings(table, name):
    return list(table.to_numpy()[name])


def _apply(table, e):
    """Evaluate a string-valued expression through the lazy planner and
    decode the resulting column (the user-facing path)."""
    out = table.lazy().with_columns(r=e).collect()
    return _strings(out, "r")


# ---------------------------------------------------------------------------
# string -> string transforms vs the Python oracle
# ---------------------------------------------------------------------------


class TestTransforms:
    CASES = [
        (lambda e: e.upper(), lambda s: s.upper()),
        (lambda e: e.lower(), lambda s: s.lower()),
        (lambda e: e.trim(), lambda s: s.strip(" ")),
        (lambda e: e.ltrim(), lambda s: s.lstrip(" ")),
        (lambda e: e.rtrim(), lambda s: s.rstrip(" ")),
        (lambda e: e.trim("p "), lambda s: s.strip("p ")),
        (lambda e: e.substr(2), lambda s: s[1:]),
        (lambda e: e.substr(2, 3), lambda s: s[1:4]),
        (lambda e: e.replace("p", "_"), lambda s: s.replace("p", "_")),
        (lambda e: e.left(3), lambda s: s[:3]),
        (lambda e: e.left(-2), lambda s: s[:max(len(s) - 2, 0)]),
        (lambda e: e.right(3), lambda s: s[max(len(s) - 3, 0):]),
        (lambda e: e.right(-2), lambda s: s[2:]),
        (lambda e: e.reverse(), lambda s: s[::-1]),
        (lambda e: e.lpad(4, "*"),
         lambda s: s[:4] if len(s) >= 4 else "*" * (4 - len(s)) + s),
        (lambda e: e.rpad(4, "*"),
         lambda s: s[:4] if len(s) >= 4 else s + "*" * (4 - len(s))),
    ]

    @pytest.mark.parametrize("build,oracle", CASES)
    def test_vs_oracle(self, t, build, oracle):
        assert _apply(t, build(col("w"))) == [oracle(s) for s in WORDS]

    def test_composition(self, t):
        e = col("w").trim().upper().substr(1, 3)
        assert _apply(t, e) == [s.strip(" ").upper()[:3] for s in WORDS]

    def test_output_dictionary_is_sorted_with_empty(self, t):
        out = t.lazy().with_columns(r=col("w").upper()).collect()
        vocab = out.dictionary("r")
        assert vocab[0] == ""
        assert list(vocab) == sorted(set(vocab))

    def test_substr_start_zero_rejected(self, t):
        with pytest.raises(ValueError, match="1-based"):
            _apply(t, col("w").substr(0))

    def test_strfn_on_numeric_rejected(self, t):
        with pytest.raises(TypeError, match="string-valued"):
            _apply(t, col("v").upper())


# ---------------------------------------------------------------------------
# string -> number / bool
# ---------------------------------------------------------------------------


class TestPredicatesAndNumbers:
    def test_length(self, t):
        out = t.lazy().with_columns(n=col("w").length()).collect()
        assert list(out.to_numpy()["n"]) == [len(s) for s in WORDS]

    def test_strpos(self, t):
        out = t.lazy().with_columns(n=col("w").strpos("p")).collect()
        assert list(out.to_numpy()["n"]) == [s.find("p") + 1
                                              for s in WORDS]

    @pytest.mark.parametrize("build,oracle", [
        (lambda e: e.starts_with("a"), lambda s: s.startswith("a")),
        (lambda e: e.ends_with("e"), lambda s: s.endswith("e")),
        (lambda e: e.contains("i"), lambda s: "i" in s),
    ])
    def test_bool_fns(self, t, build, oracle):
        kept = t.filter(build(col("w")).evaluate(t))
        assert _strings(kept, "w") == [s for s in WORDS if oracle(s)]

    def test_filter_on_length(self, t):
        kept = t.lazy().filter(col("w").length() > 4).collect()
        assert _strings(kept, "w") == [s for s in WORDS if len(s) > 4]

    def test_like_over_computed(self, t):
        kept = t.lazy().filter(col("w").upper().like("A%")).collect()
        assert _strings(kept, "w") == [s for s in WORDS
                                       if s.upper().startswith("A")]


# ---------------------------------------------------------------------------
# comparisons over computed string expressions
# ---------------------------------------------------------------------------


class TestComparisons:
    def test_eq_literal(self, t):
        kept = t.lazy().filter(col("w").upper() == "APPLE").collect()
        assert _strings(kept, "w") == [s for s in WORDS
                                       if s.upper() == "APPLE"]

    @pytest.mark.parametrize("op", ["lt", "le", "gt", "ge"])
    def test_order_vs_literal(self, t, op):
        import operator
        py = {"lt": operator.lt, "le": operator.le,
              "gt": operator.gt, "ge": operator.ge}[op]
        e = py(col("w").lower(), lit("apple"))
        kept = t.lazy().filter(e).collect()
        assert _strings(kept, "w") == [s for s in WORDS
                                       if py(s.lower(), "apple")]

    def test_chain_vs_chain(self, t):
        # UPPER(w) == TRIM(w) rows: unified output vocabularies
        kept = t.lazy().filter(col("w").upper()
                               == col("w").trim()).collect()
        assert _strings(kept, "w") == [s for s in WORDS
                                       if s.upper() == s.strip(" ")]

    def test_literal_on_left(self, t):
        kept = t.lazy().filter(lit("apple") == col("w").lower()).collect()
        assert _strings(kept, "w") == [s for s in WORDS
                                       if s.lower() == "apple"]

    def test_numeric_vs_string_literal_rejected(self, t):
        with pytest.raises(TypeError, match="non-string"):
            t.lazy().filter(col("v") == "apple").collect()

    def test_string_vs_number_rejected(self, t):
        with pytest.raises(TypeError, match="non-string"):
            t.lazy().filter(col("w").upper() == 3).collect()

    def test_arith_on_string_fn_rejected(self, t):
        with pytest.raises(TypeError, match="not defined for"):
            t.lazy().with_columns(r=col("w").upper() + 1).collect()

    def test_cast_of_string_parses_vocab(self, t):
        # CAST over strings parses the vocabulary: every WORD here is
        # non-numeric, so the whole column comes back NULL
        out = t.lazy().with_columns(
            r=col("w").cast("int32")).collect().to_numpy()
        assert np.ma.getmaskarray(out["r"]).all()


# ---------------------------------------------------------------------------
# CONCAT / ||
# ---------------------------------------------------------------------------


class TestConcat:
    def test_prefix_suffix(self, t):
        e = concat("<", col("w"), ">")
        assert _apply(t, e) == [f"<{s}>" for s in WORDS]

    def test_with_transform(self, t):
        e = concat(col("w").upper(), "!")
        assert _apply(t, e) == [s.upper() + "!" for s in WORDS]

    def test_literal_folding(self):
        e = concat("a", "b", "c")
        assert e.kind == "lit" and e.args[0] == "abc"

    def test_two_columns_cross_product(self, t):
        w2 = [w[::-1] for w in WORDS]
        t2 = t.with_columns(w2=np.array(w2))
        got = _apply(t2, concat(col("w"), "-", col("w2")))
        assert got == [f"{a}-{b}" for a, b in zip(WORDS, w2)]
        # the output dictionary holds every cross combination, sorted
        out = t2.lazy().with_columns(r=concat(col("w"),
                                              col("w2"))).collect()
        vocab = out.dictionary("r")
        assert list(vocab) == sorted(set(vocab)) and vocab[0] == ""

    def test_three_way_cross_with_transform(self, t):
        w2 = ["x", "y", "z", "x", "y", "z", "x", "y"]
        t2 = t.with_columns(w2=np.array(w2))
        got = _apply(t2, concat(col("w2").upper(), ":", col("w"), ":",
                                col("w2")))
        assert got == [f"{b.upper()}:{a}:{b}"
                       for a, b in zip(WORDS, w2)]

    def test_cross_product_bound(self, t):
        big = [f"s{i}" for i in range(2048)]
        t2 = rst.Table({"a": np.array(big), "b": np.array(big)})
        with pytest.raises(TypeError, match="cross product"):
            t2.lazy().with_columns(r=concat(col("a"),
                                            col("b"))).collect()

    def test_non_string_operand_rejected(self, t):
        with pytest.raises(TypeError, match="string-valued or string"):
            t.lazy().with_columns(r=concat(col("w"), col("v"))).collect()


# ---------------------------------------------------------------------------
# CASE / COALESCE over strings, NULL propagation
# ---------------------------------------------------------------------------


class TestStringBranches:
    def test_case_over_strings(self, t):
        e = where(col("v") > 3, col("w").upper(), lit("small"))
        assert _apply(t, e) == [s.upper() if v > 3 else "small"
                                for s, v in zip(WORDS, NUMS)]

    def test_case_null_branch(self, t):
        e = where(col("v") > 3, col("w"), null())
        out = t.lazy().with_columns(r=e).collect()
        m = np.asarray(out.null_mask("r"))
        assert list(m) == [v <= 3 for v in NUMS]
        vals = _strings(out, "r")
        for s, v, got in zip(WORDS, NUMS, vals):
            if v > 3:
                assert got == s

    def test_coalesce_strings(self, t):
        e = rst.coalesce(where(col("v") > 3, col("w"), null()),
                         lit("fallback"))
        out = t.lazy().with_columns(r=e).collect()
        assert out.null_mask("r") is None
        assert _strings(out, "r") == [s if v > 3 else "fallback"
                                      for s, v in zip(WORDS, NUMS)]

    def test_mixed_case_branches_rejected(self, t):
        with pytest.raises(TypeError, match="branches"):
            t.lazy().with_columns(
                r=where(col("v") > 3, col("w"), col("v"))).collect()

    def test_null_propagates_through_strfn(self):
        t = Table({"w": WORDS, "v": np.arange(8)},
                  null_masks={"w": np.array([True, False] * 4)})
        out = t.lazy().with_columns(r=col("w").upper()).collect()
        np.testing.assert_array_equal(np.asarray(out.null_mask("r")),
                                      np.array([True, False] * 4))
        # masked slots canonicalize to code 0 (the engine invariant)
        assert np.asarray(out["r"])[0] == 0


# ---------------------------------------------------------------------------
# group-by over computed strings keeps the dictionary
# ---------------------------------------------------------------------------


class TestGrouping:
    def test_group_by_upper(self, t):
        out = (t.lazy()
               .with_columns(u=col("w").upper())
               .aggregate(by="u", aggs={"v_sum": ("sum", "v")})
               .collect())
        got = dict(zip(_strings(out, "u"),
                       out.to_numpy()["v_sum"].tolist()))
        oracle = {}
        for s, v in zip(WORDS, NUMS):
            oracle[s.upper()] = oracle.get(s.upper(), 0) + v
        assert got == oracle

    def test_sort_by_computed_string(self, t):
        out = t.lazy().sort_by(col("w").lower()).collect()
        assert _strings(out, "w") == sorted(WORDS, key=lambda s:
                                            s.lower())


# ---------------------------------------------------------------------------
# SQL spellings
# ---------------------------------------------------------------------------


class TestSql:
    def test_select_upper_and_concat(self, t):
        out = sql("SELECT UPPER(w) AS u, w || '-x' AS wx, v FROM t",
                  {"t": t}).collect()
        assert _strings(out, "u") == [s.upper() for s in WORDS]
        assert _strings(out, "wx") == [s + "-x" for s in WORDS]

    def test_where_string_fns(self, t):
        out = sql("SELECT w FROM t WHERE LENGTH(w) > 4 AND "
                  "CONTAINS(w, 'p')", {"t": t}).collect()
        assert _strings(out, "w") == [s for s in WORDS
                                      if len(s) > 4 and "p" in s]

    def test_substr_replace_trim(self, t):
        out = sql("SELECT SUBSTR(w, 2, 3) AS a, REPLACE(w, 'p', '_') "
                  "AS b, TRIM(w) AS c FROM t", {"t": t}).collect()
        assert _strings(out, "a") == [s[1:4] for s in WORDS]
        assert _strings(out, "b") == [s.replace("p", "_") for s in WORDS]
        assert _strings(out, "c") == [s.strip(" ") for s in WORDS]

    def test_group_by_computed_string(self, t):
        out = sql("SELECT LOWER(TRIM(w)) AS k, SUM(v) AS s FROM t "
                  "GROUP BY LOWER(TRIM(w))", {"t": t}).collect()
        oracle = {}
        for s, v in zip(WORDS, NUMS):
            k = s.strip(" ").lower()
            oracle[k] = oracle.get(k, 0) + v
        got = dict(zip(_strings(out, "k"), out.to_numpy()["s"].tolist()))
        assert got == oracle

    def test_case_then_strings(self, t):
        out = sql("SELECT CASE WHEN v > 3 THEN UPPER(w) ELSE 'small' END"
                  " AS r FROM t", {"t": t}).collect()
        assert _strings(out, "r") == [s.upper() if v > 3 else "small"
                                      for s, v in zip(WORDS, NUMS)]

    def test_cast(self, t):
        out = sql("SELECT CAST(v AS DOUBLE) AS f, "
                  "CAST(v AS SMALLINT) AS i16 FROM t", {"t": t}).collect()
        assert out["f"].dtype == np.float64
        assert out["i16"].dtype == np.int16
        np.testing.assert_allclose(out.to_numpy()["f"], NUMS)

    def test_cast_unknown_type(self, t):
        with pytest.raises(SqlError, match="unknown CAST type"):
            sql("SELECT CAST(v AS BLOB) AS x FROM t", {"t": t})

    def test_lpad_strpos_left_right(self, t):
        out = sql("SELECT LPAD(w, 4, '*') AS lp, STRPOS(w, 'p') AS sp, "
                  "LEFT(w, 2) AS l2, RIGHT(w, 2) AS r2 FROM t",
                  {"t": t}).collect()
        assert _strings(out, "lp") == [
            s[:4] if len(s) >= 4 else "*" * (4 - len(s)) + s
            for s in WORDS]
        assert list(out.to_numpy()["sp"]) == [s.find("p") + 1
                                               for s in WORDS]
        assert _strings(out, "l2") == [s[:2] for s in WORDS]
        assert _strings(out, "r2") == [s[max(len(s) - 2, 0):]
                                       for s in WORDS]

    def test_concat_fn_and_order_by(self, t):
        # ORDER BY expressions see the SELECT output schema (w selected)
        out = sql("SELECT w, CONCAT(w, '|', UPPER(w)) AS c FROM t "
                  "ORDER BY UPPER(w)", {"t": t}).collect()
        oracle = sorted(WORDS, key=lambda s: s.upper())
        assert _strings(out, "c") == [f"{s}|{s.upper()}" for s in oracle]
        assert list(out.column_names) == ["w", "c"]  # __ord_0 dropped

    def test_string_param_type_errors(self, t):
        with pytest.raises(SqlError, match="integer literal"):
            sql("SELECT SUBSTR(w, 'a') AS x FROM t", {"t": t})
        with pytest.raises(SqlError, match="string literal"):
            sql("SELECT REPLACE(w, 1, 'b') AS x FROM t", {"t": t})


class TestStringCast:
    """CAST/TRY_CAST of string columns: vocabulary-level parse + one
    gather; unparseable values come back NULL."""

    @pytest.fixture
    def tc(self):
        return {"t": rst.Table({"w": ["42", "-7", "3.5", "junk", ""],
                                "v": np.arange(5, dtype=np.int32)})}

    def test_float_and_int(self, tc):
        out = sql("SELECT CAST(w AS FLOAT) AS f, TRY_CAST(w AS INT) AS i "
                  "FROM t", tc).collect().to_numpy()
        np.testing.assert_allclose(
            np.ma.getdata(out["f"])[:3], [42., -7., 3.5])
        np.testing.assert_array_equal(
            np.ma.getmaskarray(out["f"]), [0, 0, 0, 1, 1])
        # ints parse strictly: '3.5' is NULL for an INT target
        np.testing.assert_array_equal(
            np.ma.getmaskarray(out["i"]), [0, 0, 1, 1, 1])

    def test_aggregate_skips_nulls(self, tc):
        out = sql("SELECT SUM(CAST(w AS FLOAT)) AS s, "
                  "COUNT(CAST(w AS FLOAT)) AS n FROM t",
                  tc).collect().to_numpy()
        np.testing.assert_allclose(out["s"], [38.5])
        np.testing.assert_array_equal(out["n"], [3])

    def test_composes_with_string_fns(self, tc):
        out = sql("SELECT CAST(SUBSTR(w, 1, 1) AS INT) AS d FROM t "
                  "WHERE LENGTH(w) = 2", tc).collect().to_numpy()
        np.testing.assert_array_equal(np.ma.getdata(out["d"])[0], 4)
        np.testing.assert_array_equal(
            np.ma.getmaskarray(out["d"]), [0, 1])

    def test_bool_cast(self, tc):
        t = {"t": rst.Table({"w": ["true", "F", "1", "maybe"],
                             "v": np.arange(4, dtype=np.int32)})}
        out = sql("SELECT CAST(w AS BOOLEAN) AS b FROM t",
                  t).collect().to_numpy()
        np.testing.assert_array_equal(
            np.ma.getdata(out["b"])[:3], [True, False, True])
        np.testing.assert_array_equal(
            np.ma.getmaskarray(out["b"]), [0, 0, 0, 1])
