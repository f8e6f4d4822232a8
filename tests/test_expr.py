"""Expression-tree evaluation contract: each child subtree is evaluated
exactly ONCE per evaluate_masked (deep chains must be O(depth), not
O(2^depth)), NULL-literal edge cases stay typed, and Table rejects
malformed inline null-mask columns at construction."""

import jax.numpy as jnp
import numpy as np
import pytest

from radix_sort_tpu import Table
from radix_sort_tpu import nulls as NL
from radix_sort_tpu.expr import col, lit, null, where
from radix_sort_tpu.sql import sql


class CountingTable:
    """Minimal table stand-in that counts column reads."""

    def __init__(self, cols, masks=None):
        self.cols = {k: jnp.asarray(v) for k, v in cols.items()}
        self.masks = {k: jnp.asarray(v, jnp.bool_)
                      for k, v in (masks or {}).items()}
        self.reads = 0

    def __getitem__(self, name):
        self.reads += 1
        return self.cols[name]

    def null_mask(self, name):
        return self.masks.get(name)


class TestLinearEvaluation:
    def test_binary_chain_reads_each_leaf_once(self):
        t = CountingTable({"x": np.arange(4, dtype=np.int32)})
        e = col("x")
        depth = 18
        for _ in range(depth):
            e = e + col("x")
        v, m = e.evaluate_masked(t)
        assert m is None
        np.testing.assert_array_equal(
            np.asarray(v), np.arange(4) * (depth + 1))
        # one read per col() leaf — was 2^depth before the fix
        assert t.reads == depth + 1

    def test_nullable_chain_reads_each_leaf_once(self):
        t = CountingTable({"x": np.arange(4, dtype=np.int32)},
                          masks={"x": [False, True, False, False]})
        e = col("x")
        depth = 12
        for _ in range(depth):
            e = (e + col("x")) * 1
        v, m = e.evaluate_masked(t)
        assert m is not None
        np.testing.assert_array_equal(
            np.asarray(m), [False, True, False, False])
        # each col() leaf read once; the masks come along for free
        assert t.reads == depth + 1

    def test_deep_literal_chain_terminates(self):
        # depth 64: 2^64 child evaluations would never finish — this test
        # completing at all is the regression check
        t = CountingTable({"x": np.arange(3, dtype=np.int64)})
        e = col("x")
        for _ in range(64):
            e = e + 1
        v, _ = e.evaluate_masked(t)
        np.testing.assert_array_equal(np.asarray(v), np.arange(3) + 64)
        assert t.reads == 1

    def test_comparison_chain_linear(self):
        t = CountingTable({"x": np.arange(8, dtype=np.int32),
                           "y": np.arange(8, dtype=np.int32)[::-1].copy()})
        pred = (col("x") > 1) & (col("y") > 1)
        for _ in range(10):
            pred = pred & ((col("x") + col("y")) == 7)
        v, m = pred.evaluate_masked(t)
        assert m is None
        np.testing.assert_array_equal(
            np.asarray(v), (np.arange(8) > 1) & (np.arange(8)[::-1] > 1))
        assert t.reads == 2 + 10 * 2


class TestNullLiteralTyping:
    def test_scalar_compare_with_null_literal(self):
        # both operands scalar, one NULL: result value must coerce to an
        # array (Python bool has no .dtype) and the mask must be all-NULL
        t = CountingTable({"x": np.arange(4, dtype=np.int32)})
        v, m = (lit(1) == null()).evaluate_masked(t)
        assert hasattr(v, "dtype") and v.dtype == jnp.bool_
        assert bool(jnp.asarray(m))
        assert not bool(jnp.asarray(v))  # canonicalized false under mask

    def test_pred_and_null_stays_bool(self):
        t = CountingTable({"x": np.arange(4, dtype=np.int32)})
        v, m = ((col("x") > 1) & null()).evaluate_masked(t)
        v = jnp.asarray(v)
        assert v.dtype == jnp.bool_, v.dtype
        # TRUE AND NULL = NULL; FALSE AND NULL = FALSE
        np.testing.assert_array_equal(np.asarray(m),
                                      [False, False, True, True])
        np.testing.assert_array_equal(np.asarray(v),
                                      [False, False, False, False])

    def test_pred_or_null_stays_bool(self):
        t = CountingTable({"x": np.arange(4, dtype=np.int32)})
        v, m = ((col("x") > 1) | null()).evaluate_masked(t)
        v = jnp.asarray(v)
        assert v.dtype == jnp.bool_, v.dtype
        # TRUE OR NULL = TRUE; FALSE OR NULL = NULL
        np.testing.assert_array_equal(np.asarray(m),
                                      [True, True, False, False])
        np.testing.assert_array_equal(np.asarray(v),
                                      [False, False, True, True])

    def test_where_null_condition_is_false(self):
        t = CountingTable({"x": np.arange(4, dtype=np.int32)})
        v, m = where(null(), col("x"), col("x") * 10).evaluate_masked(t)
        assert m is None
        np.testing.assert_array_equal(np.asarray(v), np.arange(4) * 10)

    def test_sql_where_scalar_null_compare(self):
        t = Table({"x": np.arange(5, dtype=np.int32)})
        out = sql("SELECT x FROM t WHERE 1 = NULL",
                  {"t": t}).collect().to_numpy()
        assert len(out["x"]) == 0  # UNKNOWN predicate keeps no rows


class TestStringCompareStillCorrect:
    """The evaluate-once refactor threads pre-computed values through the
    string-compare resolver — the dictionary semantics must be unchanged."""

    def test_col_vs_literal_all_ops(self):
        vals = np.array(["gear", "bolt", "nut", "cam", "bolt"])
        t = Table({"s": vals, "v": np.arange(5, dtype=np.int32)})
        for op, oracle in [
            (col("s") == "bolt", vals == "bolt"),
            (col("s") != "bolt", vals != "bolt"),
            (col("s") < "cam", vals < "cam"),
            (col("s") >= "gear", vals >= "gear"),
            (lit("cam") > col("s"), vals < "cam"),  # mirrored literal
        ]:
            got = np.asarray(op.evaluate(t))
            np.testing.assert_array_equal(got, oracle)

    def test_col_vs_col_unified(self):
        a = np.array(["x", "b", "m", "b"])
        b = np.array(["m", "b", "x", "a"])
        t = Table({"a": a, "b": b})
        np.testing.assert_array_equal(
            np.asarray((col("a") == col("b")).evaluate(t)), a == b)
        np.testing.assert_array_equal(
            np.asarray((col("a") < col("b")).evaluate(t)), a < b)


class TestTableMaskValidation:
    def test_inline_mask_wrong_length_rejected(self):
        with pytest.raises(ValueError, match="expected"):
            Table({
                "x": np.arange(4, dtype=np.int32),
                NL.mask_name("x"): np.zeros(3, dtype=bool),
            })

    def test_inline_mask_right_length_ok(self):
        t = Table({
            "x": np.arange(4, dtype=np.int32),
            NL.mask_name("x"): np.array([False, True, False, False]),
        })
        np.testing.assert_array_equal(
            np.asarray(t.null_mask("x")), [False, True, False, False])

    def test_mask_only_table_rejected(self):
        with pytest.raises(ValueError, match="data column"):
            Table({NL.mask_name("x"): np.zeros(4, dtype=bool)})
