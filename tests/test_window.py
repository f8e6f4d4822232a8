"""Window-function tests: every op vs a per-partition numpy oracle.

The oracle evaluates each window op row-at-a-time per partition (the SQL
semantics, directly transcribed); the engine computes all ops from one
stable variadic sort + segment math (ops/window.py). Oracle pattern per
the reference's tests.rs:7-23 — exact equality, with ties resolved by
input order (our documented deterministic contract).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import radix_sort_tpu as rst

N = 4_097


@pytest.fixture
def data(rng):
    part = rng.integers(0, 37, size=N).astype(np.int32)      # ~110 rows/part
    order = rng.integers(0, 23, size=N).astype(np.uint32)    # heavy ties
    vals_i = rng.integers(-1000, 1000, size=N).astype(np.int32)
    vals_f = rng.standard_normal(N).astype(np.float32)
    return part, order, vals_i, vals_f


def _oracle(name, part, order, vals=None, offset=1, fill=0, following=0):
    """Row-at-a-time per-partition evaluation in input-order-stable
    (partition, order) sorted order, results mapped back to input rows."""
    n = len(part)
    out = np.zeros(n, dtype=np.float64)
    for p in np.unique(part):
        idx = np.nonzero(part == p)[0]  # input order within partition
        if order is not None:
            idx = idx[np.argsort(order[idx], kind="stable")]
        m = len(idx)
        o = order[idx] if order is not None else np.zeros(m)
        v = vals[idx].astype(np.float64) if vals is not None else None
        for j, row in enumerate(idx):
            ties_before = np.nonzero(o[: j + 1] == o[j])[0]
            if name.startswith("rolling_"):
                ws, we = max(0, j - offset), min(m - 1, j + following)
                wv = v[ws:we + 1] if v is not None else None
                out[row] = {
                    "rolling_count": we - ws + 1,
                    "rolling_sum": wv.sum() if wv is not None else 0,
                    "rolling_min": wv.min() if wv is not None else 0,
                    "rolling_max": wv.max() if wv is not None else 0,
                    "rolling_mean": wv.mean() if wv is not None else 0,
                }[name]
                continue
            if name == "row_number":
                out[row] = j + 1
            elif name == "rank":
                out[row] = ties_before[0] + 1
            elif name == "dense_rank":
                out[row] = len(np.unique(o[: j + 1]))
            elif name == "count":
                out[row] = m
            elif name == "sum":
                out[row] = v.sum()
            elif name == "min":
                out[row] = v.min()
            elif name == "max":
                out[row] = v.max()
            elif name == "mean":
                out[row] = v.mean()
            elif name == "cumsum":
                out[row] = v[: j + 1].sum()
            elif name == "cummin":
                out[row] = v[: j + 1].min()
            elif name == "cummax":
                out[row] = v[: j + 1].max()
            elif name == "first_value":
                out[row] = v[0]
            elif name == "last_value":
                out[row] = v[-1]
            elif name == "lag":
                out[row] = v[j - offset] if j >= offset else fill
            elif name == "lead":
                out[row] = v[j + offset] if j + offset < m else fill
            elif name == "percent_rank":
                out[row] = ties_before[0] / (m - 1) if m > 1 else 0.0
            elif name == "cume_dist":
                out[row] = (np.nonzero(o == o[j])[0][-1] + 1) / m
            elif name == "ntile":
                base, extra = divmod(m, offset)
                thr = extra * (base + 1)
                out[row] = 1 + (j // (base + 1) if j < thr
                                else extra + (j - thr) // max(base, 1))
            elif name == "nth_value":
                out[row] = v[offset - 1] if m >= offset else fill
    return out


RANK_OPS = ["row_number", "rank", "dense_rank", "count"]


@pytest.mark.parametrize("name", RANK_OPS)
def test_rank_ops(data, name):
    part, order, _, _ = data
    got = rst.window(name, partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle(name, part, order)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


INT_VALUE_OPS = ["sum", "min", "max", "cumsum", "cummin", "cummax",
                 "first_value", "last_value", "lag", "lead"]


@pytest.mark.parametrize("name", INT_VALUE_OPS)
def test_int_value_ops(data, name):
    part, order, vals, _ = data
    got = rst.window((name, jnp.asarray(vals)),
                     partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle(name, part, order, vals)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


@pytest.mark.parametrize("name", ["sum", "mean", "cumsum", "cummin",
                                  "cummax", "first_value", "last_value"])
def test_float_value_ops(data, name):
    part, order, _, vals = data
    got = rst.window((name, jnp.asarray(vals)),
                     partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle(name, part, order, vals)
    if name in ("sum", "mean", "cumsum"):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5)
    else:
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.float32))


def test_lag_lead_offset_fill(data):
    part, order, vals, _ = data
    for name in ("lag", "lead"):
        got = rst.window((name, jnp.asarray(vals), 3, -7),
                         partition_by=jnp.asarray(part),
                         order_by=jnp.asarray(order))
        want = _oracle(name, part, order, vals, offset=3, fill=-7)
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.int32))


def test_multi_op_shared_sort(data):
    """Several specs in one call == each spec alone (shared sorts)."""
    part, order, vals_i, vals_f = data
    p, o = jnp.asarray(part), jnp.asarray(order)
    vi, vf = jnp.asarray(vals_i), jnp.asarray(vals_f)
    specs = ["row_number", "rank", ("sum", vi), ("cummax", vi),
             ("mean", vf), ("lag", vi, 2)]
    outs = rst.window(specs, partition_by=p, order_by=o)
    assert len(outs) == len(specs)
    for spec, got in zip(specs, outs):
        alone = rst.window(spec, partition_by=p, order_by=o)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(alone))


def test_no_order_by_ties_keep_input_order(data):
    part, _, vals, _ = data
    rn = rst.window("row_number", partition_by=jnp.asarray(part))
    want = _oracle("row_number", part, None)
    np.testing.assert_array_equal(np.asarray(rn), want.astype(np.int32))
    # rank/dense_rank with no order: every row ties -> 1
    rk = rst.window("rank", partition_by=jnp.asarray(part))
    assert np.all(np.asarray(rk) == 1)
    # running sum accumulates in input order
    cs = rst.window(("cumsum", jnp.asarray(vals)),
                    partition_by=jnp.asarray(part))
    want = _oracle("cumsum", part, None, vals)
    np.testing.assert_array_equal(np.asarray(cs), want.astype(np.int32))


def test_no_partition_whole_input(data):
    _, order, vals, _ = data
    got = rst.window(("cummax", jnp.asarray(vals)),
                     order_by=jnp.asarray(order))
    want = _oracle("cummax", np.zeros(N, np.int32), order, vals)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


def test_no_partition_no_order_identity_layout(data):
    """Neither partition nor order: the input order IS the window order
    (no sorts at all on this path)."""
    _, _, vals, _ = data
    got = rst.window(("cumsum", jnp.asarray(vals)))
    np.testing.assert_array_equal(np.asarray(got), np.cumsum(vals))
    rn = rst.window("row_number", order_by=jnp.zeros(N, jnp.uint32))
    np.testing.assert_array_equal(np.asarray(rn), np.arange(1, N + 1))


def test_multicol_partition_and_order(rng):
    p1 = rng.integers(0, 5, size=N).astype(np.int32)
    p2 = rng.integers(0, 4, size=N).astype(np.uint64)
    o1 = rng.integers(0, 6, size=N).astype(np.int16)
    o2 = rng.standard_normal(N).astype(np.float32)
    vals = rng.integers(0, 100, size=N).astype(np.int32)
    got = rst.window(
        ["row_number", ("cumsum", jnp.asarray(vals))],
        partition_by=[jnp.asarray(p1), jnp.asarray(p2)],
        order_by=[jnp.asarray(o1), jnp.asarray(o2)],
    )
    # oracle on a fused composite partition / order key
    part = p1.astype(np.int64) * 100 + p2.astype(np.int64)
    order = np.argsort(
        np.lexsort((o2, o1)), kind="stable"
    )  # rank of each row under (o1, o2): order-equivalent scalar key
    rn = _oracle("row_number", part, order)
    cs = _oracle("cumsum", part, order, vals)
    np.testing.assert_array_equal(np.asarray(got[0]), rn.astype(np.int32))
    np.testing.assert_array_equal(np.asarray(got[1]), cs.astype(np.int32))


def test_float_order_total_order(rng):
    """order_by on floats with specials ranks per IEEE total order."""
    vals = rng.standard_normal(N).astype(np.float32)
    order = vals.copy()
    order[:8] = [np.nan, -np.nan, np.inf, -np.inf, 0.0, -0.0, 1.0, -1.0]
    part = np.zeros(N, np.int32)
    got = rst.window("row_number", partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    # total-order oracle via the package's own encode (tested vs total_cmp
    # in test_keys.py)
    from radix_sort_tpu import keys as K
    w = np.asarray(K.encode(jnp.asarray(order)))
    want = np.argsort(np.argsort(w, kind="stable"), kind="stable") + 1
    np.testing.assert_array_equal(np.asarray(got), want)


def test_empty_and_validation():
    z = jnp.zeros((0,), jnp.int32)
    out = rst.window(["row_number", ("sum", z)], partition_by=z)
    assert out[0].shape == (0,) and out[1].shape == (0,)
    with pytest.raises(ValueError):
        rst.window("bogus_op", partition_by=jnp.zeros(4, jnp.int32))
    with pytest.raises(ValueError):
        rst.window("rank")  # nothing to infer length from
    with pytest.raises(ValueError):
        rst.window(("sum",), partition_by=jnp.zeros(4, jnp.int32))
    with pytest.raises(ValueError):
        rst.window(("lag", jnp.zeros(4, jnp.int32), 0),
                   partition_by=jnp.zeros(4, jnp.int32))
    with pytest.raises(ValueError):
        rst.window("row_number", partition_by=jnp.zeros(4, jnp.int32),
                   order_by=jnp.zeros(5, jnp.uint32))


@pytest.mark.parametrize("name", ["percent_rank", "cume_dist"])
def test_relative_rank_ops(data, name):
    part, order, _, _ = data
    got = rst.window(name, partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle(name, part, order)
    np.testing.assert_allclose(np.asarray(got), want.astype(np.float32),
                               rtol=1e-6)


@pytest.mark.parametrize("b", [1, 3, 200])
def test_ntile(data, b):
    part, order, _, _ = data
    got = rst.window(("ntile", b), partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle("ntile", part, order, offset=b)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


def test_nth_value(data):
    part, order, vals_i, _ = data
    got = rst.window(("nth_value", jnp.asarray(vals_i), 3, -1),
                     partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle("nth_value", part, order, vals_i, offset=3, fill=-1)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))
    # k beyond every partition: all fill
    got = rst.window(("nth_value", jnp.asarray(vals_i), N + 1, -7),
                     partition_by=jnp.asarray(part))
    np.testing.assert_array_equal(np.asarray(got), np.full(N, -7, np.int32))


@pytest.mark.parametrize("name", ["rolling_sum", "rolling_min",
                                  "rolling_max", "rolling_count"])
@pytest.mark.parametrize("p,f", [(0, 0), (5, 0), (7, 3), (1000, 2)])
def test_rolling_int_exact(data, name, p, f):
    part, order, vals_i, _ = data
    spec = ((name, p, f) if name == "rolling_count"
            else (name, jnp.asarray(vals_i), p, f))
    got = rst.window(spec, partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle(name, part, order, vals_i, offset=p, following=f)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


@pytest.mark.parametrize("name", ["rolling_sum", "rolling_mean",
                                  "rolling_min", "rolling_max"])
def test_rolling_float(data, name):
    part, order, _, vals_f = data
    got = rst.window((name, jnp.asarray(vals_f), 9, 4),
                     partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle(name, part, order, vals_f, offset=9, following=4)
    if name in ("rolling_min", "rolling_max"):
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.float32))
    else:
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-5)


def test_rolling_mean_int(data):
    part, order, vals_i, _ = data
    got = rst.window(("rolling_mean", jnp.asarray(vals_i), 4),
                     partition_by=jnp.asarray(part),
                     order_by=jnp.asarray(order))
    want = _oracle("rolling_mean", part, order, vals_i, offset=4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_rolling_no_partition(rng):
    vals = rng.integers(-50, 50, size=257).astype(np.int32)
    got = rst.window(("rolling_max", jnp.asarray(vals), 6))
    part = np.zeros(257, np.int32)
    want = _oracle("rolling_max", part, None, vals, offset=6)
    np.testing.assert_array_equal(np.asarray(got), want.astype(np.int32))


def test_new_spec_validation():
    z = jnp.zeros(4, jnp.int32)
    with pytest.raises(ValueError, match="bucket count"):
        rst.window(("ntile", 0), partition_by=z)
    with pytest.raises(ValueError, match="bucket count"):
        rst.window(("ntile",), partition_by=z)
    with pytest.raises(ValueError, match="frame"):
        rst.window(("rolling_sum", z), partition_by=z)
    with pytest.raises(ValueError, match=">= 0"):
        rst.window(("rolling_sum", z, -1), partition_by=z)
    with pytest.raises(ValueError, match="offset"):
        rst.window(("nth_value", z, 0), partition_by=z)
    with pytest.raises(ValueError, match="takes no value"):
        rst.window(("percent_rank", z), partition_by=z)


class TestDescending:
    """descending= flips order_by direction per column; ties still break
    by input order (the complemented-limb encoding preserves equality)."""

    def test_row_number_desc(self, data):
        part, order, _, _ = data
        got = rst.window("row_number",
                         partition_by=jnp.asarray(part),
                         order_by=jnp.asarray(order), descending=True)
        # oracle: stable sort by negated order key
        want = _oracle("row_number", part,
                       (order.max() - order).astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.int32))

    def test_cumsum_desc_float_order(self, data):
        part, _, vals_i, vals_f = data
        got = rst.window(("cumsum", jnp.asarray(vals_i)),
                         partition_by=jnp.asarray(part),
                         order_by=jnp.asarray(vals_f), descending=[True])
        surr = np.argsort(np.argsort(-vals_f, kind="stable"),
                          kind="stable").astype(np.uint32)
        want = _oracle("cumsum", part, surr, vals_i)
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.int32))

    def test_mixed_directions_two_columns(self, data):
        part, order, vals_i, _ = data
        second = (np.arange(N) % 7).astype(np.int32)
        got = rst.window("row_number",
                         partition_by=jnp.asarray(part),
                         order_by=[jnp.asarray(order),
                                   jnp.asarray(second)],
                         descending=[True, False])
        # composite surrogate: rank of (-order, second) lexicographic
        comp = list(zip(-order.astype(np.int64), second))
        surr = np.zeros(N, np.uint32)
        ranks = {k: r for r, k in enumerate(sorted(set(comp)))}
        for i, k in enumerate(comp):
            surr[i] = ranks[k]
        want = _oracle("row_number", part, surr)
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.int32))

    def test_descending_length_mismatch(self):
        z = jnp.zeros(8, jnp.int32)
        with pytest.raises(ValueError, match="descending"):
            rst.window("row_number", partition_by=z, order_by=z,
                       descending=[True, False])


class TestRangeFrames:
    """Value-based (SQL RANGE) sliding frames vs a brute-force oracle:
    frame = partition rows with order value in [cur-p, cur+f]."""

    @pytest.fixture
    def data(self, rng):
        n = 512
        return (rng.integers(0, 6, n).astype(np.int32),
                rng.integers(0, 90, n).astype(np.int32),
                rng.integers(-50, 50, n).astype(np.int32))

    def _mask(self, part, ov, i, p, f):
        m = part == part[i]
        if p is not None:
            m &= ov >= ov[i] - p
        if f is not None:
            m &= ov <= ov[i] + f
        return m

    def test_sum_min_max_count_vs_oracle(self, data):
        part, ov, val = data
        outs = rst.window(
            [("range_sum", val, 7, 3), ("range_min", val, 7, 3),
             ("range_max", val, 7, 3), ("range_count", 7, 3)],
            partition_by=part, order_by=ov)
        for i in range(len(part)):
            m = self._mask(part, ov, i, 7, 3)
            assert outs[0][i] == val[m].sum()
            assert outs[1][i] == val[m].min()
            assert outs[2][i] == val[m].max()
            assert outs[3][i] == m.sum()

    def test_unbounded_sides_and_peers(self, data):
        part, ov, val = data
        s, m = rst.window(
            [("range_sum", val, None, 0), ("range_mean", val, 0, None)],
            partition_by=part, order_by=ov)
        for i in range(0, len(part), 7):
            mm = self._mask(part, ov, i, None, 0)
            assert s[i] == val[mm].sum()  # running incl. PEERS (SQL)
            mh = self._mask(part, ov, i, 0, None)
            np.testing.assert_allclose(m[i], val[mh].mean(), rtol=1e-6)

    def test_float_values(self, data, rng):
        part, ov, _ = data
        fv = rng.standard_normal(len(part)).astype(np.float32)
        out = rst.window(("range_sum", fv, 10, 10),
                         partition_by=part, order_by=ov)
        for i in range(0, len(part), 13):
            m = self._mask(part, ov, i, 10, 10)
            np.testing.assert_allclose(out[i], fv[m].sum(),
                                       rtol=1e-4, atol=1e-4)

    def test_validation(self, data):
        part, ov, val = data
        with pytest.raises(ValueError, match="exactly one order_by"):
            rst.window(("range_sum", val, 1, 0), partition_by=part,
                       order_by=[ov, ov])
        with pytest.raises(ValueError, match="ascending"):
            rst.window(("range_sum", val, 1, 0), partition_by=part,
                       order_by=ov, descending=True)
        with pytest.raises(ValueError, match="numeric value deltas"):
            rst.window(("range_sum", val, -1, 0), partition_by=part,
                       order_by=ov)
