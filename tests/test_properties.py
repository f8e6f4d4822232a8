"""Property-based tests (hypothesis): invariants over random inputs.

Complements the oracle matrix with adversarial generation — tiny arrays,
extreme values, heavy duplication — across the public API.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

import radix_sort_tpu as rst

_SET = settings(max_examples=25, deadline=None)

_int_dtypes = st.sampled_from(
    [np.uint8, np.uint16, np.uint32, np.int8, np.int16, np.int32]
)


def _arrays(draw, dtype, n):
    info = np.iinfo(dtype)
    return draw(
        st.lists(
            st.integers(int(info.min), int(info.max)), min_size=n, max_size=n
        )
    )


@_SET
@given(st.data(), _int_dtypes, st.integers(1, 300))
def test_sort_matches_numpy(data, dtype, n):
    x = np.array(_arrays(data.draw, dtype, n), dtype=dtype)
    out = np.asarray(rst.sort(jnp.asarray(x)))
    np.testing.assert_array_equal(out, np.sort(x, kind="stable"))


@_SET
@given(st.data(), st.integers(1, 200), st.integers(1, 8))
def test_sort_pairs_stability(data, n, nkeys):
    keys = np.array(
        data.draw(st.lists(st.integers(0, nkeys), min_size=n, max_size=n)),
        dtype=np.uint32,
    )
    vals = np.arange(n, dtype=np.uint32)
    sk, sv = rst.sort_pairs(jnp.asarray(keys), jnp.asarray(vals))
    perm = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(np.asarray(sk), keys[perm])
    np.testing.assert_array_equal(np.asarray(sv), vals[perm])


@_SET
@given(st.data(), st.integers(1, 200))
def test_float_total_order(data, n):
    specials = [0.0, -0.0, np.nan, np.inf, -np.inf, 1e-38, -1e38]
    vals = data.draw(
        st.lists(
            st.one_of(st.sampled_from(specials), st.floats(width=32)),
            min_size=n,
            max_size=n,
        )
    )
    x = np.array(vals, dtype=np.float32)
    out = np.asarray(rst.sort(jnp.asarray(x)))
    b = x.view(np.int32)
    mask = (b >> 31) | np.iinfo(np.int32).min
    ref = x[np.argsort((b ^ mask).view(np.uint32), kind="stable")]
    np.testing.assert_array_equal(out.view(np.int32), ref.view(np.int32))


@_SET
@given(st.data(), st.integers(1, 150), st.integers(1, 10))
def test_aggregate_sums(data, n, ngroups):
    keys = np.array(
        data.draw(st.lists(st.integers(0, ngroups), min_size=n, max_size=n)),
        dtype=np.uint32,
    )
    vals = np.array(
        data.draw(st.lists(st.integers(0, 1000), min_size=n, max_size=n)),
        dtype=np.uint32,
    )
    uk, s, cnt = rst.hash_aggregate(jnp.asarray(keys), jnp.asarray(vals))
    cnt = int(cnt)
    ref_keys = np.unique(keys)
    assert cnt == len(ref_keys)
    for i, k in enumerate(ref_keys):
        assert int(np.asarray(s)[i]) == int(vals[keys == k].sum())


@_SET
@given(st.data(), st.integers(1, 100))
def test_filter_partition(data, n):
    x = np.arange(n, dtype=np.uint32)
    mask = np.array(
        data.draw(st.lists(st.booleans(), min_size=n, max_size=n))
    )
    xc, cnt = rst.filter(jnp.asarray(mask), jnp.asarray(x))
    cnt = int(cnt)
    np.testing.assert_array_equal(np.asarray(xc)[:cnt], x[mask])
    np.testing.assert_array_equal(np.asarray(xc)[cnt:], x[~mask])


@_SET
@given(st.data(), st.integers(1, 60), st.integers(1, 60), st.integers(0, 9))
def test_join_hows_consistency(data, nl, nr, kmax):
    """Structural invariants tying the four join variants together:
    |inner| + #anti == |left|; semi ∪ anti partitions the left side."""
    lk = np.array(
        data.draw(st.lists(st.integers(0, kmax), min_size=nl, max_size=nl)),
        dtype=np.uint32,
    )
    rk = np.array(
        data.draw(st.lists(st.integers(0, kmax), min_size=nr, max_size=nr)),
        dtype=np.uint32,
    )
    lv = np.arange(nl, dtype=np.uint32)
    rv = np.arange(nr, dtype=np.uint32)
    cap = nl * nr + nl + 8
    res = {}
    for how in ("inner", "left", "semi", "anti"):
        _, _, _, cnt, ovf = rst.hash_join(
            jnp.asarray(lk), jnp.asarray(lv), jnp.asarray(rk),
            jnp.asarray(rv), capacity=cap, how=how,
        )
        assert not bool(ovf)
        res[how] = int(cnt)
    n_match = np.isin(lk, rk).sum()
    assert res["semi"] == n_match
    assert res["anti"] == nl - n_match
    assert res["left"] == res["inner"] + res["anti"]
    # inner count equals the exact pair count
    ref_pairs = sum(
        int((lk == k).sum()) * int((rk == k).sum()) for k in np.unique(lk)
    )
    assert res["inner"] == ref_pairs


@_SET
@given(st.data(), st.integers(1, 120), st.integers(1, 8))
def test_aggregate_mean_is_sum_over_count(data, n, ngroups):
    keys = np.array(
        data.draw(st.lists(st.integers(0, ngroups), min_size=n, max_size=n)),
        dtype=np.uint32,
    )
    vals = np.array(
        data.draw(st.lists(st.integers(0, 1000), min_size=n, max_size=n)),
        dtype=np.uint32,
    )
    uk, m, cnt = rst.hash_aggregate(jnp.asarray(keys), jnp.asarray(vals), "mean")
    cnt = int(cnt)
    for i, k in enumerate(np.unique(keys)):
        sel = vals[keys == k]
        np.testing.assert_allclose(
            float(np.asarray(m)[i]), sel.sum() / len(sel), rtol=1e-6
        )


@_SET
@given(st.data(), st.integers(1, 80))
def test_repeat_matches_numpy(data, n):
    vals = np.arange(n, dtype=np.uint32) * 7
    counts = np.array(
        data.draw(st.lists(st.integers(0, 5), min_size=n, max_size=n)),
        dtype=np.int32,
    )
    ref = np.repeat(vals, counts)
    out, cnt, ovf = rst.repeat(
        jnp.asarray(vals), jnp.asarray(counts), total_size=len(ref) + 4
    )
    assert int(cnt) == len(ref) and not bool(ovf)
    np.testing.assert_array_equal(np.asarray(out)[: len(ref)], ref)


@_SET
@given(st.data(), st.integers(1, 120), st.integers(1, 8))
def test_holistic_aggregates_match_numpy(data, n, ngroups):
    keys = np.array(
        data.draw(st.lists(st.integers(0, ngroups - 1),
                           min_size=n, max_size=n)),
        np.uint32,
    )
    vals = np.array(
        data.draw(st.lists(st.integers(-(2**31), 2**31 - 1),
                           min_size=n, max_size=n)),
        np.int32,
    )
    uk, outs, cnt = rst.hash_aggregate(
        jnp.asarray(keys), [jnp.asarray(vals)] * 6,
        ["median", "mode", "argmin", "argmax", "any", "count_distinct"],
    )
    cnt = int(cnt)
    uks = np.unique(keys)
    assert cnt == len(uks)
    for i, u in enumerate(uks):
        idx = np.flatnonzero(keys == u)
        g = vals[idx]
        assert np.asarray(outs[0])[i] == np.sort(g)[(len(g) - 1) // 2]
        v_, c_ = np.unique(g, return_counts=True)
        assert np.asarray(outs[1])[i] == v_[np.argmax(c_)]
        assert np.asarray(outs[2])[i] == idx[np.argmin(g)]
        assert np.asarray(outs[3])[i] == idx[np.argmax(g)]
        assert bool(np.asarray(outs[4])[i]) == (g != 0).any()
        assert np.asarray(outs[5])[i] == len(v_)
