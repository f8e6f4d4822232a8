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
