"""Distribution generator tests (reference src/distr.rs): shape/dtype/range
plus the statistical properties the distributed shuffle relies on (Zipf
skew, StepUniform duplicate structure)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radix_sort_tpu.utils import distributions as D

KEY = jax.random.PRNGKey(7)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32, np.uint64])
def test_key_uniform_range_and_spread(dtype):
    x = np.asarray(D.key_uniform(KEY, 50_000, dtype))
    assert x.dtype == dtype
    info = np.iinfo(dtype)
    # uniform over the full range: mean near midpoint, both halves populated
    mid = info.max // 2
    assert 0.45 < np.mean(x > mid) < 0.55


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_zipf_skew(dtype):
    x = np.asarray(D.zipf(KEY, 50_000, dtype, s=1.5))
    assert x.dtype == dtype
    assert x.min() >= 1
    # heavy skew toward small keys: median tiny relative to the key range
    assert np.median(x) < np.iinfo(dtype).max / 1e6


def test_geometric():
    x = np.asarray(D.geometric(KEY, 50_000, lam=0.25))
    # mean of Geometric(p) (failures before success) = (1-p)/p = 3
    assert 2.5 < x.mean() < 3.5
    assert x.min() == 0


@pytest.mark.parametrize("dtype", [np.uint32, np.uint64])
def test_step_uniform(dtype):
    n_steps = 17
    x = np.asarray(D.step_uniform(KEY, 20_000, n_steps, dtype))
    vals = np.unique(x)
    assert len(vals) <= n_steps
    step = np.iinfo(dtype).max // (n_steps + 1)
    # every value is s*(1+i) (distr.rs:83-92)
    assert np.all(vals % step == 0)


def test_make_pairs():
    k = D.key_uniform(KEY, 100, np.uint32)
    keys, payload = D.make_pairs(k)
    assert np.all(np.asarray(payload) == 0)
    assert payload.dtype == keys.dtype


def _merge(hi, lo):
    return (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo
    ).astype(np.uint64)


class TestU64Limbs:
    """Genuine 64-bit-domain limb samplers (ZipfU64/StepUniformU64/MyExp-u64,
    distr.rs:108-160): skew must shape the full 64-bit value, and the 32-bit
    invariants must carry over."""

    def test_step_uniform_exact_values(self):
        n_steps = 1000
        v = _merge(*D.step_uniform_limbs(KEY, 50_000, n_steps))
        step = (2**64 - 1) // (n_steps + 1)
        vals = np.unique(v)
        assert len(vals) <= n_steps
        assert np.all(vals % np.uint64(step) == 0)
        assert vals.max() <= np.uint64(step) * np.uint64(n_steps)

    def test_zipf_log_uniform_at_s1(self):
        v = _merge(*D.zipf_limbs(KEY, 50_000, s=1.0))
        l2 = np.log2(v.astype(np.float64) + 1)
        assert 30.0 < l2.mean() < 34.0  # log2 ~ Uniform[0, 64)
        assert 0.4 < np.mean(v > np.uint64(2**32)) < 0.6

    def test_zipf_skew_and_duplicates(self):
        v = _merge(*D.zipf_limbs(KEY, 50_000, s=1.5))
        assert np.median(v) < 2**20  # mass at small keys
        small = v[v < 64]
        # true zipf structure: small values repeat heavily
        assert len(small) > 100 and len(np.unique(small)) < len(small) // 10
        # (full-range coverage is asserted by the s=1.0 log-uniform test:
        # at s=1.5, P(X > 2**32) ~ 2**-16 — too rare for 50k samples)

    def test_geometric_mean(self):
        v = _merge(*D.geometric_limbs(KEY, 50_000, lam=1e-9))
        assert 0.7e9 < v.astype(np.float64).mean() < 1.4e9

    def test_uniform_limbs(self):
        v = _merge(*D.key_uniform_limbs(KEY, 50_000))
        assert 0.45 < np.mean(v > np.uint64(2**63)) < 0.55
