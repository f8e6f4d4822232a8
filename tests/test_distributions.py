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
