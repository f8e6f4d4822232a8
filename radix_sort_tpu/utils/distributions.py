"""On-device input-distribution generators (the L4 layer).

TPU-native equivalent of the reference's src/distr.rs: instead of host-side
``rand``/``rand_distr`` iterators, these are pure ``jax.random`` samplers
that generate benchmark data directly in HBM (no host->device transfer).

  key_uniform    -- uniform keys over the full dtype range, payload = 0
                    (distr.rs:40-52 KeyUniform)
  zipf           -- Zipf(s) over the full key range (distr.rs:54-76 ZipfU32,
                    distr.rs:108-130 ZipfU64); inverse-CDF of the continuous
                    bounded power law (the discrete rejection-inversion loop
                    of rand_distr is host-sequential and XLA-hostile; for
                    benchmark skew the continuous approximation is standard)
  geometric      -- Geometric(lambda) (distr.rs:4-38 MyExp)
  step_uniform   -- n equally spaced distinct values, duplicate-heavy
                    (distr.rs:78-106, 132-160 StepUniformU32/U64)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["key_uniform", "zipf", "geometric", "step_uniform", "make_pairs"]

_UINT_DTYPES = (np.uint8, np.uint16, np.uint32, np.uint64)


def _uniform_bits(key, n: int, dtype) -> jnp.ndarray:
    dtype = np.dtype(dtype)
    if dtype == np.uint64:
        hi, lo = jax.random.split(key)
        h = jax.random.bits(hi, (n,), jnp.uint32).astype(jnp.uint64)
        l = jax.random.bits(lo, (n,), jnp.uint32).astype(jnp.uint64)
        return (h << np.uint64(32)) | l
    return jax.random.bits(key, (n,), dtype)


def key_uniform(key, n: int, dtype=jnp.uint32) -> jnp.ndarray:
    """Uniform keys over the full unsigned range (distr.rs:42-51)."""
    return _uniform_bits(key, n, dtype)


def zipf(key, n: int, dtype=jnp.uint32, s: float = 1.1) -> jnp.ndarray:
    """Zipf(s)-distributed keys over [1, dtype::MAX] (distr.rs:60-63, 114-117).

    Inverse-CDF sampling of the bounded continuous power law p(x) ~ x^-s on
    [1, M]: heavy mass on small keys, controlled by s -- the skew profile
    the splitter-sampled distributed shuffle is tested against.
    """
    dtype = np.dtype(dtype)
    m = float(np.iinfo(dtype).max)
    u = jax.random.uniform(key, (n,), jnp.float32, minval=1e-7, maxval=1.0)
    if abs(s - 1.0) < 1e-6:
        x = jnp.exp(u * np.log(m))
    else:
        t = 1.0 - s
        x = (1.0 + u * (m**t - 1.0)) ** (1.0 / t)
    x = jnp.clip(x, 1.0, m)
    # float -> int via float64-free path: values above 2**31 need care on TPU
    if dtype == np.uint64:
        return x.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32).astype(
            jnp.uint64
        )
    return jnp.minimum(x, m).astype(jnp.uint32).astype(dtype)


def geometric(key, n: int, lam: float = 0.01, dtype=jnp.uint32) -> jnp.ndarray:
    """Geometric(lambda): # failures before first success (distr.rs:17-19)."""
    u = jax.random.uniform(key, (n,), jnp.float32, minval=1e-37, maxval=1.0)
    g = jnp.floor(jnp.log(u) / np.log1p(-lam))
    m = float(np.iinfo(np.dtype(dtype)).max)
    return jnp.minimum(g, m).astype(dtype)


def step_uniform(key, n: int, num_steps: int, dtype=jnp.uint32) -> jnp.ndarray:
    """Uniform choice among ``num_steps`` equally spaced values
    s*(1+i), s = MAX/(num_steps+1) (distr.rs:83-92, 137-146): a duplicate-heavy
    distribution stressing bin-count skew."""
    dtype = np.dtype(dtype)
    step = np.iinfo(dtype).max // (num_steps + 1)
    i = jax.random.randint(key, (n,), 0, num_steps, jnp.uint32)
    if dtype == np.uint64:
        return (i.astype(jnp.uint64) + np.uint64(1)) * np.uint64(step)
    return ((i + np.uint32(1)) * np.uint32(step)).astype(dtype)


def make_pairs(keys: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(key, payload=0) rows, mirroring the reference's tuple Distribution
    impls (e.g. distr.rs:47-51): payload is a zero word of the key width."""
    return keys, jnp.zeros_like(keys)
