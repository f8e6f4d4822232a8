"""Slow-but-trusted reference executor (jnp-only, runs anywhere).

Plays the role the std-lib stable comparison sort plays in the reference's
tests (src/radix_sort/tests.rs:7-23): a trusted oracle the fast engine is
checked against bit-exactly. Built on the same order-preserving encode as
the engine plus XLA's stable ``argsort`` comparator sort.
"""

from __future__ import annotations

import jax.numpy as jnp

from radix_sort_tpu import keys as K

__all__ = ["sort_oracle", "argsort_oracle", "sort_pairs_oracle"]


def argsort_oracle(keys: jnp.ndarray) -> jnp.ndarray:
    """Stable argsort under the dtype's total order (IEEE total_cmp for floats)."""
    return jnp.argsort(K.encode(keys), stable=True)


def sort_oracle(keys: jnp.ndarray) -> jnp.ndarray:
    """Total-order sort. Bitwise-exact: ties (e.g. NaN payloads) keep input order."""
    enc = jnp.sort(K.encode(keys), stable=True)
    return K.decode(enc, keys.dtype)


def sort_pairs_oracle(keys: jnp.ndarray, values: jnp.ndarray):
    """Stable key/payload sort (reference tuple semantics, radix_digits.rs:126-136)."""
    perm = argsort_oracle(keys)
    return keys[perm], values[perm]
