"""Production single-chip sort engine (Pallas TPU kernels).

Placeholder wiring for now: falls back to the stable XLA comparator sort so
the public API and benches run end-to-end while the Pallas pass pipeline
(tile histogram -> digit-major/tile-minor exclusive scan -> stable scatter
with ping-pong HBM buffers; see SURVEY.md section 7 stage 3) lands.
"""

from __future__ import annotations

import jax.numpy as jnp

import jax

__all__ = ["sort_words", "argsort_words", "sort_pairs_words", "sort_pairs_limbs"]


def sort_pairs_limbs(khi, klo, vhi, vlo):
    """Stable sort of u64 key/payload rows held as u32 limb pairs.

    Limb form is the device-native 64-bit representation (TPU lanes are
    32-bit); lexicographic (hi, lo) order == u64 order (keys.split64).
    """
    return tuple(
        jax.lax.sort([khi, klo, vhi, vlo], num_keys=2, is_stable=True)
    )


def sort_words(words: jnp.ndarray) -> jnp.ndarray:
    return jnp.sort(words, stable=True)


def argsort_words(words: jnp.ndarray) -> jnp.ndarray:
    return jnp.argsort(words, stable=True)


def sort_pairs_words(words: jnp.ndarray, values: jnp.ndarray):
    perm = argsort_words(words)
    return words[perm], values[perm]
