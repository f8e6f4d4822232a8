"""Public sort API (the L3 layer).

TPU-native equivalent of the reference's extension traits on slices
(``RadixSort::radix_sort`` at mod.rs:18-20 and the ``RadixSortCopyOnly``
variant ladder at mod.rs:22-38), as pure functions over arrays:

    sort(keys)                 -- stable total-order sort, any supported dtype
    argsort(keys)              -- stable sorting permutation
    sort_pairs(keys, values)   -- stable key/payload row sort (tuple semantics)
    counting_sort(x)           -- single-pass counting sort for uint8

``implementation`` selects an engine from the variant ladder; "auto" picks
the fastest available for the backend. All engines produce bit-identical
output (enforced by tests against the oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu import config
from radix_sort_tpu import keys as K
from radix_sort_tpu.ops import xla_radix

__all__ = [
    "sort",
    "argsort",
    "sort_pairs",
    "sort_limbs",
    "sort128",
    "argsort128",
    "sort_pairs128",
    "counting_sort",
    "IMPLEMENTATIONS",
]


def _words_engines():
    # name -> (sort_words, argsort_words)
    from radix_sort_tpu.ops import pallas_sort  # local import: optional backend

    return {
        "comparator": (
            # keys-only sort: equal words are indistinguishable, so the
            # unstable network gives the identical array ~20% faster;
            # argsort keeps stability (permutation IS observable)
            lambda w: jnp.sort(w, stable=False),
            lambda w: jnp.argsort(w, stable=True),
        ),
        "oracle": (
            lambda w: jnp.sort(w, stable=True),
            lambda w: jnp.argsort(w, stable=True),
        ),
        "xla_argsort": (
            xla_radix.radix_sort_words_argsort,
            xla_radix.radix_argsort_words_argsort,
        ),
        "xla_rank": (
            xla_radix.radix_sort_words_rank,
            xla_radix.radix_argsort_words_rank,
        ),
        "pallas": (
            pallas_sort.sort_words,
            pallas_sort.argsort_words,
        ),
    }


IMPLEMENTATIONS = (
    "auto", "comparator", "oracle", "xla_argsort", "xla_rank", "pallas",
)


def _resolve(implementation: str) -> str:
    if implementation == "auto":
        # "auto" follows the active config's default engine (measured per
        # chip; scratch/NOTES.md tracks the comparator/pipeline crossover)
        return config.get().default_implementation
    if implementation not in IMPLEMENTATIONS:
        raise ValueError(
            f"implementation must be one of {IMPLEMENTATIONS}, got {implementation!r}"
        )
    return implementation


def sort(keys: jnp.ndarray, *, implementation: str = "auto") -> jnp.ndarray:
    """Stable ascending sort under the dtype's total order.

    Equivalent to the reference's ``data.radix_sort()`` on scalar slices
    (mod.rs:61-176): floats order by IEEE total_cmp (incl. -0.0 < +0.0, NaNs
    by sign/payload), signed ints by value.
    """
    if implementation == "auto" and np.dtype(keys.dtype).itemsize == 1:
        # byte-wide keys-only: the single-pass counting sort (mod.rs:40-59)
        # is ~4x the comparator here — two fused compare-sum passes, no
        # element movement at all (keys-only, so stability is vacuous)
        return K.decode(xla_radix.counting_sort_u8(K.encode(keys)), keys.dtype)
    impl = _resolve(implementation)
    sort_words, _ = _words_engines()[impl]
    return K.decode(sort_words(K.encode(keys)), keys.dtype)


def argsort(keys: jnp.ndarray, *, implementation: str = "auto") -> jnp.ndarray:
    """Indices of the stable total-order sort."""
    impl = _resolve(implementation)
    _, argsort_words = _words_engines()[impl]
    return argsort_words(K.encode(keys))


def sort_pairs(keys: jnp.ndarray, values: jnp.ndarray, *, implementation: str = "auto"):
    """Stable sort of (key, payload) rows by key.

    Equivalent to the reference's tuple sort (radix_digits.rs:126-136): the
    payload never influences the order; equal keys keep input payload order
    (the stability invariant of mod.rs:110-120, tested at tests.rs:175-187).
    """
    if values.shape[:1] != keys.shape[:1]:
        raise ValueError(
            f"keys and values must share the leading axis, got {keys.shape} vs {values.shape}"
        )
    impl = _resolve(implementation)
    if impl == "pallas":
        from radix_sort_tpu.ops import pallas_sort

        words, out_vals = pallas_sort.sort_pairs_words(K.encode(keys), values)
        return K.decode(words, keys.dtype), out_vals
    if impl == "comparator":
        # one variadic sort — argsort + two x[perm] gathers run ~30x slower
        # than the sort itself on this chip (gathers are ~2us/element)
        words, out_vals = jax.lax.sort(
            [K.encode(keys), values], num_keys=1, is_stable=True
        )
        return K.decode(words, keys.dtype), out_vals
    perm = argsort(keys, implementation=impl)
    return keys[perm], values[perm]


def counting_sort(x: jnp.ndarray) -> jnp.ndarray:
    """Single-pass counting sort for uint8 (reference mod.rs:40-59)."""
    return xla_radix.counting_sort_u8(x)


def sort_limbs(key_words, value_words=(), *, implementation: str = "auto"):
    """Stable co-sort by a multi-word big-endian unsigned key.

    ``key_words``: most-significant-first uint32 limbs (any count — this is
    how arbitrarily wide keys sort on 32-bit TPU lanes, covering the
    reference's u128/usize impls, radix_digits.rs:37-53). ``value_words``:
    additional uint32 arrays carried along. Returns the co-sorted lists
    ``(key_words, value_words)``.
    """
    key_words = list(key_words)
    value_words = list(value_words)
    if not key_words:
        raise ValueError("sort_limbs needs at least one key word")
    n = key_words[0].shape[0]
    for a in key_words + value_words:
        if a.shape[0] != n or a.dtype != jnp.uint32:
            raise ValueError("all limbs must be uint32 arrays of equal length")
    impl = _resolve(implementation)
    nk = len(key_words)
    if impl == "pallas" and n >= config.get().min_pipeline_n:
        from radix_sort_tpu.ops import sample_sort

        out = sample_sort.sample_sort_words(key_words + value_words, nk)
    else:
        out = jax.lax.sort(
            key_words + value_words, num_keys=nk, is_stable=True
        )
    return list(out[:nk]), list(out[nk:])


def sort128(hi, lo, *, signed: bool = False, implementation: str = "auto"):
    """Stable sort of 128-bit keys held as (hi, lo) 64-bit words.

    The reference's u128/i128 key types (radix_digits.rs:37-53, 87-93) on a
    32-bit-lane TPU: keys travel as 4 big-endian uint32 limbs
    (:func:`radix_sort_tpu.keys.encode128`). ``signed`` selects i128 (hi is
    int64). Returns the sorted (hi, lo) pair.
    """
    limbs = K.encode128(hi, lo, signed=signed)
    out, _ = sort_limbs(limbs, implementation=implementation)
    return K.decode128(out, signed=signed)


def argsort128(hi, lo, *, signed: bool = False, implementation: str = "auto"):
    """Indices of the stable 128-bit total-order sort."""
    limbs = K.encode128(hi, lo, signed=signed)
    idx = jnp.arange(hi.shape[0], dtype=jnp.uint32)
    _, vals = sort_limbs(limbs, [idx], implementation=implementation)
    return vals[0].astype(jnp.int32)


def sort_pairs128(hi, lo, values, *, signed: bool = False,
                  implementation: str = "auto"):
    """Stable 128-bit key / uint32-payload row sort (tuple semantics,
    radix_digits.rs:126-136). Returns ((hi, lo), values)."""
    if values.dtype != jnp.uint32:
        raise TypeError(f"values must be uint32 words, got {values.dtype}")
    limbs = K.encode128(hi, lo, signed=signed)
    out, vals = sort_limbs(limbs, [values], implementation=implementation)
    return K.decode128(out, signed=signed), vals[0]
