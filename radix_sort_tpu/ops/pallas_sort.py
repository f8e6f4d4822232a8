"""Production single-chip engine wiring (Pallas sample-sort).

Maps the public word-level sort entry points onto the MSD sample-sort
pipeline (ops/sample_sort.py: XLA rowsorts + Pallas bucket extraction).
64-bit words travel as (hi, lo) u32 limb pairs — TPU vector lanes are
32-bit and the axon x64 rewriter rejects 64-bit bitcasts on device.

``sort_pairs_limbs`` (the flagship bench path: u64 key / u64 payload rows
as limb quadruples) defaults to the XLA comparator sort, which currently
wins at the benchmark sizes; ``engine="sample"`` selects the Pallas
pipeline. The crossover is tracked in scratch/NOTES.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu import keys as K
from radix_sort_tpu.ops import sample_sort

__all__ = [
    "sort_words",
    "argsort_words",
    "sort_pairs_words",
    "sort_pairs_limbs",
]

from radix_sort_tpu import config


def _min_pipeline_n():
    """Below this the pipeline's chunk padding dominates; use the comparator
    (hybrid small-N cutoff, like the reference engine's single-chunk regime).
    Read at call time so config.override retunes it."""
    return config.get().min_pipeline_n


def _word_ops(words):
    """words (uint32/uint64) -> (list of u32 ops, num_key_words)."""
    if words.dtype == jnp.uint64:
        hi, lo = K.split64(words)
        return [hi, lo], 2
    if words.dtype == jnp.uint32:
        return [words], 1
    # sub-32-bit rank words widen losslessly
    return [words.astype(jnp.uint32)], 1


def _restore(ops, dtype):
    if np.dtype(dtype) == np.uint64:
        return K.merge64(ops[0], ops[1])
    return ops[0].astype(dtype)


def sort_words(words: jnp.ndarray) -> jnp.ndarray:
    if words.shape[0] < _min_pipeline_n():
        return jnp.sort(words, stable=True)
    ops, nk = _word_ops(words)
    out = sample_sort.sample_sort_words(ops, nk)
    return _restore(out, words.dtype)


def argsort_words(words: jnp.ndarray) -> jnp.ndarray:
    if words.shape[0] < _min_pipeline_n():
        return jnp.argsort(words, stable=True)
    ops, nk = _word_ops(words)
    idx = jnp.arange(words.shape[0], dtype=jnp.uint32)
    out = sample_sort.sample_sort_words(ops + [idx], nk)
    return out[nk].astype(jnp.int32)


def sort_pairs_words(words: jnp.ndarray, values: jnp.ndarray):
    if words.shape[0] < _min_pipeline_n():
        srt = jax.lax.sort(
            [words, values], num_keys=1, is_stable=True
        )
        return srt[0], srt[1]
    ops, nk = _word_ops(words)
    vdt = values.dtype
    if np.dtype(vdt).itemsize == 8:
        # bitcast-free for integer payloads (astype int64->uint64 is a
        # two's-complement wrap, bit preserving); f64 payloads need a real
        # bitcast and remain CPU-backend-only under the axon relay
        if vdt == jnp.uint64:
            vw = values
        elif vdt == jnp.int64:
            vw = values.astype(jnp.uint64)
        else:
            vw = values.view(jnp.uint64)
        vhi, vlo = K.split64(vw)
        vops = [vhi, vlo]
    elif np.dtype(vdt).itemsize == 4:
        vops = [values.view(jnp.uint32)]
    else:
        vops = [values.view(np.dtype(f"u{np.dtype(vdt).itemsize}")).astype(jnp.uint32)]
    out = sample_sort.sample_sort_words(ops + vops, nk)
    sorted_words = _restore(out[:nk], words.dtype)
    vout = out[nk:]
    if np.dtype(vdt).itemsize == 8:
        vals = K.merge64(vout[0], vout[1])
        if vdt == jnp.int64:
            vals = vals.astype(jnp.int64)
        elif vdt != jnp.uint64:
            vals = vals.view(vdt)
    elif np.dtype(vdt).itemsize == 4:
        vals = vout[0].view(vdt)
    else:
        vals = vout[0].astype(np.dtype(f"u{np.dtype(vdt).itemsize}")).view(vdt)
    return sorted_words, vals


def sort_pairs_limbs(khi, klo, vhi, vlo, engine: str = "auto"):
    """Stable sort of u64 key/payload rows held as u32 limb quadruples.

    Lexicographic (hi, lo) order == u64 order (keys.split64). ``engine``:
    "comparator" (XLA variadic sort), "sample" (Pallas pipeline), or "auto"
    (the active config's default engine).
    """
    if engine == "auto":
        default = config.get().default_implementation
        engine = "sample" if default in ("pallas", "sample") else "comparator"
    if engine == "sample":
        out = sample_sort.sample_sort_words([khi, klo, vhi, vlo], 2)
        return tuple(out)
    return tuple(
        jax.lax.sort([khi, klo, vhi, vlo], num_keys=2, is_stable=True)
    )
