"""Production single-chip sort: MSD sample-sort over Pallas run extraction.

The TPU-native equivalent of the reference's production `radix_sort`
(src/radix_sort/mod.rs:61-176). The reference's per-pass phases map as:

  per-chunk histogram (mod.rs:90-109)   -> stable XLA rowsort of m-element
                                           chunks + one-hot run counts
  digit-major prefix sum (mod.rs:110-120) -> cumulative splitter counts
                                           (bounds); cross-chunk order comes
                                           from the sequential extraction grid
  buffered stable scatter (mod.rs:121-168) -> Pallas bucket_extract (packed
                                           run append, 4 KiB streaming DMA)

Structure (2 rounds, K buckets each, then a final in-chunk sort):

  pad -> rowsort(m) -> splitters -> extract K buckets
      -> rowsort(m) -> per-bucket splitters -> extract K^2 buckets
      -> rowsort(bucket) -> compact -> unpad

Buckets are ranged on composite (key, position) splitters, so the partition
is balanced for ANY input distribution — including all-equal keys (the
reference's duplicate-heavy StepUniform, src/distr.rs:78-106) — and the
position tiebreak preserves stability end to end. A capacity-overflow flag
falls back to the XLA comparator sort inside lax.cond, so the result is
always correct even under adversarially unbalanced splitter samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu.ops import extract

from radix_sort_tpu import config

__all__ = ["sample_sort_words"]

LANES = 128
_MAX = np.uint32(0xFFFFFFFF)


def _lex_ge(key_words, pos, s_words, s_pos):
    """(key..., pos) >= (s_key..., s_pos), elementwise over broadcast."""
    ge = pos >= s_pos
    for ew, sw in reversed(list(zip(key_words, s_words))):
        ge = (ew > sw) | ((ew == sw) & ge)
    return ge


def _rowsort(ops, m, num_keys):
    rows = [o.reshape(-1, m) for o in ops]
    out = jax.lax.sort(rows, dimension=1, num_keys=num_keys, is_stable=True)
    return [o.reshape(-1) for o in out]


def _bucket_ids(ops, num_keys, m, splits_w, splits_p, valid_len):
    """bid per element vs its chunk's splitter set; invalid elements -> K.

    ops: key word arrays (Nr,) viewed as (nchunks, m); splits_*: (nchunks, K-1)
    per-chunk splitters (already repeated per chunk); valid_len: (nchunks,).
    Returns bounds (nchunks, K+1) int32 (cumulative run starts + valid len).
    """
    K = splits_w[0].shape[1] + 1
    nchunks = splits_w[0].shape[0]
    kw = [o.reshape(nchunks, m) for o in ops[:num_keys]]
    pos = jax.lax.broadcasted_iota(jnp.int32, (nchunks, m), 1)
    vl = valid_len[:, None]
    # Chunks are sorted by (key, pos), so "< splitter_t" is a prefix and the
    # run start for bucket t+1 is simply the clamped prefix count — no
    # per-element bucket ids or histograms needed (the clamp also excludes
    # sentinel rows, which sit at positions >= valid_len).
    cols = [jnp.zeros((nchunks, 1), jnp.int32)]
    for t in range(K - 1):
        lt = ~_lex_ge(
            kw,
            pos,
            [sw[:, t][:, None] for sw in splits_w],
            splits_p[:, t][:, None],
        )
        cnt = lt.astype(jnp.int32).sum(axis=1, keepdims=True)
        cols.append(jnp.minimum(cnt, vl))
    cols.append(vl)
    return jnp.concatenate(cols, axis=1)


def _round1_splitters(ops, num_keys, m, K, samples_per_chunk):
    """Composite (key, pos) quantile splitters from the sorted chunks."""
    nchunks = ops[0].shape[0] // m
    s = samples_per_chunk
    js = (np.arange(s) * m) // s + m // (2 * s)
    rows = [o.reshape(nchunks, m) for o in ops[:num_keys]]
    samp_w = [r[:, js].reshape(-1) for r in rows]
    base = jnp.arange(nchunks, dtype=jnp.int32)[:, None] * m
    samp_p = (base + jnp.asarray(js, jnp.int32)[None, :]).reshape(-1)
    srt = jax.lax.sort(samp_w + [samp_p], num_keys=num_keys + 1, is_stable=True)
    total = nchunks * s
    q = ((np.arange(K - 1) + 1) * total) // K
    sw = [x[q] for x in srt[:num_keys]]
    sp = srt[num_keys][q]
    return sw, sp  # each (K-1,)


def _round2_splitters(ops, num_keys, counts, cap_elems, K, n_samples):
    """Per-bucket splitters sampled at count-quantile positions."""
    nb = counts.shape[0]
    frac = (2 * jnp.arange(n_samples, dtype=jnp.int32) + 1)
    pos = (frac[None, :] * counts[:, None]) // (2 * n_samples)  # (nb, S)
    flat = pos + jnp.arange(nb, dtype=jnp.int32)[:, None] * cap_elems
    samp_w = [o.reshape(-1)[flat] for o in ops[:num_keys]]  # (nb, S)
    srt = jax.lax.sort(
        samp_w + [pos], dimension=1, num_keys=num_keys + 1, is_stable=True
    )
    q = ((np.arange(K - 1) + 1) * n_samples) // K
    sw = [x[:, q] for x in srt[:num_keys]]
    sp = srt[num_keys][:, q]
    return sw, sp  # each (nb, K-1)


def _ceil_to(x, mult):
    return -(-x // mult) * mult


def sample_sort_words(
    ops,
    num_keys,
    *,
    m=None,
    K=None,
    alpha=None,
    samples1=None,
    samples2=None,
    interpret=None,
):
    """Stable sort of parallel uint32 arrays by the first ``num_keys`` words.

    All arrays are co-sorted; keys compare lexicographically (the caller maps
    dtypes into rank-space words, 64-bit keys as hi/lo limbs). Returns the
    sorted list. Unset knobs resolve from the active EngineConfig
    (config.get()) at call time.
    """
    cfg = config.get()
    m = cfg.chunk_elems if m is None else m
    K = cfg.buckets_per_round if K is None else K
    alpha = cfg.capacity_factor if alpha is None else alpha
    samples1 = cfg.round1_samples_per_chunk if samples1 is None else samples1
    samples2 = cfg.round2_samples if samples2 is None else samples2
    W = len(ops)
    N = ops[0].shape[0]
    _orig = list(ops)  # for the overflow fallback branch

    # pad to a multiple of 8*m (the bounds SMEM blocking needs nchunks % 8 == 0)
    Np = _ceil_to(max(N, 8 * m), 8 * m)
    if Np != N:
        pad = jnp.full((Np - N,), _MAX, jnp.uint32)
        ops = [jnp.concatenate([o, pad]) for o in ops]
    nchunks = Np // m

    # ---- round 1
    ops = _rowsort(ops, m, num_keys)
    sw1, sp1 = _round1_splitters(ops, num_keys, m, K, samples1)
    sw1 = [jnp.broadcast_to(w[None, :], (nchunks, K - 1)) for w in sw1]
    # splitter positions are global; _bucket_ids compares within-chunk
    # positions, so shift into each chunk's local coordinates
    sp1_local = (
        sp1[None, :] - (jnp.arange(nchunks, dtype=jnp.int32) * m)[:, None]
    )
    vl1 = jnp.full((nchunks,), m, jnp.int32)
    bounds1 = _bucket_ids(ops, num_keys, m, sw1, sp1_local, vl1)

    # region capacity: multiple of m (round-2 chunking) and of 1024 (DMA rows)
    cap1 = _ceil_to(int(alpha * Np / K) + m, max(m, 1024))
    outs1, counts1 = extract.bucket_extract(
        [o.reshape(-1, LANES) for o in ops],
        bounds1,
        K=K,
        cap_rows=cap1 // LANES,
        chunks_per_bucket=nchunks,
        nbuckets=1,
        interpret=interpret,
    )
    ops = [o.reshape(-1) for o in outs1]
    over1 = jnp.any(counts1 > cap1 - 9 * LANES)

    # ---- round 2 (per-bucket, batched)
    ops = _rowsort(ops, m, num_keys)
    cpb = cap1 // m  # chunks per bucket
    nchunks2 = K * cpb
    sw2, sp2 = _round2_splitters(ops, num_keys, counts1, cap1, K, samples2)
    sw2 = [jnp.repeat(w, cpb, axis=0) for w in sw2]  # (nchunks2, K-1)
    sp2 = jnp.repeat(sp2, cpb, axis=0)
    # valid length per chunk, and positions local to the bucket
    cib = jnp.tile(jnp.arange(cpb, dtype=jnp.int32), K)
    vl2 = jnp.clip(jnp.repeat(counts1, cpb) - cib * m, 0, m)
    # _bucket_ids uses within-chunk iota for pos; splitter pos is within-bucket.
    # Shift splitter positions into within-chunk coordinates per chunk.
    sp2_local = sp2 - (cib * m)[:, None]
    bounds2 = _bucket_ids(ops, num_keys, m, sw2, sp2_local, vl2)

    cap2 = _ceil_to(int(alpha * Np / (K * K)) + 1024, 1024)
    outs2, counts2 = extract.bucket_extract(
        [o.reshape(-1, LANES) for o in ops],
        bounds2,
        K=K,
        cap_rows=cap2 // LANES,
        chunks_per_bucket=cpb,
        nbuckets=K,
        interpret=interpret,
    )
    ops = [o.reshape(-1) for o in outs2]
    over2 = jnp.any(counts2 > cap2 - 9 * LANES)

    # ---- final: sort each region in one row, then compact valid prefixes
    ops = _rowsort(ops, cap2, num_keys)
    dense, total = extract.compact_regions(
        [o.reshape(-1, LANES) for o in ops],
        counts2,
        cap_rows=cap2 // LANES,
        interpret=interpret,
    )
    result = [o.reshape(-1)[:N] for o in dense]

    # ---- overflow fallback: correctness under adversarial splitter samples
    overflow = over1 | over2

    def fallback(_):
        srt = jax.lax.sort(
            [o[:N] for o in _orig], num_keys=num_keys, is_stable=True
        )
        return list(srt)

    def keep(r):
        return list(r)

    # note: _orig closed over below (set before padding mutations)
    return jax.lax.cond(overflow, fallback, keep, result)
