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

Structure (R planned rounds of K_r buckets, then a final in-chunk sort):

  pad -> [rowsort(m) -> splitters -> extract K_r buckets] * R
      -> rowsort(final cap) -> compact -> unpad

The planner picks the fewest rounds whose bucket product brings regions down
to ~final_chunk_target elements, so the final rowsort always runs at a small
chunk length (the multi-op comparator rowsort cost grows superlinearly in
chunk length — a 2-round plan at large N would leave 10x-oversized leaves).

Buckets are ranged on composite (key, position) splitters, so the partition
is balanced for ANY input distribution — including all-equal keys (the
reference's duplicate-heavy StepUniform, src/distr.rs:78-106) — and the
position tiebreak preserves stability end to end. A capacity-overflow flag
falls back to the XLA comparator sort inside lax.cond, so the result is
always correct even under adversarially unbalanced splitter samples.
"""

from __future__ import annotations

import math

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
    """Composite (key, pos) quantile splitters from the sorted chunks.

    Sample LEVELS (within-chunk ranks) must be uniform: sampling every chunk
    at the same s quantile levels makes the pooled sorted sample a STEP
    function of s clusters, and splitters whose rank falls inside a cluster
    sit at near-duplicate values — the partition is then catastrophically
    unbalanced whenever K > s (that bug shipped in round 1 and silently
    pushed every large-K sort onto the comparator fallback). An odd-stride
    arithmetic progression of flat positions gives uniform levels with pure
    strided slices (see below).
    """
    N = ops[0].shape[0]
    nchunks = N // m
    total_target = max(K * 32, nchunks * samples_per_chunk)
    # ODD stride: positions p_i = phase + i*stride are a plain XLA strided
    # slice (device gathers measure ~2us/element here — unusable), and an
    # odd stride is coprime with the power-of-two chunk length, so the
    # within-chunk sample levels p_i mod m sweep all residues: pooled ranks
    # are uniform population quantiles.
    stride = max(1, N // total_target) | 1
    phase = stride // 2
    samp_w = [o[phase::stride] for o in ops[:num_keys]]
    total = samp_w[0].shape[0]
    samp_p = jnp.arange(total, dtype=jnp.int32) * np.int32(stride) + np.int32(
        phase
    )
    srt = jax.lax.sort(samp_w + [samp_p], num_keys=num_keys + 1, is_stable=True)
    q = ((np.arange(K - 1) + 1) * total) // K
    sw = [x[q] for x in srt[:num_keys]]
    sp = srt[num_keys][q]
    return sw, sp  # each (K-1,)


def _round2_splitters(ops, num_keys, counts, cap_elems, K, n_samples):
    """Per-region splitters from STATIC odd-stride positions over each
    region's capacity (a plain strided slice — device gathers are unusably
    slow). Samples at positions >= the region's valid count are sentinel
    rows; they sort to the tail (the sentinel's position is always >= count
    while every valid position is < count, so even real all-ones keys order
    before them), and the per-region quantile index is taken over the
    arithmetically known valid-sample count. Quantiles are picked with a
    one-hot select instead of a gather."""
    nb = counts.shape[0]
    stride = max(1, cap_elems // n_samples) | 1
    phase = stride // 2
    samp_w = [
        o.reshape(nb, cap_elems)[:, phase::stride] for o in ops[:num_keys]
    ]  # (nb, S)
    S = samp_w[0].shape[1]
    pos = jnp.arange(S, dtype=jnp.int32) * np.int32(stride) + np.int32(phase)
    posb = jnp.broadcast_to(pos[None, :], (nb, S))
    srt = jax.lax.sort(
        samp_w + [posb], dimension=1, num_keys=num_keys + 1, is_stable=True
    )
    # valid samples per region: positions strictly below the region count
    v = jnp.clip((counts - phase + stride - 1) // stride, 1, S)  # (nb,)
    q = (jnp.arange(1, K, dtype=jnp.int32)[None, :] * v[:, None]) // K
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (nb, K - 1, S), 2) == q[:, :, None]
    )
    def pick(x):
        return jnp.sum(jnp.where(onehot, x[:, None, :], 0), axis=2)
    sw = [pick(x).astype(x.dtype) for x in srt[:num_keys]]
    sp = pick(srt[num_keys])
    return sw, sp  # each (nb, K-1)


def _ceil_to(x, mult):
    return -(-x // mult) * mult


def _rounds_needed(nleaves, K_max):
    R, cov = 1, max(2, K_max)
    while cov < nleaves:
        cov *= max(2, K_max)
        R += 1
    return R


def _balanced_plan(nleaves, K_max):
    R = _rounds_needed(nleaves, K_max)
    Ks, rem = [], nleaves
    for r in range(R):
        k = int(round(rem ** (1.0 / (R - r))))
        while k ** (R - r) < rem:
            k += 1
        k = max(2, min(k, K_max))
        Ks.append(k)
        rem = -(-rem // k)
    return Ks


def _plan(Np, K_max, final_target):
    """Bucket counts per round: fewest rounds covering Np/final_target leaf
    regions, with a SMALL last-round fan-out when it costs no extra round.

    The last round's splitter sampling must resolve leaf capacities to an
    absolute margin of a few hundred rows; the needed sample count grows as
    (parent_region / margin)^2, so small leaf fan-out (small parent regions)
    keeps the last-round sample sort cheap at any scale."""
    nleaves = max(2, -(-Np // final_target))
    if nleaves <= max(2, K_max):
        return [nleaves]
    R0 = _rounds_needed(nleaves, K_max)
    for k_last in (8, 12, 16, 24, 32):
        if k_last > K_max:
            break
        rest = -(-nleaves // k_last)
        if _rounds_needed(rest, K_max) <= R0 - 1:
            return _balanced_plan(rest, K_max) + [k_last]
    return _balanced_plan(nleaves, K_max)


def _next_cap(Np, nreg, alpha, m, last):
    """Per-region element capacity after splitting into nreg regions.

    Intermediate rounds re-chunk regions at m (cap % m == 0) and the extract
    kernel needs total chunks % 8 == 0 and cap_rows % 8 == 0; the final
    round's cap only feeds the leaf rowsort + compactor (1024-row DMA)."""
    base = int(alpha * Np / nreg)
    if last:
        # headroom for splitter sampling error only (the fine-grained drain
        # writes exactly ceil(count/128) rows, so capacity == count
        # suffices); the adaptive sampler solves its sample count against
        # this margin.
        return _ceil_to(base + max(base // 8, 512), 1024)
    g = 8 // math.gcd(nreg, 8)
    return _ceil_to(base + m, math.lcm(m * g, 1024))


def sample_sort_words(
    ops,
    num_keys,
    *,
    m=None,
    K=None,
    alpha=None,
    samples1=None,
    samples2=None,
    rounds=None,
    interpret=None,
):
    """Stable sort of parallel uint32 arrays by the first ``num_keys`` words.

    All arrays are co-sorted; keys compare lexicographically (the caller maps
    dtypes into rank-space words, 64-bit keys as hi/lo limbs). Returns the
    sorted list. Unset knobs resolve from the active EngineConfig
    (config.get()) at call time; ``K`` is the per-round bucket ceiling and
    ``rounds`` (a list of bucket counts) overrides the planner.
    """
    cfg = config.get()
    if m is None:
        m = cfg.chunk_elems
    if not m:  # auto: balance rowsort (log^2 m) vs extract appends (N*K/m)
        m = 8192 if ops[0].shape[0] >= (1 << 26) else 4096
    if m % LANES != 0 or m & (m - 1):
        # non-multiple-of-128 breaks the kernels' row blocking with opaque
        # reshape errors; a non-power-of-two silently defeats the odd-stride
        # splitter-uniformity argument (stride must be coprime with m)
        raise ValueError(
            f"chunk_elems must be a power of two and a multiple of {LANES}, "
            f"got {m}"
        )
    K = cfg.buckets_per_round if K is None else K
    alpha = cfg.capacity_factor if alpha is None else alpha
    samples1 = cfg.round1_samples_per_chunk if samples1 is None else samples1
    samples2 = cfg.round2_samples if samples2 is None else samples2
    N = ops[0].shape[0]
    _orig = list(ops)  # for the overflow fallback branch

    if (
        jax.config.jax_enable_x64
        and jax.default_backend() == "tpu"
        and interpret is not True
    ):
        # the axon x64 rewriter cannot compile these Mosaic kernels when
        # 64-bit mode is on (scalar promotion inside kernel tracing recurses;
        # explicitly-typed variants are rejected by the remote compiler) —
        # take the exact comparator path instead of crashing
        return list(jax.lax.sort(ops, num_keys=num_keys, is_stable=True))

    # pad to a multiple of 8*m (the bounds SMEM blocking needs nchunks % 8 == 0)
    Np = _ceil_to(max(N, 8 * m), 8 * m)
    if Np != N:
        pad = jnp.full((Np - N,), _MAX, jnp.uint32)
        ops = [jnp.concatenate([o, pad]) for o in ops]

    Ks = list(rounds) if rounds is not None else _plan(
        Np, K, cfg.final_chunk_target
    )

    overflow = jnp.asarray(False)
    nregions, cap, counts = 1, Np, None
    for r, Kr in enumerate(Ks):
        ops = _rowsort(ops, m, num_keys)
        cpb = cap // m  # chunks per region
        nchunks = nregions * cpb
        nreg_next = nregions * Kr
        cap_next = _next_cap(Np, nreg_next, alpha, m, r == len(Ks) - 1)
        if r == 0:
            sw, sp = _round1_splitters(ops, num_keys, m, Kr, samples1)
            sw = [jnp.broadcast_to(w[None, :], (nchunks, Kr - 1)) for w in sw]
            # splitter positions are global; _bucket_ids compares within-chunk
            # positions, so shift into each chunk's local coordinates
            sp_local = (
                sp[None, :]
                - (jnp.arange(nchunks, dtype=jnp.int32) * m)[:, None]
            )
            vl = jnp.full((nchunks,), m, jnp.int32)
        else:
            # Sampling noise must fit the capacity margin: splitter rank
            # error is ~ parent * sqrt(2p(1-p)/S) iid; the jittered
            # stratified sampler measures ~2x tighter (worst bucket at 16M:
            # 1.17x mean at S=4096 vs the iid-predicted 1.3x), and the worst
            # of thousands of buckets sits ~4 sigma out. Solve
            # 4*(sigma_iid/2) <= margin for S; samples2 is a floor, 4096 a
            # gather-cost ceiling.
            parent = Np // nregions
            margin = max(cap_next - int(alpha * Np / nreg_next), 1)
            p = 1.0 / Kr
            s2_need = int(4.0 * 2 * p * (1 - p) * (parent / margin) ** 2) + 1
            s2 = min(
                max(s2_need, samples2, 4 * Kr, 64), max(4096, samples2)
            )
            sw, sp = _round2_splitters(ops, num_keys, counts, cap, Kr, s2)
            sw = [jnp.repeat(w, cpb, axis=0) for w in sw]  # (nchunks, Kr-1)
            sp = jnp.repeat(sp, cpb, axis=0)
            # valid length per chunk, and positions local to the region
            cib = jnp.tile(jnp.arange(cpb, dtype=jnp.int32), nregions)
            vl = jnp.clip(jnp.repeat(counts, cpb) - cib * m, 0, m)
            sp_local = sp - (cib * m)[:, None]
        bounds = _bucket_ids(ops, num_keys, m, sw, sp_local, vl)

        outs, counts = extract.bucket_extract(
            [o.reshape(-1, LANES) for o in ops],
            bounds,
            K=Kr,
            cap_rows=cap_next // LANES,
            chunks_per_bucket=cpb,
            nbuckets=nregions,
            interpret=interpret,
        )
        ops = [o.reshape(-1) for o in outs]
        overflow = overflow | jnp.any(counts > cap_next)
        nregions, cap = nreg_next, cap_next

    # ---- final: sort each region in one row, then compact valid prefixes
    ops = _rowsort(ops, cap, num_keys)
    dense, total = extract.compact_regions(
        [o.reshape(-1, LANES) for o in ops],
        counts,
        cap_rows=cap // LANES,
        interpret=interpret,
    )
    result = [o.reshape(-1)[:N] for o in dense]

    # ---- overflow fallback: correctness under adversarial splitter samples
    def fallback(_):
        srt = jax.lax.sort(
            [o[:N] for o in _orig], num_keys=num_keys, is_stable=True
        )
        return list(srt)

    def keep(r):
        return list(r)

    return jax.lax.cond(overflow, fallback, keep, result)
