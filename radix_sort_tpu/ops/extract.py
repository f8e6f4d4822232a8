"""Pallas bucket-extraction kernel — the data-movement heart of the engine.

This is the TPU-native replacement for the reference's scatter phase
(src/radix_sort/mod.rs:121-168): where the reference's threads write each
element to ``bin_start + rank`` through raw pointers, the TPU engine moves
whole *runs*. Chunks arrive pre-grouped (a stable rowsort plays the role of
the per-chunk histogram+rank), and this kernel appends each chunk's
per-bucket run into a packed per-bucket HBM region:

  - grid: sequential over chunks (TPU grids execute in order — the ordering
    IS the stability guarantee, like the digit-major/chunk-minor prefix sum
    of mod.rs:110-120);
  - all operands are processed ROW-INTERLEAVED (element-row r of operand w
    at physical row r*Wp + w), so one dynamic roll chain and one masked
    read-modify-write serve every operand at once — the append hot path is
    instruction-bound, not byte-bound, and this cuts its instruction count
    by ~the operand count;
  - per (chunk, bucket): the run [bounds[d], bounds[d+1]) is appended into
    the bucket's VMEM staging in pieces of <= 1920 elements (dynamic
    lane+sublane rolls + mask); full 1 KiB-per-operand blocks flush to HBM
    as one interleaved DMA (the analogue of the reference's 96-element write
    de-randomization buffers, mod.rs:469-570 — staging converts random run
    writes into streaming multi-KiB stores);
  - staging garbage is MAX-sentinel so unwritten tails sort to the end of
    the next round's rows;
  - outputs: one packed array per operand (regions of cap_rows rows each)
    plus a per-region count vector; flushes de-interleave on the way out,
    one overlapped DMA per operand.

The compactor (concatenate valid prefixes of padded regions — the inverse of
the padded bucket layout) is the K=1 special case of the same kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "bucket_extract",
    "compact_regions",
    "phys_width",
    "MAX_WORD",
]

MAX_WORD = np.uint32(0xFFFFFFFF)
LANES = 128
FLUSH_EROWS = 8  # flush quantum: 8 element rows = 1024 elements per operand
MAXE = 16  # largest append window in element rows
PIECE = (MAXE - 1) * LANES  # longest single append: 1920 elements
SRE = 24  # staging element rows per region: 8 flush slack + 16 window


def phys_width(n):
    """Interleaved physical operand count: next power of two (sublane math
    stays cheap and dynamic sublane rotates stay 8-row aligned)."""
    w = 1
    while w < n:
        w *= 2
    return w


def _eflat_roll(x, s, Wp):
    """Roll an operand-interleaved (E*Wp, 128) block by ``s`` ELEMENT
    positions in flat element-row-major order (every operand together)."""
    E = x.shape[0] // Wp
    sl = s % LANES
    rs = (s // LANES) % E
    r1 = pltpu.roll(x, sl, axis=1)
    if (E * Wp) % 8 != 0:
        # dynamic sublane rotate needs 8-row-aligned shapes; small tiers
        # (E*Wp < 8) select among the E static rotations instead
        assert E * Wp < 8, (E, Wp)
        # rots[k] == pltpu.roll(r1, k*Wp, axis=0): rows shift FORWARD by k*Wp
        rots = [
            jnp.concatenate([r1[(E - k) * Wp :], r1[: (E - k) * Wp]], axis=0)
            if k
            else r1
            for k in range(E)
        ]
        a = rots[E - 1]
        b = rots[0]
        for k in range(E - 1):
            a = jnp.where(rs == k, rots[k], a)
            b = jnp.where(rs == k, rots[k + 1], b)
    else:
        a = pltpu.roll(r1, rs * Wp, axis=0)
        b = pltpu.roll(r1, ((rs + 1) % E) * Wp, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < sl, b, a)


def _tiers(cr, Wp):
    """Dyadic append-window ladder. A run of ln elements is appended with the
    smallest usable window of E element rows such that ln <= (E-1)*128, so
    short runs pay vector work proportional to their size instead of falling
    through to the MAXE window (the round-1 ladder was [2, 16]: a 130-element
    run rolled/masked 16*Wp rows — ~3x the measured per-append cost of a
    right-sized window). Usable = the dynamic sublane rotate's 8-row
    alignment holds (E*Wp % 8 == 0) or the tier is small enough for the
    static-rotation fallback (E*Wp < 8)."""
    max_ln = min(cr * LANES, PIECE)  # append_piece splits longer runs
    ts = []
    for e in (2, 4, 8, MAXE):
        if (e * Wp) % 8 == 0 or e * Wp < 8:
            ts.append(e)
            if (e - 1) * LANES >= max_ln:
                break
    assert ts and (ts[-1] - 1) * LANES >= max_ln, (cr, Wp, ts)
    return ts


def _make_kernel(Wp, num_out, K, cr, cap_rows, chunks_per_bucket):
    """cr = chunk element rows (chunk = cr*128 elements per operand)."""
    cap_blocks = cap_rows // FLUSH_EROWS
    n_flush = 2  # sloc after one piece < 1024 + 1920 -> at most 2 quanta
    tiers = _tiers(cr, Wp)

    def kernel(bounds_ref, *refs):
        # refs: Wp input blocks, num_out prefills (aliased, unused),
        #       num_out out_refs, counts_ref, chunkbuf, stage, flushbuf,
        #       cur, obase, sems
        x_refs = refs[:Wp]
        out_refs = refs[Wp + num_out : Wp + 2 * num_out]
        counts_ref = refs[Wp + 2 * num_out]
        chunkbuf = refs[Wp + 2 * num_out + 1]
        stage = refs[Wp + 2 * num_out + 2]
        flushbuf = refs[Wp + 2 * num_out + 3]
        cur = refs[Wp + 2 * num_out + 4]
        obase = refs[Wp + 2 * num_out + 5]
        sems = refs[Wp + 2 * num_out + 6]

        c = pl.program_id(0)
        b = c // chunks_per_bucket
        cib = c % chunks_per_bucket

        @pl.when(cib == 0)
        def _reset():
            stage[...] = jnp.full_like(stage, MAX_WORD)

            def zero(d, _):
                cur[d] = 0
                obase[d] = 0
                return 0

            jax.lax.fori_loop(0, K, zero, 0)

        # interleave the chunk's operands into scratch (element-row major)
        stk = jnp.stack([x_refs[w][...] for w in range(Wp)], axis=1)
        chunkbuf[pl.ds(0, cr * Wp), :] = stk.reshape(cr * Wp, LANES)

        def flush(d):
            """One flush quantum: 8 element rows of every operand -> HBM,
            de-interleaved into per-operand regions (one DMA per operand,
            overlapped on a semaphore array)."""
            ob = jnp.minimum(obase[d], cap_rows - FLUSH_EROWS)
            base = (b * K + d) * cap_rows + ob
            quantum = stage[
                pl.ds(d * SRE * Wp, FLUSH_EROWS * Wp), :
            ].reshape(FLUSH_EROWS, Wp, LANES)
            for w in range(num_out):
                flushbuf[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :] = quantum[:, w]
            dmas = []
            for w in range(num_out):
                dma = pltpu.make_async_copy(
                    flushbuf.at[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :],
                    out_refs[w].at[pl.ds(base, FLUSH_EROWS), :],
                    sems.at[w],
                )
                dma.start()
                dmas.append(dma)
            for dma in dmas:
                dma.wait()
            rest = stage[
                pl.ds((d * SRE + FLUSH_EROWS) * Wp, (SRE - FLUSH_EROWS) * Wp), :
            ]
            stage[pl.ds(d * SRE * Wp, (SRE - FLUSH_EROWS) * Wp), :] = rest
            stage[
                pl.ds((d * SRE + SRE - FLUSH_EROWS) * Wp, FLUSH_EROWS * Wp), :
            ] = jnp.full((FLUSH_EROWS * Wp, LANES), MAX_WORD, stage.dtype)
            obase[d] = obase[d] + FLUSH_EROWS

        def append(d, E, b0, ln):
            """Append run chunk[b0 : b0+ln] (ln <= (E-1)*128) into staging d."""
            sloc = cur[d] - obase[d] * LANES
            r0 = sloc // LANES
            s = (sloc % LANES - b0 % LANES) % (E * LANES)
            src = chunkbuf[pl.ds((b0 // LANES) * Wp, E * Wp), :]
            rolled = _eflat_roll(src, s, Wp)
            prow = jax.lax.broadcasted_iota(jnp.int32, (E * Wp, LANES), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (E * Wp, LANES), 1)
            q = (r0 + prow // Wp) * LANES + lane
            mask = (q >= sloc) & (q < sloc + ln)
            dst = stage[pl.ds((d * SRE + r0) * Wp, E * Wp), :]
            stage[pl.ds((d * SRE + r0) * Wp, E * Wp), :] = jnp.where(
                mask, rolled, dst
            )

        def append_piece(d, b0, ln):
            """Append one run piece (0 < ln <= PIECE); flush ready quanta."""
            lo = 0
            for E in tiers:
                hi = (E - 1) * LANES
                if E == tiers[-1]:
                    cond = ln > lo
                else:
                    cond = (ln > lo) & (ln <= hi)

                @pl.when(cond)
                def _(E=E):
                    append(d, E, b0, ln)

                lo = hi
            cur[d] = cur[d] + ln

            # one cheap check on the hot path; the ladder only runs when at
            # least one quantum is ready (~1 in 16 appends)
            @pl.when(cur[d] - obase[d] * LANES >= FLUSH_EROWS * LANES)
            def _():
                flush(d)
                for _i in range(n_flush - 1):
                    @pl.when(cur[d] - obase[d] * LANES >= FLUSH_EROWS * LANES)
                    def _():
                        flush(d)

        def per_bucket(d, _):
            b0 = bounds_ref[c % 8, d]
            b1 = bounds_ref[c % 8, d + 1]
            ln = b1 - b0

            @pl.when((ln > 0) & (ln <= PIECE))
            def _fast():
                append_piece(d, b0, ln)

            @pl.when(ln > PIECE)
            def _long():
                n_pieces = (ln + PIECE - 1) // PIECE

                def piece(i, _):
                    off = i * PIECE
                    plen = jnp.minimum(ln - off, PIECE)
                    append_piece(d, b0 + off, plen)
                    return 0

                jax.lax.fori_loop(0, n_pieces, piece, 0)

            return 0

        # statically unrolled: a fori_loop here costs ~80 ns/iteration in
        # loop overhead alone (measured), 10x the unrolled per-bucket cost
        for d in range(K):
            per_bucket(d, 0)

        def flush_tail(d):
            """Drain a partial quantum writing ONLY its ceil(sloc/128) valid
            rows (binary-decomposed static-size DMAs), so regions need no
            flush-overwrite margin: a region's writes never exceed
            ceil(count/128) rows, and capacity = count is sufficient.
            Unwritten tail rows keep their donated MAX-sentinel prefill."""
            sloc = cur[d] - obase[d] * LANES
            rr = (sloc + LANES - 1) // LANES  # 1..8 valid rows
            quantum = stage[
                pl.ds(d * SRE * Wp, FLUSH_EROWS * Wp), :
            ].reshape(FLUSH_EROWS, Wp, LANES)
            for w in range(num_out):
                flushbuf[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :] = quantum[:, w]
            # clamp only guards overflowed (flagged) regions; a region with
            # count <= cap has obase + rr <= cap_rows by construction
            ob = jnp.minimum(obase[d], cap_rows - rr)
            base_row = (b * K + d) * cap_rows + ob
            off = 0 * rr
            for sz in (8, 4, 2, 1):
                bit = (rr & sz) != 0 if sz != 8 else rr == 8

                @pl.when(bit)
                def _(sz=sz, off=off):
                    dmas = []
                    for w in range(num_out):
                        dma = pltpu.make_async_copy(
                            flushbuf.at[pl.ds(w * FLUSH_EROWS + off, sz), :],
                            out_refs[w].at[pl.ds(base_row + off, sz), :],
                            sems.at[w],
                        )
                        dma.start()
                        dmas.append(dma)
                    for dma in dmas:
                        dma.wait()

                if sz != 8:
                    off = off + jnp.where((rr & sz) != 0, sz, 0)

        @pl.when(cib == chunks_per_bucket - 1)
        def _drain():
            def drain_one(d, _):
                @pl.when(cur[d] - obase[d] * LANES > 0)
                def _():
                    flush_tail(d)

                counts_ref[b * K + d] = cur[d]
                return 0

            jax.lax.fori_loop(0, K, drain_one, 0)

    return kernel


def bucket_extract(
    ops,
    bounds,
    *,
    K,
    cap_rows,
    chunks_per_bucket,
    nbuckets,
    interpret=None,
):
    """Extract per-(chunk,bucket) runs into packed per-bucket regions.

    ops: list of uint32 arrays, each (nchunks*cr, 128) — chunk c grouped so
        that its bucket-d run occupies [bounds[c,d], bounds[c,d+1]).
    bounds: (nchunks, K+1) int32, non-decreasing, bounds[c,K] = valid length.
    Returns (outs, counts): one (nbuckets*K*cap_rows, 128) array per operand
    (region r's valid prefix is counts[r] elements) and counts
    (nbuckets*K,) int32.
    """
    num_ops = len(ops)
    Wp = phys_width(num_ops)
    nchunks = bounds.shape[0]
    assert nchunks == chunks_per_bucket * nbuckets
    assert nchunks % 8 == 0, "nchunks must be a multiple of 8 (bounds blocking)"
    assert ops[0].shape[0] % nchunks == 0, (
        f"ops rows ({ops[0].shape[0]}) must divide into {nchunks} chunks"
    )
    cr = ops[0].shape[0] // nchunks
    assert cap_rows % FLUSH_EROWS == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # pad the physical operand count to a power of two by re-using the first
    # operand (its staged bytes are never flushed — the flush loops stop at
    # num_ops — so no extra HBM array is allocated or filled; the remaining
    # cost is streaming it through VMEM, which non-power-of-two sublane
    # interleave would avoid but Mosaic's vector div/mod math would not)
    ops = list(ops) + [ops[0] for _ in range(Wp - num_ops)]

    kernel = _make_kernel(Wp, num_ops, K, cr, cap_rows, chunks_per_bucket)
    out_rows = nbuckets * K * cap_rows

    # Unwritten output blocks must read as MAX-sentinel downstream (they sort
    # to row tails and are excluded by the valid-length clamps), so output
    # buffers are donated pre-filled via aliasing.
    prefills = [
        jnp.full((out_rows, LANES), MAX_WORD, jnp.uint32)
        for _ in range(num_ops)
    ]

    res = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32)
            for _ in range(num_ops)
        )
        + (jax.ShapeDtypeStruct((nbuckets * K,), jnp.int32),),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((8, K + 1), lambda c: (c // 8, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
            for _ in range(Wp)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_ops)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_ops)
        )
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),
        scratch_shapes=[
            pltpu.VMEM(((cr + MAXE) * Wp, LANES), jnp.uint32),
            pltpu.VMEM((K * SRE * Wp, LANES), jnp.uint32),
            pltpu.VMEM((num_ops * FLUSH_EROWS, LANES), jnp.uint32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SemaphoreType.DMA((num_ops,)),
        ],
        input_output_aliases={Wp + 1 + w: w for w in range(num_ops)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bounds, *ops, *prefills)
    return list(res[:num_ops]), res[num_ops]


def compact_regions(ops, counts, *, cap_rows, interpret=None):
    """Concatenate the valid prefixes of equal-capacity regions densely.

    ops: list of (nregions*cap_rows, 128) uint32; counts: (nregions,) int32.
    Returns (outs, total): per-operand dense arrays (valid prefix = total)
    with a few rows of slack capacity.
    """
    nregions = counts.shape[0]
    # overflowed regions report counts beyond their capacity; clamp before
    # using them as run bounds — unclamped, the kernel's append would read
    # past its chunk buffer (device-UB). Overflow callers discard this
    # result via their fallback branch anyway.
    counts = jnp.minimum(counts, np.int32(cap_rows * LANES))
    if nregions % 8 != 0:
        # the bounds SMEM blocking needs chunks % 8 == 0: append zero-count
        # sentinel regions (their bounds are empty, so they contribute nothing)
        padreg = 8 - nregions % 8
        counts = jnp.concatenate([counts, jnp.zeros((padreg,), counts.dtype)])
        ops = [
            jnp.concatenate(
                [o, jnp.full((padreg * cap_rows, LANES), MAX_WORD, o.dtype)]
            )
            for o in ops
        ]
        nregions += padreg
    bounds = jnp.stack([jnp.zeros_like(counts), counts], axis=1)
    out_cap = nregions * cap_rows + 5 * FLUSH_EROWS
    out_cap = ((out_cap + FLUSH_EROWS - 1) // FLUSH_EROWS) * FLUSH_EROWS
    return bucket_extract(
        ops,
        bounds,
        K=1,
        cap_rows=out_cap,
        chunks_per_bucket=nregions,
        nbuckets=1,
        interpret=interpret,
    )
