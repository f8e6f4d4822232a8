"""Pallas bucket-extraction kernel — the data-movement heart of the engine.

This is the TPU-native replacement for the reference's scatter phase
(src/radix_sort/mod.rs:121-168): where the reference's threads write each
element to ``bin_start + rank`` through raw pointers, the TPU engine moves
whole *runs*. Chunks arrive pre-grouped (a stable XLA rowsort plays the role
of the per-chunk histogram+rank), and this kernel appends each chunk's
per-bucket run into a packed per-bucket HBM region:

  - grid: sequential over chunks (TPU grids execute in order — the ordering
    IS the stability guarantee, like the digit-major/chunk-minor prefix sum
    of mod.rs:110-120);
  - per (chunk, bucket): the run [bounds[d], bounds[d+1]) is rolled to the
    bucket's staging offset (dynamic lane+sublane rolls), masked in, and
    staged in VMEM; full 1 KiB blocks flush to HBM with one interleaved DMA
    covering every operand (the analogue of the reference's 96-element write
    de-randomization buffers, mod.rs:469-570 — staging converts random run
    writes into streaming 4 KiB stores);
  - appends use tiered window sizes (2 / 9 / full rows) so short runs only
    touch proportional VMEM;
  - staging garbage is MAX-sentinel so unwritten tails sort to the end of
    the next round's rows;
  - outputs: one interleaved array [region, block, operand, 8, 128] plus a
    per-region count vector. ``deinterleave`` restores per-operand layout.

The compactor (concatenate valid prefixes of padded regions — the inverse of
the padded bucket layout) is the K=1 special case of the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bucket_extract", "compact_regions", "deinterleave", "MAX_WORD"]

MAX_WORD = np.uint32(0xFFFFFFFF)
LANES = 128
FLUSH_ROWS = 8  # one flush quantum: 8 rows = 1024 elements


def _flat_roll(x, s):
    """Circular roll of an (R,128) block by ``s`` elements in flat row-major
    order (s traced, any sign handled by caller passing s mod R*128)."""
    R = x.shape[0]
    sl = s % LANES
    rs = (s // LANES) % R
    r1 = pltpu.roll(x, sl, axis=1)
    if R == 2:
        # dynamic sublane rotate needs 8-row alignment; for 2 rows it is a
        # static swap selected by rs
        sw = jnp.concatenate([r1[1:2], r1[0:1]], axis=0)
        a = jnp.where(rs == 1, sw, r1)
        b = jnp.where(rs == 1, r1, sw)
    else:
        a = pltpu.roll(r1, rs, axis=0)
        b = pltpu.roll(r1, (rs + 1) % R, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < sl, b, a)


def _make_kernel(num_ops, K, cr, cap_rows, chunks_per_bucket, nbuckets):
    """Build the kernel body. cr = chunk rows (chunk = cr*128 elements)."""
    # Long runs are appended in pieces of at most PIECE elements, so the
    # biggest window is 16 rows regardless of chunk size: staging stays small
    # and skewed inputs (huge runs) cost time proportional to their length,
    # not to a chunk-sized window per append.
    MAXW = 16
    PIECE = (MAXW - 1) * LANES  # 1920
    SR = 24  # 8 flush slack + 16 window
    cap_blocks = cap_rows // FLUSH_ROWS
    n_flush = 2  # sloc after one piece < 1024 + 1920 -> at most 2 quanta
    # W=2 is the hot tier (avg run << 128 for production K): its sublane
    # rotate is a static row swap, dodging Mosaic's 8-row alignment rule for
    # dynamic sublane rotates, and it touches 8x less VMEM.
    tiers = [2, MAXW] if cr + 1 > 2 else [2]

    def kernel(bounds_ref, *refs):
        # refs: num_ops input blocks, prefill (aliased, unused), out_ref,
        #       counts_ref, chunkbufs (num_ops), stages (num_ops), flushbuf,
        #       cur, obase, sem
        x_refs = refs[:num_ops]
        out_ref = refs[num_ops + 1]
        counts_ref = refs[num_ops + 2]
        chunkbufs = refs[num_ops + 3 : 2 * num_ops + 3]
        stages = refs[2 * num_ops + 3 : 3 * num_ops + 3]
        flushbuf = refs[3 * num_ops + 3]
        cur = refs[3 * num_ops + 4]
        obase = refs[3 * num_ops + 5]
        sem = refs[3 * num_ops + 6]

        c = pl.program_id(0)
        b = c // chunks_per_bucket
        cib = c % chunks_per_bucket

        @pl.when(cib == 0)
        def _reset():
            for w in range(num_ops):
                stages[w][...] = jnp.full_like(stages[w], MAX_WORD)

            def zero(d, _):
                cur[d] = 0
                obase[d] = 0
                return 0

            jax.lax.fori_loop(0, K, zero, 0)

        # copy chunk into padded scratch so window reads never leave bounds
        for w in range(num_ops):
            chunkbufs[w][pl.ds(0, cr), :] = x_refs[w][...]

        def flush(d):
            """One flush quantum: 8 staged rows of every operand -> HBM."""
            ob = obase[d]
            ob = jnp.minimum(ob, cap_rows - FLUSH_ROWS)  # overflow clamp
            base = ((b * K + d) * cap_blocks + ob // FLUSH_ROWS) * (
                num_ops * FLUSH_ROWS
            )
            for w in range(num_ops):
                flushbuf[pl.ds(w * FLUSH_ROWS, FLUSH_ROWS), :] = stages[w][
                    pl.ds(d * SR, FLUSH_ROWS), :
                ]
            dma = pltpu.make_async_copy(
                flushbuf,
                out_ref.at[pl.ds(base, num_ops * FLUSH_ROWS), :],
                sem,
            )
            dma.start()
            dma.wait()
            for w in range(num_ops):
                rest = stages[w][pl.ds(d * SR + FLUSH_ROWS, SR - FLUSH_ROWS), :]
                stages[w][pl.ds(d * SR, SR - FLUSH_ROWS), :] = rest
                stages[w][pl.ds(d * SR + SR - FLUSH_ROWS, FLUSH_ROWS), :] = (
                    jnp.full((FLUSH_ROWS, LANES), MAX_WORD, stages[w].dtype)
                )
            obase[d] = obase[d] + FLUSH_ROWS

        def append(d, W, b0, ln):
            """Append run chunk[b0 : b0+ln] (ln <= (W-1)*128) into staging d."""
            sloc = cur[d] - obase[d] * LANES
            r0 = sloc // LANES
            s = (sloc % LANES - b0 % LANES) % (W * LANES)
            row = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
            q = (r0 + row) * LANES + lane
            mask = (q >= sloc) & (q < sloc + ln)
            for w in range(num_ops):
                src = chunkbufs[w][pl.ds(b0 // LANES, W), :]
                rolled = _flat_roll(src, s)
                dst = stages[w][pl.ds(d * SR + r0, W), :]
                stages[w][pl.ds(d * SR + r0, W), :] = jnp.where(
                    mask, rolled, dst
                )

        def append_piece(d, b0, ln):
            """Append one run piece (0 < ln <= PIECE); flush ready quanta."""
            lo = 0
            for W in tiers:
                hi = (W - 1) * LANES
                if W == tiers[-1]:
                    cond = ln > lo
                else:
                    cond = (ln > lo) & (ln <= hi)

                @pl.when(cond)
                def _(W=W):
                    append(d, W, b0, ln)

                lo = hi
            cur[d] = cur[d] + ln

            # one cheap check on the hot path; the ladder only runs when at
            # least one quantum is ready (~1 in 16 appends)
            @pl.when(cur[d] - obase[d] * LANES >= FLUSH_ROWS * LANES)
            def _():
                flush(d)
                for _i in range(n_flush - 1):
                    @pl.when(cur[d] - obase[d] * LANES >= FLUSH_ROWS * LANES)
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

        jax.lax.fori_loop(0, K, per_bucket, 0)

        @pl.when(cib == chunks_per_bucket - 1)
        def _drain():
            def drain_one(d, _):
                @pl.when(cur[d] - obase[d] * LANES > 0)
                def _():
                    flush(d)  # partial quantum: tail rows are MAX-sentinel

                counts_ref[b * K + d] = cur[d]
                return 0

            jax.lax.fori_loop(0, K, drain_one, 0)

    return kernel, SR


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
    Returns (interleaved, counts): interleaved has shape
        (nbuckets*K*cap_rows//8 * num_ops * 8, 128) laid out as
        [region, block, operand, 8, 128]; counts is (nbuckets*K,) int32.
    """
    num_ops = len(ops)
    nchunks = bounds.shape[0]
    total_chunks = nchunks
    assert total_chunks == chunks_per_bucket * nbuckets
    cr = ops[0].shape[0] // nchunks
    assert cap_rows % FLUSH_ROWS == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel, SR = _make_kernel(num_ops, K, cr, cap_rows, chunks_per_bucket, nbuckets)
    cap_blocks = cap_rows // FLUSH_ROWS
    out_rows = nbuckets * K * cap_blocks * num_ops * FLUSH_ROWS

    # Unwritten output blocks must read as MAX-sentinel downstream (they sort
    # to row tails and are excluded by the valid-length clamps), so the output
    # buffer is donated pre-filled via aliasing.
    prefill = jnp.full((out_rows, LANES), MAX_WORD, jnp.uint32)

    out, counts = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((out_rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nbuckets * K,), jnp.int32),
        ),
        grid=(total_chunks,),
        in_specs=[
            pl.BlockSpec((8, K + 1), lambda c: (c // 8, 0), memory_space=pltpu.SMEM),
        ]
        + [
            pl.BlockSpec((cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
            for _ in range(num_ops)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2 * cr + 8, LANES), jnp.uint32) for _ in range(num_ops)]
        + [pltpu.VMEM((K * SR, LANES), jnp.uint32) for _ in range(num_ops)]
        + [
            pltpu.VMEM((num_ops * FLUSH_ROWS, LANES), jnp.uint32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SMEM((K,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={num_ops + 1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(bounds, *ops, prefill)
    return out, counts


def deinterleave(out, *, num_ops, nregions, cap_rows):
    """[region, block, op, 8, 128] interleaved -> per-op (nregions*cap_rows, 128)."""
    cap_blocks = cap_rows // FLUSH_ROWS
    x = out.reshape(nregions * cap_blocks, num_ops, FLUSH_ROWS * LANES)
    x = jnp.swapaxes(x, 0, 1)
    return [x[w].reshape(nregions * cap_rows, LANES) for w in range(num_ops)]


def compact_regions(ops, counts, *, cap_rows, interpret=None):
    """Concatenate the valid prefixes of equal-capacity regions densely.

    ops: list of (nregions*cap_rows, 128) uint32; counts: (nregions,) int32.
    Returns (interleaved, total): interleaved as in bucket_extract with one
    region of capacity nregions*cap_rows (+ slack).
    """
    nregions = counts.shape[0]
    bounds = jnp.stack(
        [jnp.zeros_like(counts), counts], axis=1
    )  # (nregions, 2): single bucket, run = valid prefix
    out_cap = nregions * cap_rows + 5 * FLUSH_ROWS
    out_cap = ((out_cap + FLUSH_ROWS - 1) // FLUSH_ROWS) * FLUSH_ROWS
    return bucket_extract(
        ops,
        bounds,
        K=1,
        cap_rows=out_cap,
        chunks_per_bucket=nregions,
        nbuckets=1,
        interpret=interpret,
    )
