"""Pallas run-append join expansion — high-fanout match materialization.

The join expansion phase writes, for each left row i in order, ``emit[i]``
output rows: the key and left value broadcast, and the right values copied
from the sorted-right window [lo[i], lo[i]+m_copy[i]). The XLA formulation
is three elementwise gathers at ~9 ns/element (the measured device gather
floor, scratch/NOTES.md); at high fanout the same movement is RUN
structured — one dynamic-offset DMA read plus one staged append per left
row — which this kernel performs at a per-run (not per-element) cost,
reusing the extract kernel's interleaved staging + flush-quantum machinery
(ops/extract.py, the TPU re-design of the reference's buffered scatter,
src/radix_sort/mod.rs:469-570).

Layout: one sequential output cursor (the K=1 compactor shape). Per run:

  - copy runs (m_copy > 0): DMA the source window's rows from the
    sorted-right HBM array into a VMEM buffer (tier-sized static reads at a
    dynamic row offset), broadcast the key/left-value scalars from the SMEM
    descriptor block, interleave, and masked-append to staging;
  - fill runs (m_copy == 0 < m_emit, a left join's unmatched rows): same
    append with the right-value rows zero.

Descriptors stream through SMEM via the grid block spec; emit lengths are
pre-clamped XLA-side so the cumulative emission never exceeds the output
capacity (the kernel needs no overflow handling of its own).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radix_sort_tpu.ops.extract import (
    FLUSH_EROWS,
    LANES,
    MAX_WORD,
    MAXE,
    PIECE,
    SRE,
    _eflat_roll,
    _tiers,
)

__all__ = [
    "expand_join_runs", "mosaic_compile_ok", "DESC_COLS", "RUNS_PER_BLOCK",
]


_MOSAIC_X64_OK = None


def mosaic_compile_ok():
    """False when Mosaic kernels cannot compile on this runtime: the axon
    relay's x64 rewriter recurses during kernel *lowering* whenever 64-bit
    mode is on — callers must take their XLA fallback path instead of
    crashing. The failure is host-side (RecursionError before any remote
    compile), so it is probed once with a trivial kernel and cached;
    standard TPU runtimes, where Mosaic + x64 is fine, keep the kernel
    paths. Interpret mode is unaffected."""
    if not (jax.config.jax_enable_x64 and jax.default_backend() == "tpu"):
        return True
    global _MOSAIC_X64_OK
    if _MOSAIC_X64_OK is None:
        def probe(x):
            def k(x_ref, o_ref):
                o_ref[...] = x_ref[...] // 2
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32)
            )(x)
        try:
            jax.jit(probe).lower(
                jax.ShapeDtypeStruct((8, LANES), jnp.int32)
            )
            _MOSAIC_X64_OK = True
        except RecursionError:
            _MOSAIC_X64_OK = False
    return _MOSAIC_X64_OK

DESC_COLS = 8  # key, left value, lo, m_copy, m_emit, cum, 2 pad columns
RUNS_PER_BLOCK = 128  # descriptor rows per grid step (SMEM block)
_WP = 4  # interleaved physical operands: key, lv, rv, dup
_NUM_OUT = 3
_FLUSH_ELEMS = FLUSH_EROWS * LANES  # 1024


def _make_kernel(cap_rows, n_blocks):
    """Descriptor-driven, single-tier (round 3, mirrors ops/extract.py):
    the output cursor of every run is the exclusive prefix sum of emit
    lengths, precomputed XLA-side into desc column 5 — the kernel keeps no
    scalar state and derives the flush schedule from two shifts of the
    descriptor. The dyadic window ladder stays (right-sized windows are
    measurably cheaper than one maximal window)."""
    tiers = _tiers(PIECE // LANES + 1, _WP)

    def kernel(desc_ref, rvs_ref, *refs):
        # refs: 3 prefills (aliased), 3 out_refs, count_ref,
        #       stage, flushbuf, rvbuf, sems
        out_refs = refs[_NUM_OUT : 2 * _NUM_OUT]
        count_ref = refs[2 * _NUM_OUT]
        stage = refs[2 * _NUM_OUT + 1]
        flushbuf = refs[2 * _NUM_OUT + 2]
        rvbuf = refs[2 * _NUM_OUT + 3]
        sems = refs[2 * _NUM_OUT + 4]

        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            stage[...] = jnp.full_like(stage, MAX_WORD)

        def flush(ob):
            ob = jnp.minimum(ob, cap_rows - FLUSH_EROWS)
            quantum = stage[pl.ds(0, FLUSH_EROWS * _WP), :].reshape(
                FLUSH_EROWS, _WP, LANES
            )
            for w in range(_NUM_OUT):
                flushbuf[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :] = quantum[:, w]
            dmas = []
            for w in range(_NUM_OUT):
                dma = pltpu.make_async_copy(
                    flushbuf.at[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :],
                    out_refs[w].at[pl.ds(ob, FLUSH_EROWS), :],
                    sems.at[w],
                )
                dma.start()
                dmas.append(dma)
            for dma in dmas:
                dma.wait()
            rest = stage[
                pl.ds(FLUSH_EROWS * _WP, (SRE - FLUSH_EROWS) * _WP), :
            ]
            stage[pl.ds(0, (SRE - FLUSH_EROWS) * _WP), :] = rest
            stage[pl.ds((SRE - FLUSH_EROWS) * _WP, FLUSH_EROWS * _WP), :] = (
                jnp.full((FLUSH_EROWS * _WP, LANES), MAX_WORD, stage.dtype)
            )

        def _rd_copy(r, slot):
            """The (reconstructible) prefetch DMA for descriptor row r:
            MAXE source rows from rvs[lo//128 * 128 :] into rvbuf slot."""
            row0 = desc_ref[r, 2] // LANES
            return pltpu.make_async_copy(
                rvs_ref.at[pl.ds(row0, MAXE), :],
                rvbuf.at[pl.ds(slot * MAXE, MAXE), :],
                sems.at[_NUM_OUT + slot],
            )

        def append_w(E, kw, lw, buf_row, b0, ln, sloc, is_copy):
            """One E-row-window masked append at staging offset sloc; the
            source window (if copying) is already in rvbuf at buf_row."""
            if is_copy:
                rb = rvbuf[pl.ds(buf_row, E), :]
            else:
                rb = jnp.zeros((E, LANES), jnp.uint32)
            kb = jax.lax.bitcast_convert_type(
                jnp.full((E, LANES), kw, jnp.int32), jnp.uint32
            )
            lb = jax.lax.bitcast_convert_type(
                jnp.full((E, LANES), lw, jnp.int32), jnp.uint32
            )
            block = jnp.stack([kb, lb, rb, rb], axis=1).reshape(
                E * _WP, LANES
            )
            r0 = sloc // LANES
            s = (sloc % LANES - b0 % LANES) % (E * LANES)
            rolled = _eflat_roll(block, s, _WP)
            prow = jax.lax.broadcasted_iota(jnp.int32, (E * _WP, LANES), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (E * _WP, LANES), 1)
            q = (r0 + prow // _WP) * LANES + lane
            mask = (q >= sloc) & (q < sloc + ln)
            dst = stage[pl.ds(r0 * _WP, E * _WP), :]
            stage[pl.ds(r0 * _WP, E * _WP), :] = jnp.where(mask, rolled, dst)

        def append(kw, lw, buf_row, b0, ln, cum, is_copy):
            """Append ``ln`` elements (0 < ln <= PIECE) at output cursor
            ``cum``: key/lv broadcast, rv from the staged rvbuf window when
            is_copy else zero; flush completed quanta (schedule derived
            from (cum, ln) alone)."""
            sloc = cum & (_FLUSH_ELEMS - 1)
            lo_b = 0
            for E in tiers:
                hi_b = (E - 1) * LANES
                if E == tiers[-1]:
                    cond = ln > lo_b
                else:
                    cond = (ln > lo_b) & (ln <= hi_b)

                @pl.when(cond)
                def _(E=E):
                    append_w(E, kw, lw, buf_row, b0, ln, sloc, is_copy)

                lo_b = hi_b
            q0 = cum // _FLUSH_ELEMS
            nf = (cum + ln) // _FLUSH_ELEMS - q0

            @pl.when(nf > 0)
            def _():
                flush(q0 * FLUSH_EROWS)

            @pl.when(nf > 1)
            def _():
                flush((q0 + 1) * FLUSH_EROWS)

        def per_run(r, slot):
            """slot = the rvbuf half whose prefetch covers this run; the
            other half's prefetch for run r+1 is issued BEFORE the append,
            so the next read rides under this run's vector work (software
            pipeline — the serial DMA wait was ~half the measured ~460
            ns/run cost)."""
            kw = desc_ref[r, 0]
            lw = desc_ref[r, 1]
            lo = desc_ref[r, 2]
            mc = desc_ref[r, 3]
            me = desc_ref[r, 4]
            cum = desc_ref[r, 5]

            _rd_copy(r, slot).wait()

            @pl.when(r + 1 < RUNS_PER_BLOCK)
            def _prefetch_next():
                _rd_copy(r + 1, 1 - slot).start()

            # copy portion: the fast path's window [lo//128, +E<=MAXE) is
            # exactly the prefetched slot
            @pl.when((mc > 0) & (mc <= PIECE))
            def _copy_fast():
                append(kw, lw, slot * MAXE, lo % LANES, mc, cum, True)

            @pl.when(mc > PIECE)
            def _copy_long():
                n_pieces = (mc + PIECE - 1) // PIECE

                def piece(i, _):
                    off = i * PIECE
                    plen = jnp.minimum(mc - off, PIECE)
                    src = lo + off

                    # piece 0 rides the prefetch; later pieces read
                    # synchronously into the third rvbuf region
                    @pl.when(i == 0)
                    def _():
                        append(kw, lw, slot * MAXE, src % LANES, plen,
                               cum + off, True)

                    @pl.when(i > 0)
                    def _():
                        rd = pltpu.make_async_copy(
                            rvs_ref.at[pl.ds(src // LANES, MAXE), :],
                            rvbuf.at[pl.ds(2 * MAXE, MAXE), :],
                            sems.at[_NUM_OUT + 2],
                        )
                        rd.start()
                        rd.wait()
                        append(kw, lw, 2 * MAXE, src % LANES, plen,
                               cum + off, True)

                    return 0

                jax.lax.fori_loop(0, n_pieces, piece, 0)

            # fill portion (a left join's unmatched row: rv = 0). me > mc
            # only when mc == 0 and me == 1, but stay general.
            @pl.when(me > mc)
            def _fill():
                append(kw, lw, 0, lo - lo, me - mc, cum + mc, False)

        # block prologue: stage run 0's source window (every other run's
        # read is prefetched by its predecessor). The run loop unrolls x2
        # so the double-buffer slots and semaphores stay static (and the
        # ~80 ns/iteration fori overhead halves).
        _rd_copy(0, 0).start()

        def pair(r2, _):
            per_run(2 * r2, 0)
            per_run(2 * r2 + 1, 1)
            return 0

        jax.lax.fori_loop(0, RUNS_PER_BLOCK // 2, pair, 0)

        def flush_tail(total):
            sloc = total & (_FLUSH_ELEMS - 1)
            rr = (sloc + LANES - 1) // LANES
            quantum = stage[pl.ds(0, FLUSH_EROWS * _WP), :].reshape(
                FLUSH_EROWS, _WP, LANES
            )
            for w in range(_NUM_OUT):
                flushbuf[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :] = quantum[:, w]
            ob = jnp.minimum(
                (total // _FLUSH_ELEMS) * FLUSH_EROWS, cap_rows - rr
            )
            off = 0 * rr
            for sz in (8, 4, 2, 1):
                bit = (rr & sz) != 0 if sz != 8 else rr == 8

                @pl.when(bit)
                def _(sz=sz, off=off):
                    dmas = []
                    for w in range(_NUM_OUT):
                        dma = pltpu.make_async_copy(
                            flushbuf.at[pl.ds(w * FLUSH_EROWS + off, sz), :],
                            out_refs[w].at[pl.ds(ob + off, sz), :],
                            sems.at[w],
                        )
                        dma.start()
                        dmas.append(dma)
                    for dma in dmas:
                        dma.wait()

                if sz != 8:
                    off = off + jnp.where((rr & sz) != 0, sz, 0)

        @pl.when(c == n_blocks - 1)
        def _drain():
            # pad descriptors carry (emit 0, cum = total), so the last row
            # of the last block always reads the final cursor
            total = (desc_ref[RUNS_PER_BLOCK - 1, 5]
                     + desc_ref[RUNS_PER_BLOCK - 1, 4])

            @pl.when((total & (_FLUSH_ELEMS - 1)) > 0)
            def _():
                flush_tail(total)

            count_ref[0] = total

    return kernel


def expand_join_runs(rvs, desc, *, capacity, interpret=None):
    """Materialize join output runs.

    rvs: (n_r,) uint32 — right values in sorted-key order.
    desc: (n_runs, DESC_COLS) int32 — per left row, in output order:
        [key_word, left_value_word, lo, m_copy, m_emit, 0, 0, 0].
        ``m_emit`` must be pre-clamped so that ``sum(m_emit) <= capacity``;
        ``0 <= m_copy <= m_emit``; ``m_emit - m_copy`` rows emit rv = 0.
        (Column 5 is overwritten with each run's output cursor — the
        exclusive prefix sum of ``m_emit`` — the kernel's precomputed
        scalar state.)
    Returns ``(out_key_words, out_lv, out_rv, count)``: flat uint32 arrays
    of length ``capacity`` (tail beyond ``count`` is MAX-sentinel) and the
    total emitted count.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_runs = desc.shape[0]
    assert desc.shape[1] == DESC_COLS
    pad_runs = -n_runs % RUNS_PER_BLOCK
    if pad_runs:
        desc = jnp.concatenate(
            [desc, jnp.zeros((pad_runs, DESC_COLS), jnp.int32)]
        )
    # descriptor column 5 = each run's output cursor (exclusive prefix sum
    # of emits) — the kernel's whole scalar state, precomputed here so pad
    # rows naturally carry the final total (emit 0 keeps the prefix flat)
    emits = desc[:, 4]
    desc = desc.at[:, 5].set(jnp.cumsum(emits) - emits)
    n_blocks = desc.shape[0] // RUNS_PER_BLOCK

    # source rows: any tier read [lo//128, +MAXE) must stay in bounds
    n_r = rvs.shape[0]
    src_rows = -(-n_r // LANES) + MAXE
    src_rows = -(-src_rows // 8) * 8
    pad_src = src_rows * LANES - n_r
    rvs_rows = jnp.concatenate(
        [rvs, jnp.zeros((pad_src,), jnp.uint32)]
    ).reshape(src_rows, LANES)

    cap_rows = (-(-capacity // (FLUSH_EROWS * LANES)) + 1) * FLUSH_EROWS
    prefills = [
        jnp.full((cap_rows, LANES), MAX_WORD, jnp.uint32)
        for _ in range(_NUM_OUT)
    ]

    kernel = _make_kernel(cap_rows, n_blocks)
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((cap_rows, LANES), jnp.uint32)
            for _ in range(_NUM_OUT)
        )
        + (jax.ShapeDtypeStruct((1,), jnp.int32),),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (RUNS_PER_BLOCK, DESC_COLS),
                lambda c: (c, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(_NUM_OUT)],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(_NUM_OUT)
        )
        + (pl.BlockSpec(memory_space=pltpu.SMEM),),
        scratch_shapes=[
            pltpu.VMEM((SRE * _WP, LANES), jnp.uint32),
            pltpu.VMEM((_NUM_OUT * FLUSH_EROWS, LANES), jnp.uint32),
            # rvbuf: two prefetch slots (software pipeline) + one
            # synchronous slot for long-run pieces past the first
            pltpu.VMEM((3 * MAXE, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((_NUM_OUT + 3,)),
        ],
        input_output_aliases={2 + w: w for w in range(_NUM_OUT)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(desc, rvs_rows, *prefills)
    outs = [r.reshape(-1)[:capacity] for r in res[:_NUM_OUT]]
    return outs[0], outs[1], outs[2], res[_NUM_OUT][0]
