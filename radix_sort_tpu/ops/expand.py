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

__all__ = ["expand_join_runs", "DESC_COLS", "RUNS_PER_BLOCK"]

DESC_COLS = 8  # key, left value, lo, m_copy, m_emit, 3 pad columns
RUNS_PER_BLOCK = 128  # descriptor rows per grid step (SMEM block)
_WP = 4  # interleaved physical operands: key, lv, rv, dup
_NUM_OUT = 3


def _make_kernel(cap_rows, n_blocks):
    cr_for_tiers = PIECE // LANES + 1  # full ladder up to the PIECE window
    tiers = _tiers(cr_for_tiers, _WP)
    n_flush = 2

    def kernel(desc_ref, rvs_ref, *refs):
        # refs: 3 prefills (aliased), 3 out_refs, count_ref,
        #       stage, flushbuf, rvbuf, cur, obase, sems
        out_refs = refs[_NUM_OUT : 2 * _NUM_OUT]
        count_ref = refs[2 * _NUM_OUT]
        stage = refs[2 * _NUM_OUT + 1]
        flushbuf = refs[2 * _NUM_OUT + 2]
        rvbuf = refs[2 * _NUM_OUT + 3]
        cur = refs[2 * _NUM_OUT + 4]
        obase = refs[2 * _NUM_OUT + 5]
        sems = refs[2 * _NUM_OUT + 6]

        c = pl.program_id(0)

        @pl.when(c == 0)
        def _init():
            stage[...] = jnp.full_like(stage, MAX_WORD)
            cur[0] = 0
            obase[0] = 0

        def flush():
            ob = jnp.minimum(obase[0], cap_rows - FLUSH_EROWS)
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
            obase[0] = obase[0] + FLUSH_EROWS

        def append(E, kw, lw, src_elem, ln, is_copy):
            """Append ``ln`` elements (ln <= (E-1)*128): key/lv broadcast,
            rv copied from rvs[src_elem:] when is_copy else zero."""
            if is_copy:
                row0 = src_elem // LANES
                b0 = src_elem % LANES
                rd = pltpu.make_async_copy(
                    rvs_ref.at[pl.ds(row0, E), :],
                    rvbuf.at[pl.ds(0, E), :],
                    sems.at[_NUM_OUT],
                )
                rd.start()
                rd.wait()
                rb = rvbuf[pl.ds(0, E), :]
            else:
                b0 = src_elem - src_elem  # traced zero
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
            sloc = cur[0] - obase[0] * LANES
            r0 = sloc // LANES
            s = (sloc % LANES - b0 % LANES) % (E * LANES)
            rolled = _eflat_roll(block, s, _WP)
            prow = jax.lax.broadcasted_iota(jnp.int32, (E * _WP, LANES), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (E * _WP, LANES), 1)
            q = (r0 + prow // _WP) * LANES + lane
            mask = (q >= sloc) & (q < sloc + ln)
            dst = stage[pl.ds(r0 * _WP, E * _WP), :]
            stage[pl.ds(r0 * _WP, E * _WP), :] = jnp.where(mask, rolled, dst)

        def append_piece(kw, lw, src_elem, ln, is_copy):
            lo_b = 0
            for E in tiers:
                hi_b = (E - 1) * LANES
                if E == tiers[-1]:
                    cond = ln > lo_b
                else:
                    cond = (ln > lo_b) & (ln <= hi_b)

                @pl.when(cond)
                def _(E=E):
                    append(E, kw, lw, src_elem, ln, is_copy)

                lo_b = hi_b
            cur[0] = cur[0] + ln

            @pl.when(cur[0] - obase[0] * LANES >= FLUSH_EROWS * LANES)
            def _():
                flush()
                for _i in range(n_flush - 1):
                    @pl.when(
                        cur[0] - obase[0] * LANES >= FLUSH_EROWS * LANES
                    )
                    def _():
                        flush()

        def per_run(r, _):
            kw = desc_ref[r, 0]
            lw = desc_ref[r, 1]
            lo = desc_ref[r, 2]
            mc = desc_ref[r, 3]
            me = desc_ref[r, 4]

            # copy portion (pieces of <= PIECE elements)
            @pl.when((mc > 0) & (mc <= PIECE))
            def _copy_fast():
                append_piece(kw, lw, lo, mc, True)

            @pl.when(mc > PIECE)
            def _copy_long():
                n_pieces = (mc + PIECE - 1) // PIECE

                def piece(i, _):
                    off = i * PIECE
                    plen = jnp.minimum(mc - off, PIECE)
                    append_piece(kw, lw, lo + off, plen, True)
                    return 0

                jax.lax.fori_loop(0, n_pieces, piece, 0)

            # fill portion (a left join's unmatched row: rv = 0). me > mc
            # only when mc == 0 and me == 1, but stay general.
            @pl.when(me > mc)
            def _fill():
                append_piece(kw, lw, lo, me - mc, False)

            return 0

        jax.lax.fori_loop(0, RUNS_PER_BLOCK, per_run, 0)

        def flush_tail():
            sloc = cur[0] - obase[0] * LANES
            rr = (sloc + LANES - 1) // LANES
            quantum = stage[pl.ds(0, FLUSH_EROWS * _WP), :].reshape(
                FLUSH_EROWS, _WP, LANES
            )
            for w in range(_NUM_OUT):
                flushbuf[pl.ds(w * FLUSH_EROWS, FLUSH_EROWS), :] = quantum[:, w]
            ob = jnp.minimum(obase[0], cap_rows - rr)
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
            @pl.when(cur[0] - obase[0] * LANES > 0)
            def _():
                flush_tail()

            count_ref[0] = cur[0]

    return kernel


def expand_join_runs(rvs, desc, *, capacity, interpret=None):
    """Materialize join output runs.

    rvs: (n_r,) uint32 — right values in sorted-key order.
    desc: (n_runs, DESC_COLS) int32 — per left row, in output order:
        [key_word, left_value_word, lo, m_copy, m_emit, 0, 0, 0].
        ``m_emit`` must be pre-clamped so that ``sum(m_emit) <= capacity``;
        ``0 <= m_copy <= m_emit``; ``m_emit - m_copy`` rows emit rv = 0.
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
            pltpu.VMEM((MAXE, LANES), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((_NUM_OUT + 1,)),
        ],
        input_output_aliases={2 + w: w for w in range(_NUM_OUT)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(desc, rvs_rows, *prefills)
    outs = [r.reshape(-1)[:capacity] for r in res[:_NUM_OUT]]
    return outs[0], outs[1], outs[2], res[_NUM_OUT][0]
