"""Pallas within-chunk permutation apply (chunks of <= 1024 elements).

Applies a data-dependent permutation to W co-arrays, one m-element chunk at
a time: ``out[c, j] = x[c, src[c, j]]``. This is the engine's replacement
for carrying payload operands through a comparator sort — the permutation is
computed once on a cheap single-word surrogate (bucket-id | position) by an
XLA rowsort, and this kernel moves all operands in one pass. XLA's variadic
sort pays a slow random gather per payload operand on TPU; here the gather
runs on-chip from VMEM.

m is capped at 1024 (one vreg of 8x128 per operand) so the gather decomposes
into 8 source-row steps: broadcast source row R across sublanes, lane-gather
with the output's lane indices, keep lanes whose source row is R. Operands
are row-interleaved so the index math is shared; the per-chunk cost is
8 * (3 + W) vector instructions for 1024*W elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["apply_perm_chunks", "MAX_M"]

LANES = 128
MAX_M = 1024  # one (8,128) vreg per operand per chunk


def _make_kernel(W, cr, g):
    """W operands, cr = chunk rows (<= 8), g = chunks per grid block.

    Vectorized over the g chunks of the block: every instruction works a
    (g, cr, 128) tile, so the 8 source-row scan costs 8*(3+W) big vector
    ops per block instead of per chunk.
    """

    def kernel(src_ref, *refs):
        x_refs = refs[:W]
        out_refs = refs[W : 2 * W]

        s = src_ref[...]  # (g*cr, 128)
        srow = s // LANES
        slane = s % LANES
        xs = [x_refs[w][...].reshape(g, cr, LANES) for w in range(W)]
        accs = [jnp.zeros((g * cr, LANES), jnp.uint32) for _ in range(W)]
        for R in range(cr):
            sel = srow == R
            for w in range(W):
                row = jnp.broadcast_to(
                    xs[w][:, R : R + 1, :], (g, cr, LANES)
                ).reshape(g * cr, LANES)
                gat = jnp.take_along_axis(row, slane, axis=1)
                accs[w] = jnp.where(sel, gat, accs[w])
        for w in range(W):
            out_refs[w][...] = accs[w]

    return kernel


def apply_perm_chunks(ops, src, m, *, interpret=None):
    """out[c, j] = ops[w][c, src[c, j]] for each chunk c of m elements.

    ops: list of uint32 arrays (N,); src: int32 (N,) with per-chunk-local
    source indices in [0, m). m must divide N and be <= 1024 and a multiple
    of 128. Returns the permuted list.
    """
    assert m <= MAX_M and m % LANES == 0, m
    W = len(ops)
    N = ops[0].shape[0]
    assert N % m == 0
    cr = m // LANES
    nchunks = N // m
    # several chunks per grid step to amortize grid overhead
    g = 1
    while g < 64 and nchunks % (g * 2) == 0 and (g * 2) * cr <= 512:
        g *= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = _make_kernel(W, cr, g)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((N // LANES, LANES), jnp.uint32)
            for _ in range(W)
        ),
        grid=(nchunks // g,),
        in_specs=[
            pl.BlockSpec((g * cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
        ]
        * (W + 1),
        out_specs=tuple(
            pl.BlockSpec((g * cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
            for _ in range(W)
        ),
        interpret=interpret,
    )(src.reshape(-1, LANES), *[o.reshape(-1, LANES) for o in ops])
    return [outs[w].reshape(-1) for w in range(W)]
