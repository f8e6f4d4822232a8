"""Pallas within-chunk permutation apply.

Applies a data-dependent permutation to W co-arrays, one m-element chunk at
a time: ``out[c, j] = x[c, src[c, j]]``. This is the engine's replacement
for carrying payload operands through a comparator sort — the permutation is
computed once on a cheap single-word surrogate (bucket-id | position) by an
XLA rowsort, and this kernel moves all operands in one pass. XLA's own
variadic sort pays a slow random gather per payload operand on TPU; here the
gather runs on-chip from VMEM.

Mechanics: operands are row-interleaved (element-row r at physical row
r*Wp+w). For each output vreg the kernel enumerates every source element-row
R of the chunk (static unrolled — a fori_loop would cost ~80 ns/iteration in
loop overhead), broadcasts it, lane-gathers with the output's lane indices,
and keeps lanes whose source row is R. Cost is O(m/128) vector instructions
per output vreg, independent of operand count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radix_sort_tpu.ops.extract import phys_width

__all__ = ["apply_perm_chunks"]

LANES = 128


def _make_kernel(Wp, cr):
    """cr = chunk rows; chunk = cr*128 elements per operand."""

    def kernel(src_ref, *refs):
        x_refs = refs[:Wp]
        out_refs = refs[Wp : 2 * Wp]
        buf = refs[2 * Wp]  # interleaved chunk scratch (cr*Wp, 128)

        stk = jnp.stack([x_refs[w][...] for w in range(Wp)], axis=1)
        buf[...] = stk.reshape(cr * Wp, LANES)

        for ov in range(cr // 8):  # output vreg (8 element rows)
            s = src_ref[pl.ds(ov * 8, 8), :]  # (8,128) src element index
            srow = s // LANES
            slane = s % LANES
            # broadcast lane indices to the interleaved (8*Wp, 128) block
            slane_i = jnp.repeat(slane, Wp, axis=0)
            srow_i = jnp.repeat(srow, Wp, axis=0)
            acc = jnp.zeros((8 * Wp, LANES), jnp.uint32)
            for R in range(cr):
                # one interleaved source element-row: (Wp,128) at R*Wp
                rowblk = buf[pl.ds(R * Wp, Wp), :]
                # tile it across the 8 output element-rows
                bcast = jnp.concatenate([rowblk] * 8, axis=0)  # (8*Wp,128)
                g = jnp.take_along_axis(bcast, slane_i, axis=1)
                acc = jnp.where(srow_i == R, g, acc)
            # write this vreg's rows out immediately (keeps VMEM flat)
            deint = acc.reshape(8, Wp, LANES)
            for w in range(Wp):
                out_refs[w][pl.ds(ov * 8, 8), :] = deint[:, w]

    return kernel


def apply_perm_chunks(ops, src, m, *, interpret=None):
    """out[c, j] = ops[w][c, src[c, j]] for each chunk c of m elements.

    ops: list of uint32 arrays (N,); src: int32 (N,) with per-chunk-local
    source indices in [0, m). Returns the permuted list.
    """
    num_ops = len(ops)
    Wp = phys_width(num_ops)
    N = ops[0].shape[0]
    assert N % m == 0
    cr = m // LANES
    nchunks = N // m
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    padded = list(ops) + [ops[0]] * (Wp - num_ops)
    kernel = _make_kernel(Wp, cr)

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((N // LANES, LANES), jnp.uint32)
            for _ in range(Wp)
        ),
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
        ]
        * (Wp + 1),
        out_specs=tuple(
            pl.BlockSpec((cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)
            for _ in range(Wp)
        ),
        scratch_shapes=[pltpu.VMEM((cr * Wp, LANES), jnp.uint32)],
        interpret=interpret,
    )(src.reshape(-1, LANES), *[o.reshape(-1, LANES) for o in padded])
    return [outs[w].reshape(-1) for w in range(num_ops)]
