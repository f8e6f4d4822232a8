"""Mini-extractor feasibility: grid-sequential streaming compactor.

Validates the machinery the production extractor needs, in one kernel:
  - SMEM per-grid-step blocks (boundaries)
  - VMEM scratch + SMEM scalar scratch persisting across grid steps
  - dynamic flat-roll append into staging (carry partial rows)
  - 8-row DMA flushes from staging to HBM output at dynamic sublane offsets
  - final drain on the last grid step

Task: each 1024-chunk has a valid prefix [0, n_c); concatenate all prefixes
densely (the "compaction" op). Correctness vs numpy + amortized timing.
"""
import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024
SUB = CHUNK // 128  # 8 rows per chunk
STAGE_ROWS = 16


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def flat_roll(x, s):
    """Circular roll of (R,128) block by s elements in flat row-major order."""
    R = x.shape[0]
    sl = s % 128
    rs = (s // 128) % R
    r1 = pltpu.roll(x, sl, axis=1)
    a = pltpu.roll(r1, rs, axis=0)
    b = pltpu.roll(r1, (rs + 1) % R, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < sl, b, a)


def kernel(n_ref, x_ref, o_ref, cnt_ref, stage, sloc, obase, sem):
    c = pl.program_id(0)
    nchunks = pl.num_programs(0)

    @pl.when(c == 0)
    def _init():
        sloc[0] = 0
        obase[0] = 0
        stage[...] = jnp.zeros_like(stage)

    n = n_ref[c]  # valid prefix of this chunk
    p = sloc[0]

    # append chunk[0:n] at staging offset p
    rolled = flat_roll(x_ref[:], p)  # works since b0 = 0
    r0 = p // 128
    # 9-row window starting at rolled row (r0 % SUB), wrapping
    shifted = pltpu.roll(rolled, (SUB - r0 % SUB) % SUB, axis=0)
    w = jnp.concatenate([shifted, shifted[:1]], axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB + 1, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB + 1, 128), 1)
    q = (r0 + row) * 128 + lane
    mask = (q >= p) & (q < p + n)
    cur = stage[pl.ds(r0, SUB + 1), :]
    stage[pl.ds(r0, SUB + 1), :] = jnp.where(mask, w, cur)
    sloc[0] = p + n

    # flush full 8-row block if ready
    @pl.when(sloc[0] >= CHUNK)
    def _flush():
        dma = pltpu.make_async_copy(
            stage.at[pl.ds(0, SUB), :],
            o_ref.at[pl.ds(obase[0] // 128, SUB), :],
            sem,
        )
        dma.start()
        dma.wait()
        # shift remainder down, zero the tail
        rest = stage[pl.ds(SUB, SUB), :]
        stage[pl.ds(0, SUB), :] = rest
        stage[pl.ds(SUB, SUB), :] = jnp.zeros((SUB, 128), stage.dtype)
        obase[0] = obase[0] + CHUNK
        sloc[0] = sloc[0] - CHUNK

    # drain on last step (partial rows incl.)
    @pl.when(c == nchunks - 1)
    def _drain():
        nrows = (sloc[0] + 127) // 128

        @pl.when(nrows > 0)
        def _():
            dma = pltpu.make_async_copy(
                stage.at[pl.ds(0, SUB), :],
                o_ref.at[pl.ds(obase[0] // 128, SUB), :],
                sem,
            )
            dma.start()
            dma.wait()

        cnt_ref[0] = obase[0] + sloc[0]


def compact(x, n, nchunks):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((SUB, 128), lambda c, n_ref: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((STAGE_ROWS, 128), jnp.uint32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(((nchunks + 1) * SUB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(n, x)


def main():
    N = 1 << 22
    nchunks = N // CHUNK
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**32, size=N, dtype=np.uint32)
    n = rng.integers(0, CHUNK + 1, size=nchunks).astype(np.int32)

    xj = jnp.asarray(x).reshape(nchunks * SUB, 128)
    nj = jnp.asarray(n)

    f = jax.jit(functools.partial(compact, nchunks=nchunks))
    out, cnt = sync(f(xj, nj))
    out = np.asarray(out).reshape(-1)
    cnt = int(np.asarray(cnt)[0])

    ref = np.concatenate([x[i * CHUNK : i * CHUNK + n[i]] for i in range(nchunks)])
    ok = cnt == len(ref) and np.array_equal(out[: len(ref)], ref)
    print(f"correct={ok} cnt={cnt} expected={len(ref)}")

    ITERS = 8
    floor_f = jax.jit(lambda x: x[:8] + 1)
    sync(floor_f(xj))
    t0 = time.perf_counter(); sync(floor_f(xj)); floor = time.perf_counter() - t0

    def loop(x, n):
        def body(i, acc):
            o, c2 = f(acc, n)
            return o[: nchunks * SUB] ^ c2[0].astype(jnp.uint32)
        return jax.lax.fori_loop(0, ITERS, body, x)

    g = jax.jit(loop)
    sync(g(xj, nj))
    t0 = time.perf_counter(); sync(g(xj, nj)); t = (time.perf_counter() - t0 - floor) / ITERS
    print(f"{t*1e3:.2f} ms for {N} elems = {N/t/1e6:.0f} M/s")


main()
