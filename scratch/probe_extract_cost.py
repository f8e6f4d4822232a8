"""Isolate the extractor's per-(chunk,bucket) cost: scalar loop floor vs
append vector work vs flush DMAs. Strip-down variants of the kernel.
"""
import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 24
m = 4096
cr = m // 128
K = 64
nchunks = N // m
LANES = 128


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def timed(f, *args, reps=3):
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)).reshape(-1, 128)
# uniform-ish bounds
b = np.zeros((nchunks, K + 1), np.int32)
for c in range(nchunks):
    cuts = np.sort(rng.integers(0, m + 1, K - 1))
    b[c] = np.concatenate([[0], cuts, [m]])
bounds = jnp.asarray(b)
floor = timed(jax.jit(lambda x: x[:8, :1] + 1), x)
print(f"floor {floor*1e3:.1f}", flush=True)


def variant(name, body_mode):
    SR = 32

    def kernel(bounds_ref, x_ref, o_ref, cnt_ref, stage, cur, sem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            def z(d, _):
                cur[d] = 0
                return 0
            jax.lax.fori_loop(0, K, z, 0)

        def per_bucket(d, _):
            b0 = bounds_ref[c % 8, d]
            b1 = bounds_ref[c % 8, d + 1]
            ln = b1 - b0

            @pl.when(ln > 0)
            def _():
                if body_mode >= 1:  # + vector append (W=16 window RMW)
                    p = cur[d] % 1024
                    r0 = p // LANES
                    W = 16
                    src = x_ref[pl.ds(0, W), :]  # skip real window math
                    sl = (p - b0) % 128
                    r1 = pltpu.roll(src, sl, axis=1)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
                    rolled = jnp.where(lane < sl, pltpu.roll(r1, 1, axis=0), r1)
                    dst = stage[pl.ds(d % 8 * SR + r0, W), :]
                    q = lane + r0
                    stage[pl.ds(d % 8 * SR + r0, W), :] = jnp.where(
                        (q >= p) & (q < p + ln), rolled, dst
                    )
                if body_mode >= 2:  # + flush DMA every ~16 appends
                    @pl.when((cur[d] + ln) // 1024 > cur[d] // 1024)
                    def _():
                        dma = pltpu.make_async_copy(
                            stage.at[pl.ds(d % 8 * SR, 8), :],
                            o_ref.at[pl.ds(((c * K + d) * 8) % (N // 128 - 8), 8), :],
                            sem,
                        )
                        dma.start()
                        dma.wait()
                cur[d] = cur[d] + ln

            return 0

        jax.lax.fori_loop(0, K, per_bucket, 0)

        @pl.when(c == nchunks - 1)
        def _():
            def w(d, _):
                cnt_ref[d] = cur[d]
                return 0
            jax.lax.fori_loop(0, K, w, 0)

    def call(bounds, x):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
                jax.ShapeDtypeStruct((K,), jnp.int32),
            ),
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec((8, K + 1), lambda c: (c // 8, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((8 * 32, LANES), jnp.uint32),
                pltpu.SMEM((K,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(bounds, x)

    ITERS = 4
    def loop(bounds, x):
        def body(i, x):
            o, cnt = call(bounds, x)
            return o
        return jax.lax.fori_loop(0, ITERS, body, x)

    t = (timed(jax.jit(loop), bounds, x) - floor) / ITERS
    per_pair = t / (nchunks * K)
    print(f"{name}: {t*1e3:7.1f} ms  ({per_pair*1e9:5.0f} ns/pair)", flush=True)


variant("scalar loop only    ", 0)
variant("+append W=16        ", 1)
variant("+flush DMA          ", 2)
