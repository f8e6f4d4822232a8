"""Cost of dynamic-offset VMEM reads/writes: unaligned vs 8-aligned vs static."""
import time
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
floor = timed(jax.jit(lambda x: x[:8, :1] + 1), x)
print(f"floor {floor*1e3:.1f}", flush=True)


def variant(name, mode):
    # mode: 0=static offsets, 1=dyn aligned8 + hint, 2=dyn aligned8 no hint,
    # 3=dyn unaligned
    W = 8

    def kernel(x_ref, o_ref, stage, cur, sem):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            def z(d, _):
                cur[d] = 0
                return 0
            jax.lax.fori_loop(0, K, z, 0)

        def per_bucket(d, _):
            ln = 64
            if mode == 0:
                off = (d % 8) * 8
            elif mode in (1, 2):
                off = ((cur[d] + d) % 128) // 8 * 8
                if mode == 1:
                    off = pl.multiple_of(off, 8)
            else:
                off = (cur[d] + d) % 120
            src = x_ref[pl.ds(0, W), :]
            r1 = pltpu.roll(src, (cur[d] % 128), axis=1)
            dst = stage[pl.ds(off, W), :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 1)
            stage[pl.ds(off, W), :] = jnp.where(lane < ln, r1, dst)
            cur[d] = cur[d] + ln
            return 0

        if mode == 4:
            for d in range(K):
                per_bucket(d, 0)
        else:
            jax.lax.fori_loop(0, K, per_bucket, 0)

        @pl.when(c == nchunks - 1)
        def _():
            o_ref[0, 0] = cur[0]

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            grid=(nchunks,),
            in_specs=[pl.BlockSpec((cr, LANES), lambda c: (c, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((256, LANES), jnp.uint32),
                pltpu.SMEM((K,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(x)

    ITERS = 4
    loop = jax.jit(
        lambda x: jax.lax.fori_loop(
            0, ITERS,
            lambda i, a: a.at[0, 0].set(call(a)[0, 0].astype(jnp.uint32)),
            x,
        )
    )
    t = (timed(loop, x) - floor) / ITERS
    print(f"{name}: {t*1e3:7.1f} ms ({t/(nchunks*K)*1e9:4.0f} ns/pair)", flush=True)


variant("fori dyn unaligned", 3)
variant("unrolled          ", 4)
