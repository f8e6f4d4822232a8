"""P14 retry: bitonic rowsort kernel with compare+select (no unsigned minmax),
amortized timing. Also re-time grid copy with more iterations.
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.reshape(-1)[-1:])
    return out


def timed(f, *args, reps=3):
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe(name, fn):
    try:
        res = fn()
        print(f"[OK ] {name}: {res}")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")
    sys.stdout.flush()


N = 1 << 24
m = 1024
SUB = m // 128
G = 64  # rows per block: block = (G*SUB, 128) = 64K elems = 256KB


def make_rowsort(G):
    def kernel(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        sub = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
        pos = sub * 128 + lane
        for k in [1 << t for t in range(1, 11)]:
            up = (pos & k) == 0
            j = k // 2
            while j >= 1:
                if j >= 128:
                    js = j // 128
                    vv = v.reshape(G, SUB // (2 * js), 2, js, 128)
                    a_, b_ = vv[:, :, 0], vv[:, :, 1]
                    a_lt = a_ < b_
                    upv = up.reshape(G, SUB // (2 * js), 2, js, 128)[:, :, 0]
                    swap = a_lt != upv  # if up: swap when a>b -> keep asc
                    na = jnp.where(swap, b_, a_)
                    nb = jnp.where(swap, a_, b_)
                    v = jnp.stack([na, nb], axis=2).reshape(G, SUB, 128)
                else:
                    right = (lane & j) == 0
                    partner = jnp.where(
                        right,
                        pltpu.roll(v, 128 - j, axis=2),
                        pltpu.roll(v, j, axis=2),
                    )
                    v_lt = v < partner
                    take_small = right == up
                    keep = v_lt == take_small
                    v = jnp.where(keep, v, partner)
                j //= 2
        o_ref[:] = v.reshape(G * SUB, 128)

    def f(x2):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
            grid=(N // (G * m),),
            in_specs=[pl.BlockSpec((G * SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G * SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x2)

    return f


def p14():
    f = make_rowsort(G)
    fj = jax.jit(lambda x: f(x.reshape(N // 128, 128)))
    x = jax.random.bits(jax.random.PRNGKey(0), (N,), jnp.uint32)
    out = np.asarray(sync(fj(x)))[: (1 << 20) // 128].reshape(-1, m)
    ref = np.sort(np.asarray(x)[: 1 << 20].reshape(-1, m), axis=1)
    ok = np.array_equal(out, ref)
    ITERS = 8
    floor = timed(jax.jit(lambda x: x[:8] + 1), x)
    g = jax.jit(
        lambda x: jax.lax.fori_loop(
            0, ITERS, lambda i, a: f(a), x.reshape(N // 128, 128)
        )
    )
    t = (timed(g, x, reps=3) - floor) / ITERS
    return f"pallas rowsort m=1024: correct={ok}, {t*1e3:.2f} ms, {N/t/1e6:.0f} M/s"


def p13():
    BLK = 1 << 16

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    def call(x):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
            grid=(N // BLK,),
            in_specs=[pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x)

    ITERS = 64
    f = jax.jit(lambda x: jax.lax.fori_loop(0, ITERS, lambda i, a: call(a), x.reshape(N // 128, 128)))
    x = jax.random.bits(jax.random.PRNGKey(0), (N,), jnp.uint32)
    floor = timed(jax.jit(lambda x: x[:8] + 1), x)
    t = (timed(f, x, reps=3) - floor) / ITERS
    return f"grid copy: {t*1e3:.3f} ms, {N*4*2/t/1e9:.0f} GB/s"


probe("P13 grid-copy-bw", p13)
probe("P14 pallas-rowsort", p14)
