"""Pallas feasibility probes for the production sort kernels.

P10 dynamic-shift pltpu.roll (lane axis)
P11 dynamic sublane-offset read  x_ref[pl.ds(off, 8), :]
P12 dynamic sublane-offset write
P13 grid copy bandwidth (VMEM blocks through grid)
P14 bitonic rowsort prototype m=1024, 1 operand, (8,128) rows per block
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


def p10():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], -s_ref[0], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    s = jnp.array([5], jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)
    ok = np.array_equal(np.asarray(out), np.roll(np.asarray(x), -5, axis=1))
    return f"dynamic lane roll correct={ok}"


def p11():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = x_ref[pl.ds(s_ref[0], 8), :]

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    s = jnp.array([13], jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)
    ok = np.array_equal(np.asarray(out), np.asarray(x)[13:21])
    return f"dyn sublane read correct={ok}"


def p12():
    def k(x_ref, s_ref, o_ref):
        o_ref[pl.ds(s_ref[0], 8), :] = x_ref[:]

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    s = jnp.array([13], jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)
    o = np.asarray(out)
    ok = np.array_equal(o[13:21], np.asarray(x))
    return f"dyn sublane write correct={ok}"


def p13():
    N = 1 << 24
    BLK = 1 << 16  # elements per grid step, as (512, 128)

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    call = lambda x: pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
        grid=(N // BLK,),
        in_specs=[
            pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x)

    ITERS = 8
    f = jax.jit(
        lambda x: jax.lax.fori_loop(
            0, ITERS, lambda i, a: call(a), x.reshape(N // 128, 128)
        )
    )
    x = jax.random.bits(jax.random.PRNGKey(0), (N,), jnp.uint32)
    floor = timed(jax.jit(lambda x: x[:8] + 1), x)
    t = (timed(f, x, reps=3) - floor) / ITERS
    return f"grid copy: {t*1e3:.2f} ms, {N*4*2/t/1e9:.0f} GB/s"


def _bitonic_stage_lane(vals, j, up):
    """CE at lane distance j<128 via static reshape-free roll+select."""
    # partner = lanes XOR j: implement as two rolls + select
    lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, len(vals.shape) - 1)
    right = (lane & j) == 0  # partner is at +j for these lanes
    p_plus = pltpu.roll(vals, -j, axis=len(vals.shape) - 1)
    p_minus = pltpu.roll(vals, j, axis=len(vals.shape) - 1)
    partner = jnp.where(right, p_plus, p_minus)
    take_max = right != up  # ((i&j)!=0) == up  <=>  right != up ... right==(i&j)==0
    lo = jnp.minimum(vals, partner)
    hi = jnp.maximum(vals, partner)
    return jnp.where(take_max, hi, lo)


def p14():
    # bitonic rowsort of independent rows of m=1024 laid out as (G, 8, 128):
    # each row occupies 8 sublanes x 128 lanes; the flat element index within
    # a row is sub*128 + lane. G rows per block.
    m = 1024
    SUB = m // 128  # 8
    G = 64  # rows per grid block -> block (G*8, 128) = 64k elems = 256KB
    N = 1 << 24

    def kernel(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        # iota over flat row position
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, SUB, 128), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (G, SUB, 128), 2)
        pos = sub * 128 + lane
        for k in [1 << t for t in range(1, 11)]:  # 2..1024
            up = (pos & k) == 0
            j = k // 2
            while j >= 1:
                if j >= 128:
                    js = j // 128
                    # partner at sublane distance js: reshape sublane axis
                    vv = v.reshape(G, SUB // (2 * js), 2, js, 128)
                    a = vv[:, :, 0]
                    b = vv[:, :, 1]
                    lo = jnp.minimum(a, b)
                    hi = jnp.maximum(a, b)
                    upv = up.reshape(G, SUB // (2 * js), 2, js, 128)[:, :, 0]
                    na = jnp.where(upv, lo, hi)
                    nb = jnp.where(upv, hi, lo)
                    v = jnp.stack([na, nb], axis=2).reshape(G, SUB, 128)
                else:
                    lane_j = lane & j
                    right = lane_j == 0
                    p_plus = pltpu.roll(v, 128 - j, axis=2)
                    p_minus = pltpu.roll(v, j, axis=2)
                    partner = jnp.where(right, p_plus, p_minus)
                    take_max = jnp.logical_not(right) == up
                    lo = jnp.minimum(v, partner)
                    hi = jnp.maximum(v, partner)
                    v = jnp.where(take_max, hi, lo)
                j //= 2
        o_ref[:] = v.reshape(G * SUB, 128)

    ROWS = N // m

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
            grid=(ROWS // G,),
            in_specs=[
                pl.BlockSpec((G * SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((G * SUB, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x.reshape(N // 128, 128))

    fj = jax.jit(f)
    x = jax.random.bits(jax.random.PRNGKey(0), (N,), jnp.uint32)
    out = np.asarray(sync(fj(x)))[: (1 << 20) // 128].reshape(-1, m)
    ref = np.sort(np.asarray(x)[: 1 << 20].reshape(-1, m), axis=1)
    ok = np.array_equal(out, ref)
    ITERS = 8
    floor = timed(jax.jit(lambda x: x[:8] + 1), x)
    g = jax.jit(
        lambda x: jax.lax.fori_loop(
            0, ITERS, lambda i, a: f(a.reshape(-1)), x.reshape(N // 128, 128)
        )
    )
    t = (timed(g, x, reps=3) - floor) / ITERS
    return f"rowsort m=1024 1op: correct={ok}, {t*1e3:.2f} ms, {N/t/1e6:.0f} M/s"


if __name__ == "__main__":
    for name, fn in [("P10 dyn-roll", p10), ("P11 dyn-sublane-read", p11),
                     ("P12 dyn-sublane-write", p12), ("P13 grid-copy-bw", p13),
                     ("P14 bitonic-rowsort", p14)]:
        probe(name, fn)
