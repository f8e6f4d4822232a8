"""Bisect the P14 Mosaic crash: which construct fails?
A: roll on 3-D axis=2
B: 5-D reshape + slice + stack
C: minimum/maximum + where on 3-D
D: one full lane-stage (roll+where)
E: one full sublane-stage (reshape/stack)
F: full network but G=8 block (smaller unroll)
"""
import sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(kernel, x, out_shape=None):
    out_shape = out_shape or jax.ShapeDtypeStruct(x.shape, x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe(name, fn):
    try:
        res = fn()
        print(f"[OK ] {name}: {res}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")
    sys.stdout.flush()


G, SUB = 8, 8
x3 = jnp.arange(G * SUB * 128, dtype=jnp.uint32).reshape(G * SUB, 128)


def a():
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        v = pltpu.roll(v, 5, axis=2)
        o_ref[:] = v.reshape(G * SUB, 128)
    out = run(k, x3)
    ok = np.array_equal(np.asarray(out).reshape(G, SUB, 128),
                        np.roll(np.asarray(x3).reshape(G, SUB, 128), 5, 2))
    return f"3d roll ok={ok}"


def b():
    js = 2
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        vv = v.reshape(G, SUB // (2 * js), 2, js, 128)
        a_, b_ = vv[:, :, 0], vv[:, :, 1]
        v = jnp.stack([b_, a_], axis=2).reshape(G, SUB, 128)
        o_ref[:] = v.reshape(G * SUB, 128)
    out = run(k, x3)
    r = np.asarray(x3).reshape(G, SUB // (2 * js), 2, js, 128)
    ref = np.stack([r[:, :, 1], r[:, :, 0]], 2).reshape(G * SUB, 128)
    return f"5d reshape/stack ok={np.array_equal(np.asarray(out), ref)}"


def c():
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        p = pltpu.roll(v, 1, axis=1)
        lo = jnp.minimum(v, p); hi = jnp.maximum(v, p)
        m = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) % 2 == 0
        o_ref[:] = jnp.where(m, lo, hi).reshape(G * SUB, 128)
    run(k, x3)
    return "minmax/where 3d ok"


def d():
    j = 4
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
        right = (lane & j) == 0
        partner = jnp.where(right, pltpu.roll(v, 128 - j, axis=2),
                            pltpu.roll(v, j, axis=2))
        up = (lane & (2 * j)) == 0
        take_max = jnp.logical_not(right) == up
        o_ref[:] = jnp.where(take_max, jnp.maximum(v, partner),
                             jnp.minimum(v, partner)).reshape(G * SUB, 128)
    run(k, x3)
    return "full lane stage ok"


def e():
    def k(x_ref, o_ref):
        v = x_ref[:].reshape(G, SUB, 128)
        sub = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        js = 2
        vv = v.reshape(G, SUB // (2 * js), 2, js, 128)
        a_, b_ = vv[:, :, 0], vv[:, :, 1]
        lo = jnp.minimum(a_, b_); hi = jnp.maximum(a_, b_)
        upv = (sub.reshape(G, SUB // (2 * js), 2, js, 128)[:, :, 0] & 8) == 0
        na = jnp.where(upv, lo, hi); nb = jnp.where(upv, hi, lo)
        v = jnp.stack([na, nb], axis=2).reshape(G, SUB, 128)
        o_ref[:] = v.reshape(G * SUB, 128)
    run(k, x3)
    return "full sublane stage ok"


def f():
    # full 1024-network, tiny grid block
    m, SUBm, Gm = 1024, 8, 8
    N = 1 << 18
    def kernel(x_ref, o_ref):
        v = x_ref[:].reshape(Gm, SUBm, 128)
        sub = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
        pos = sub * 128 + lane
        for k in [1 << t for t in range(1, 11)]:
            up = (pos & k) == 0
            j = k // 2
            while j >= 1:
                if j >= 128:
                    js = j // 128
                    vv = v.reshape(Gm, SUBm // (2 * js), 2, js, 128)
                    a_, b_ = vv[:, :, 0], vv[:, :, 1]
                    lo = jnp.minimum(a_, b_); hi = jnp.maximum(a_, b_)
                    upv = up.reshape(Gm, SUBm // (2 * js), 2, js, 128)[:, :, 0]
                    v = jnp.stack([jnp.where(upv, lo, hi),
                                   jnp.where(upv, hi, lo)], axis=2).reshape(Gm, SUBm, 128)
                else:
                    right = (lane & j) == 0
                    partner = jnp.where(right, pltpu.roll(v, 128 - j, axis=2),
                                        pltpu.roll(v, j, axis=2))
                    take_max = jnp.logical_not(right) == up
                    v = jnp.where(take_max, jnp.maximum(v, partner),
                                  jnp.minimum(v, partner))
                j //= 2
        o_ref[:] = v.reshape(Gm * SUBm, 128)

    x = jax.random.bits(jax.random.PRNGKey(0), (N,), jnp.uint32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32),
        grid=(N // (Gm * m),),
        in_specs=[pl.BlockSpec((Gm * SUBm, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Gm * SUBm, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x.reshape(N // 128, 128))
    ok = np.array_equal(np.asarray(out).reshape(-1, m),
                        np.sort(np.asarray(x).reshape(-1, m), axis=1))
    return f"full net G=8 ok={ok}"


for name, fn in [("A roll3d", a), ("B 5dreshape", b), ("C minmax", c),
                 ("D lanestage", d), ("E sublanestage", e), ("F fullnet", f)]:
    probe(name, fn)
