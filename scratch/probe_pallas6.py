"""Probe Mosaic vector gather/scatter forms in VMEM.

G1 2-D advanced indexing x[rows, lanes]
G2 flat take via reshape (1, m) lane gather beyond 128
G3 vector scatter o_ref[idx,:] = v (sublane scatter)
G4 per-row dynamic read in fori_loop (row-granular gather) + cost
G5 take_along_axis axis=0 small (8,128)
G6 dynamic_slice with traced start inside kernel (lane axis)
G7 scatter-add to VMEM hist: hist[d] += 1 via one_hot sum vs direct
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def probe(name, fn):
    try:
        res = fn()
        print(f"[OK ] {name}: {res}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")
    sys.stdout.flush()


def call(k, out_shape, *xs, smem=()):
    specs = []
    for x in xs:
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        k,
        out_shape=out_shape,
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*xs)


def g1():
    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    rows = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)

    def k(x_ref, r_ref, l_ref, o_ref):
        o_ref[:] = x_ref[r_ref[:], l_ref[:]]

    out = call(k, jax.ShapeDtypeStruct((64, 128), jnp.int32), x, rows, lanes)
    return f"2d adv idx ok={np.array_equal(np.asarray(out), np.asarray(x)[::-1])}"


def g2():
    m = 1024
    x = jnp.arange(m, dtype=jnp.int32).reshape(1, m)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (1, m), 1), 1)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    out = call(k, jax.ShapeDtypeStruct((1, m), jnp.int32), x, idx)
    return f"long-lane gather ok={np.array_equal(np.asarray(out)[0], np.asarray(x)[0][::-1])}"


def g3():
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.array([3, 1, 0, 7, 6, 2, 5, 4], jnp.int32)

    def k(x_ref, i_ref, o_ref):
        o_ref[i_ref[:], :] = x_ref[:]

    out = call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), x, idx)
    ref = np.zeros((8, 128), np.int32)
    ref[np.asarray(idx)] = np.asarray(x)
    return f"sublane scatter ok={np.array_equal(np.asarray(out), ref)}"


def g4():
    # per-row dynamic reads: permute 4096 rows of 128 via fori_loop of
    # dynamic slices; measure cost per row.
    R = 4096
    x = jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128)
    perm = np.random.default_rng(0).permutation(R).astype(np.int32)
    permj = jnp.asarray(perm)

    def k(x_ref, p_ref, o_ref):
        def body(i, _):
            o_ref[pl.ds(i, 1), :] = x_ref[pl.ds(p_ref[i], 1), :]
            return 0
        jax.lax.fori_loop(0, R, body, 0)

    def f(x, p):
        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, p)

    fj = jax.jit(f)
    out = np.asarray(sync(fj(x, permj)))
    ok = np.array_equal(out, np.asarray(x)[perm])
    ITERS = 32
    g = jax.jit(lambda x, p: jax.lax.fori_loop(0, ITERS, lambda i, a: f(a, p), x))
    t0 = time.perf_counter(); sync(g(x, permj)); t_tot = time.perf_counter() - t0
    sync(g(x, permj))
    t0 = time.perf_counter(); sync(g(x, permj)); t_tot = time.perf_counter() - t0
    per_row = (t_tot) / ITERS / R
    return f"row-dyn-read ok={ok}, {per_row*1e9:.0f} ns/row ({R*128/((t_tot)/ITERS)/1e6:.0f} M elem/s)"


def g5():
    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0), 0)

    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    out = call(k, jax.ShapeDtypeStruct((8, 128), jnp.int32), x, idx)
    return f"axis0 gather (8,128) ok={np.array_equal(np.asarray(out), np.asarray(x)[::-1])}"


def g6():
    x = jnp.arange(16 * 128, dtype=jnp.int32).reshape(16, 128)

    def k(x_ref, s_ref, o_ref):
        o_ref[:] = jax.lax.dynamic_slice(x_ref[:], (s_ref[0], s_ref[1]), (8, 64))

    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 64), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.array([3, 17], jnp.int32))
    return f"dyn 2d slice ok={np.array_equal(np.asarray(out), np.asarray(x)[3:11, 17:81])}"


for n, f in [("G1 adv-2d", g1), ("G2 long-lane", g2), ("G3 sublane-scatter", g3),
             ("G4 row-dyn-loop", g4), ("G5 axis0-gather-small", g5),
             ("G6 dyn-2d-slice", g6)]:
    probe(n, f)
