"""Empirical probes of Mosaic/Pallas + XLA capabilities on the v5e.

These answers pick the production sort design (see NOTES.md):
  P1: in-kernel take_along_axis along lanes (per-sublane lane gather)?
  P2: in-kernel take_along_axis along sublanes?
  P3: in-kernel jax.lax.sort?
  P4: XLA-level gather (x[perm]) throughput at 16M
  P5: XLA-level 1-key u32 argsort/sort throughput
  P6: scatter x.at[idx].set throughput
"""
import functools, time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(f, *args, reps=3):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][-1:])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][-1:])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe(name, fn):
    try:
        res = fn()
        print(f"[OK ] {name}: {res}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")
    sys.stdout.flush()


# ---- P1: lane gather in kernel
def p1():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1), 1)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ok = np.array_equal(np.asarray(out), np.asarray(x)[:, ::-1])
    return f"lane-gather works, correct={ok}"


# ---- P2: sublane gather in kernel
def p2():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    x = jnp.arange(256 * 128, dtype=jnp.int32).reshape(256, 128)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0), 0)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)
    ok = np.array_equal(np.asarray(out), np.asarray(x)[::-1, :])
    return f"sublane-gather works, correct={ok}"


# ---- P3: lax.sort in kernel
def p3():
    def k(x_ref, o_ref):
        o_ref[:] = jax.lax.sort(x_ref[:], dimension=1)

    x = jax.random.bits(jax.random.PRNGKey(0), (8, 128), jnp.uint32).astype(jnp.int32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ok = np.array_equal(np.asarray(out), np.sort(np.asarray(x), axis=1))
    return f"in-kernel sort works, correct={ok}"


# ---- P4: XLA gather throughput
def p4():
    n = 1 << 24
    x = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), n).astype(jnp.int32)
    f = jax.jit(lambda x, p: x[p])
    t = timed(f, x, perm)
    return f"{n/t/1e6:.0f}M elem/s, {n*8/t/1e9:.1f}GB/s eff"


# ---- P5: XLA 1-key sort
def p5():
    n = 1 << 24
    x = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    f = jax.jit(lambda x: jnp.sort(x))
    t = timed(f, x)
    return f"{n/t/1e6:.1f}M keys/s"


# ---- P6: XLA scatter
def p6():
    n = 1 << 24
    x = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
    perm = jax.random.permutation(jax.random.PRNGKey(1), n).astype(jnp.int32)
    f = jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x, unique_indices=True))
    t = timed(f, x, perm)
    return f"{n/t/1e6:.0f}M elem/s"


if __name__ == "__main__":
    for name, fn in [("P1 lane-gather", p1), ("P2 sublane-gather", p2),
                     ("P3 in-kernel sort", p3), ("P4 xla-gather", p4),
                     ("P5 xla-sort-1key", p5), ("P6 xla-scatter", p6)]:
        probe(name, fn)
