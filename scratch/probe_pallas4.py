"""Narrow the Mosaic crash: dtype (uint32?) vs op."""
import sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run2(kernel, *xs):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xs[0].shape, xs[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*xs)


def probe(name, fn):
    try:
        res = fn()
        print(f"[OK ] {name}: {res}")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")
    sys.stdout.flush()


u = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
s = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)

probe("C1 min uint32", lambda: (run2(lambda a, b, o: o.__setitem__(slice(None), jnp.minimum(a[:], b[:])), u, u + 1), "ok")[1])
probe("C2 min int32", lambda: (run2(lambda a, b, o: o.__setitem__(slice(None), jnp.minimum(a[:], b[:])), s, s + 1), "ok")[1])
probe("C3 where uint32", lambda: (run2(lambda a, b, o: o.__setitem__(slice(None), jnp.where(a[:] > b[:], a[:], b[:])), u, u + 1), "ok")[1])
probe("C4 cmp uint32", lambda: (run2(lambda a, b, o: o.__setitem__(slice(None), (a[:] < b[:]).astype(jnp.uint32)), u, u + 1), "ok")[1])
probe("C5 roll3d axis1", lambda: (run2(lambda a, o: o.__setitem__(slice(None), pltpu.roll(a[:].reshape(2, 4, 128), 1, axis=1).reshape(8, 128)), s), "ok")[1])
probe("C6 min int32 3d", lambda: (run2(lambda a, o: o.__setitem__(slice(None), jnp.minimum(a[:].reshape(2, 4, 128), 7).reshape(8, 128)), s), "ok")[1])
