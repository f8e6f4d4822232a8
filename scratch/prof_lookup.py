"""Lookup-join leg vs inner-join leg of Q3, on-chip."""
import time, numpy as np, jax, jax.numpy as jnp
from radix_sort_tpu.table import Table
from radix_sort_tpu.utils.timing import sync

N = 1 << 24
NC = N // 16
rng = np.random.default_rng(0)
line = jnp.asarray(np.stack([
    rng.integers(0, NC, N).astype(np.uint32),
    (rng.random(N) * 1000).astype(np.float32).view(np.uint32),
]))
cust = jnp.asarray(np.stack([
    np.arange(NC, dtype=np.uint32),
    rng.integers(0, 5, NC).astype(np.uint32),
]))
as_f32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
as_u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)

def sides(p, c):
    lt = Table({"custkey": p[0], "price": as_f32(p[1])})
    ct = Table({"custkey": c[0], "mktseg": c[1]})
    ctf = ct.filter(ct["mktseg"] == 2).select("custkey")
    rt = ctf.aggregate(["custkey"], {"__m": "count"})
    return lt, ct, rt

@jax.jit
def lookup_leg(p, c):
    lt, ct, rt = sides(p, c)
    out, ovf = lt.join(rt, "custkey", how="lookup")
    return jnp.stack([out["custkey"], as_u32(out["price"]),
                      as_u32(out["__m"])])

@jax.jit
def inner_leg(p, c):
    lt, ct, rt = sides(p, c)
    out, ovf = lt.join(rt, "custkey", how="inner", capacity=N)
    return jnp.stack([out["custkey"], as_u32(out["price"]),
                      as_u32(out["__m"])])

@jax.jit
def ragg_only(p, c):
    lt, ct, rt = sides(p, c)
    return jnp.stack([rt["custkey"], as_u32(rt["__m"])])

def timeit(f, *a, runs=3):
    r = f(*a); sync(r)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter(); r = f(*a); sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)

print("ragg_only  ", round(timeit(ragg_only, line, cust) * 1000, 1), "ms")
print("lookup_leg ", round(timeit(lookup_leg, line, cust) * 1000, 1), "ms")
print("inner_leg  ", round(timeit(inner_leg, line, cust) * 1000, 1), "ms")
