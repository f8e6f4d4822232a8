"""Naive (rewrite-disabled) fanout-4 join+group for the BASELINE 'vs' row."""
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
cont = jnp.asarray(np.stack([
    np.repeat(np.arange(NC, dtype=np.uint32), 4),
    rng.integers(0, 5, 4 * NC).astype(np.uint32),
]))
as_f32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
as_u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)

@jax.jit
def naive(p, co):
    lt = Table({"custkey": p[0], "price": as_f32(p[1])})
    ct = Table({"custkey": co[0]})
    j, ovf = lt.join(ct, "custkey", how="inner", capacity=4 * N)
    out = j.aggregate(["custkey"], {"rev": ("sum", "price"),
                                    "cnt": "count"})
    out = out.top_k(10, "rev")
    return jnp.stack([out["custkey"], as_u32(out["rev"].astype(jnp.float32)),
                      as_u32(out["cnt"].astype(jnp.int32))])

r = naive(line, cont); sync(r)
ts = []
for _ in range(3):
    t0 = time.perf_counter(); r = naive(line, cont); sync(r)
    ts.append(time.perf_counter() - t0)
print("naive fanout-4 join+group:", round(min(ts) * 1000, 1), "ms")
