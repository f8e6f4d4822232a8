"""Q3 decomposition: join vs aggregate vs topk, on-chip, packed I/O."""
import time, numpy as np, jax, jax.numpy as jnp
from radix_sort_tpu.table import Table
from radix_sort_tpu.sql import sql
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

@jax.jit
def join_only(p, c):
    t = Table({"custkey": p[0], "price": as_f32(p[1])})
    ct = Table({"custkey": c[0], "mktseg": c[1]})
    out = sql("SELECT custkey, price FROM l JOIN c USING (custkey) "
              "WHERE mktseg = 2", {"l": t, "c": ct}, capacity=N).collect()
    return jnp.stack([out["custkey"], as_u32(out["price"])])

@jax.jit
def agg_only(p):
    t = Table({"custkey": p[0], "price": as_f32(p[1])})
    out = sql("SELECT custkey, SUM(price) AS rev FROM l GROUP BY custkey "
              "ORDER BY rev DESC LIMIT 10", {"l": t}).collect()
    return jnp.stack([out["custkey"], as_u32(out["rev"].astype(jnp.float32))])

@jax.jit
def semi_only(p, c):
    t = Table({"custkey": p[0], "price": as_f32(p[1])})
    ct = Table({"custkey": c[0], "mktseg": c[1]})
    out = sql("SELECT custkey, price FROM l WHERE custkey IN "
              "(SELECT custkey FROM c WHERE mktseg = 2)",
              {"l": t, "c": ct}).collect()
    return jnp.stack([out["custkey"], as_u32(out["price"])])

@jax.jit
def q3(p, c):
    t = Table({"custkey": p[0], "price": as_f32(p[1])})
    ct = Table({"custkey": c[0], "mktseg": c[1]})
    out = sql("SELECT custkey, SUM(price) AS rev FROM l "
              "JOIN c USING (custkey) WHERE mktseg = 2 "
              "GROUP BY custkey ORDER BY rev DESC LIMIT 10",
              {"l": t, "c": ct}, capacity=N, max_groups=NC).collect()
    return jnp.stack([out["custkey"], as_u32(out["rev"].astype(jnp.float32))])

def timeit(f, *a, runs=3):
    r = f(*a); sync(r)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter(); r = f(*a); sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)

print("join_only ", round(timeit(join_only, line, cust) * 1000, 1), "ms")
print("agg_only  ", round(timeit(agg_only, line) * 1000, 1), "ms")
print("semi_only ", round(timeit(semi_only, line, cust) * 1000, 1), "ms")
print("q3        ", round(timeit(q3, line, cust) * 1000, 1), "ms")
