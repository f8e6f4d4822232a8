"""Where does ROLLUP time go? aggregate_sets pieces, on-chip, packed I/O."""
import time, numpy as np, jax, jax.numpy as jnp
from radix_sort_tpu.table import Table
from radix_sort_tpu.utils.timing import sync
from radix_sort_tpu.ops import query as Q

N = 1 << 24
rng = np.random.default_rng(0)
status = jnp.asarray(rng.integers(0, 4, N).astype(np.uint32))
qty = jnp.asarray(rng.integers(0, 50, N).astype(np.int32))
year = jnp.asarray(rng.integers(2020, 2027, N).astype(np.int32))
packed = jnp.stack([status, qty.astype(jnp.uint32), year.astype(jnp.uint32)])
AG = {"cnt": "count", "s": ("sum", "qty")}

def tbl(p):
    return Table({"status": p[0], "qty": p[1].astype(jnp.int32),
                  "y": p[2].astype(jnp.int32)})

@jax.jit
def full_sets(p):
    t = tbl(p)
    out = t.aggregate_sets([["status", "y"], ["status"], []], AG,
                           grouping={"g": "y"})
    return jnp.stack([out["status"].astype(jnp.uint32),
                      out["cnt"].astype(jnp.uint32),
                      out["s"].astype(jnp.uint32)])

@jax.jit
def levels_only(p):
    t = tbl(p)
    tabs = t._aggregate_set_tables([["status", "y"], ["status"], []], AG)
    outs = []
    for k, tt in tabs.items():
        outs += [tt["cnt"].astype(jnp.uint32)]
    return jnp.stack(outs)

@jax.jit
def one_agg(p):
    t = tbl(p)
    out = t.aggregate(["status", "y"], AG)
    return jnp.stack([out["cnt"].astype(jnp.uint32),
                      out["s"].astype(jnp.uint32)])

def timeit(f, *a, runs=3):
    r = f(*a); sync(r)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter(); r = f(*a); sync(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)

print("one_agg      ", round(timeit(one_agg, packed) * 1000, 1), "ms")
print("levels_only  ", round(timeit(levels_only, packed) * 1000, 1), "ms")
print("full_sets    ", round(timeit(full_sets, packed) * 1000, 1), "ms")
