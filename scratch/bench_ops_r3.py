"""Round-3 op perf datapoints on the real chip (packed-I/O protocol)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import radix_sort_tpu as rst
from radix_sort_tpu.utils.timing import sync

RUNS = 3

def timed(fn, packed):
    sync(fn(packed))  # compile+warm
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        sync(fn(packed))
        ts.append(time.perf_counter() - t0)
    return float(np.mean(ts))

def report(name, n, dt):
    print(f"{name}: {dt*1e3:.1f} ms  ({n/dt/1e6:.1f} M rows/s)")

rng = np.random.default_rng(0)

# ---- window: 3 specs over one sort pair, 16M rows, 10k partitions ----
n = 1 << 24
p = rng.integers(0, 10_000, n).astype(np.uint32)
o = rng.integers(0, 1 << 31, n).astype(np.uint32)
v = rng.integers(-1000, 1000, n).astype(np.int32)
packed = jnp.asarray(np.stack([p, o, v.view(np.uint32)]))

@jax.jit
def win(x):
    vv = jax.lax.bitcast_convert_type(x[2], jnp.int32)
    outs = rst.window(
        ["rank", ("cumsum", vv), ("sum", vv)],
        partition_by=x[0], order_by=x[1],
    )
    return jnp.stack([outs[0].astype(jnp.uint32),
                      outs[1].astype(jnp.uint32),
                      outs[2].astype(jnp.uint32)])
report("window[rank+cumsum+sum] 16M x 10k parts", n, timed(win, packed))

# ---- rolling frame window ----
@jax.jit
def win_roll(x):
    vv = jax.lax.bitcast_convert_type(x[2], jnp.int32)
    out = rst.window(("rolling_sum", vv, 64, 32),
                     partition_by=x[0], order_by=x[1])
    return out.astype(jnp.uint32)[None]
report("window[rolling_sum p=64 f=32] 16M", n, timed(win_roll, packed))

# ---- asof join: 4M x 4M backward ----
m = 1 << 22
lk = rng.integers(0, 1 << 31, m).astype(np.int32)
rk = rng.integers(0, 1 << 31, m).astype(np.int32)
rv = rng.integers(0, 1 << 31, m).astype(np.uint32)
packed2 = jnp.asarray(np.stack([lk.view(np.uint32), rk.view(np.uint32), rv]))

@jax.jit
def asof(x):
    lkk = jax.lax.bitcast_convert_type(x[0], jnp.int32)
    rkk = jax.lax.bitcast_convert_type(x[1], jnp.int32)
    vals, matched, pos = rst.join_asof(lkk, rkk, x[2], direction="backward")
    return jnp.stack([vals, matched.astype(jnp.uint32),
                      pos.astype(jnp.uint32)])
report("join_asof backward 4M x 4M", m, timed(asof, packed2))

# ---- holistic aggregates at 16M rows / 1M groups ----
k16 = rng.integers(0, 1 << 20, n).astype(np.uint32)
v16 = rng.integers(-1000, 1000, n).astype(np.int32)
packed3 = jnp.asarray(np.stack([k16, v16.view(np.uint32)]))

for agg in ("median", "mode", "argmax", "count_distinct"):
    @jax.jit
    def hagg(x, agg=agg):
        vv = jax.lax.bitcast_convert_type(x[1], jnp.int32)
        uk, av, cnt = rst.hash_aggregate(x[0], vv, agg)
        return jnp.stack([uk, av.astype(jnp.uint32)])
    report(f"hash_aggregate[{agg}] 16M rows 1M groups", n, timed(hagg, packed3))
