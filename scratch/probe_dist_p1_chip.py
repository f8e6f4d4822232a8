"""Round-3 probe: real-chip P=1 anchor for the distributed-sort scaling
metric (VERDICT weak #8: the virtual-mesh P=1 vs P=8 efficiency number has
no real-hardware anchor).

Runs distributed_sort_pairs over a Mesh of the ONE real chip and the plain
single-chip sort_pairs on identical data, packed-I/O protocol, host-fetch
sync. The ratio = the distributed machinery's overhead at P=1 on real
hardware (splitter sketch + exchange against itself).
"""

import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
import radix_sort_tpu as rst
from radix_sort_tpu.parallel import dist_sort
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:] if leaf.ndim else leaf)
    return o


def tmin(f, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


N = 1 << 24  # 16M u64 pairs
rng = np.random.default_rng(0)
keys = rng.integers(0, 2**64, N, dtype=np.uint64)
vals = rng.integers(0, 2**64, N, dtype=np.uint64)

mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
sh = NamedSharding(mesh, P("x"))
kd = jax.device_put(jnp.asarray(keys), sh)
vd = jax.device_put(jnp.asarray(vals), sh)

dist_fn = jax.jit(lambda k, v: dist_sort.distributed_sort_pairs(k, v, mesh))
plain_fn = jax.jit(lambda k, v: rst.sort_pairs(k, v))

sync(dist_fn(kd, vd)); sync(plain_fn(kd, vd))
td = tmin(lambda: dist_fn(kd, vd))
tp = tmin(lambda: plain_fn(kd, vd))
print(f"P=1 real chip, {N} u64 pairs:", flush=True)
print(f"  distributed_sort_pairs: {td*1e3:8.1f} ms = {N/td/1e6:6.1f} M rows/s/device")
print(f"  single-chip sort_pairs: {tp*1e3:8.1f} ms = {N/tp/1e6:6.1f} M rows/s")
print(f"  dist/plain overhead: {td/tp:.2f}x")
print("done", flush=True)
