"""Real-chip P=1 datapoint for the distributed sort path (BASELINE.md
scaling row): distributed_sort_pairs on a 1-device mesh of the real TPU,
packed I/O (one (2,n) buffer each way — the axon relay charges ~29 ms per
in/out buffer), mean of 5 runs. Pins the virtual-mesh dryrun's P=1 number
to real hardware.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scratch/p1_realchip.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radix_sort_tpu.parallel import dist_sort
from radix_sort_tpu.utils.timing import sync

n = 1 << 26  # 67M rows (u32 key + u32 payload)
mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
rng = np.random.default_rng(0)
kv = np.stack([
    rng.integers(0, 1 << 32, n, dtype=np.uint32).astype(np.uint32),
    np.arange(n, dtype=np.uint32),
])
kvd = jax.device_put(jnp.asarray(kv), NamedSharding(mesh, P(None, "x")))


@jax.jit
def step(p):
    k, v, _, _ = dist_sort.distributed_sort_pairs(p[0], p[1], mesh)
    return jnp.stack([k, v])


out = sync(step(kvd))  # compile + correctness smoke
ks = np.asarray(out[0])
assert (np.diff(ks.astype(np.int64)) >= 0).all(), "not sorted"

times = []
for _ in range(5):
    t0 = time.perf_counter()
    sync(step(kvd))
    times.append(time.perf_counter() - t0)
mean = float(np.mean(times))
print(f"P=1 real chip: n={n:,} rows, {mean:.3f} s "
      f"= {n / mean / 1e6:.1f} M rows/s/device (distributed-sort path, "
      f"packed I/O, mean of 5)")
