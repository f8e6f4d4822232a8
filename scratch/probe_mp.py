"""Probe: 2-process CPU jax.distributed bring-up + one cross-process
collective. Launch (per process i in {0,1}):

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python scratch/probe_mp.py <i> 2 localhost:PORT
"""
import sys

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.distributed.initialize(coord, num_processes=nproc, process_id=pid)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

print(f"[{pid}] procs={jax.process_count()} global_devs={len(jax.devices())} "
      f"local_devs={len(jax.local_devices())}", flush=True)
assert jax.process_count() == nproc
assert jax.process_index() == pid

mesh = Mesh(np.array(jax.devices()), ("x",))
sh = NamedSharding(mesh, P("x"))
g = np.arange(16, dtype=np.int32)
arr = jax.make_array_from_callback((16,), sh, lambda idx: g[idx])
s = jax.jit(jnp.sum)(arr)
val = multihost_utils.process_allgather(s, tiled=True)
print(f"[{pid}] sum={val} (want 120)", flush=True)
assert int(np.asarray(val).ravel()[0]) == 120
print(f"[{pid}] OK", flush=True)
