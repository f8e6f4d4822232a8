"""Round-5: band-join datapoints at 16M rows (BASELINE.md row).

Workloads (packed I/O, donated, host-fetch sync):
  1. tier lookup: 16M fact rows, equi key (1K groups) + BETWEEN over
     2 intervals/key (fanout 1) — the canonical band-join shape.
  2. pure theta semi: 16M left, 1K right, l.x < r.y, how="semi"
     (match counts only, no expansion).
  3. theta inner, bounded: 1M left x 1K right thresholds, capacity 16M
     (fanout ~16 expansion through join_expand).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scratch/probe_band_r5.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu.ops import query as Q
from radix_sort_tpu.utils.timing import sync

RUNS = 3
N = 1 << 24


def timed(name, fn, *args):
    f = jax.jit(fn)
    sync(f(*args))
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    m = float(np.mean(ts))
    print(f"{name:34s} {m*1e3:9.1f} ms   ({[f'{t*1e3:.0f}' for t in ts]})",
          flush=True)
    return m


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # 1. equi + between, fanout 1 (tier lookup)
    nk = 1024
    lk = rng.integers(0, nk, N).astype(np.uint32)
    lx = rng.integers(0, 1000, N).astype(np.int32)
    rk = np.arange(nk, dtype=np.uint32).repeat(2)
    rlo = np.tile(np.array([0, 500], np.int32), nk)
    rhi = np.tile(np.array([499, 999], np.int32), nk)
    rv = np.arange(2 * nk, dtype=np.uint32)
    packed_l = jnp.stack([jnp.asarray(lk),
                          jnp.asarray(lx).view(np.uint32)])
    lv = jnp.arange(N, dtype=jnp.uint32)

    def between(pl, lv):
        jl, jr, cnt, ovf = Q.band_join(
            pl[1].view(jnp.int32), lv,
            (jnp.asarray(rlo), jnp.asarray(rhi)), jnp.asarray(rv),
            op="between", capacity=N + (1 << 20),
            left_equi=[pl[0]], right_equi=[jnp.asarray(rk)])
        return jnp.stack([jl, jr[: jl.shape[0]]]), cnt, ovf

    m = timed("equi+between 16M fanout1", between, packed_l, lv)
    print(f"  -> {N/m/1e6:.1f} M rows/s", flush=True)

    # 2. pure theta semi (16M x 1K)
    ry = rng.integers(0, 1000, 1024).astype(np.int32)

    def theta_semi(pl, lv):
        jl, _, cnt, ovf = Q.band_join(
            pl[1].view(jnp.int32), lv, jnp.asarray(ry),
            jnp.zeros((1024,), jnp.uint32),
            op="lt", capacity=N, how="semi")
        return jl, cnt, ovf

    m = timed("theta lt semi 16Mx1K", theta_semi, packed_l, lv)
    print(f"  -> {N/m/1e6:.1f} M rows/s", flush=True)

    # 3. theta inner 1M x 1K, capacity 16M (expansion-bound)
    n1 = 1 << 20
    lx1 = rng.integers(0, 64, n1).astype(np.int32)  # ~16 matches/row
    ry1 = np.sort(rng.integers(0, 64, 1024).astype(np.int32))

    def theta_inner(lx1d, lv1):
        jl, jr, cnt, ovf = Q.band_join(
            lx1d, lv1, jnp.asarray(ry1),
            jnp.arange(1024, dtype=jnp.uint32),
            op="lt", capacity=N, how="inner")
        return jnp.stack([jl, jr]), cnt, ovf

    m = timed("theta lt inner 1Mx1K cap16M",
              theta_inner, jnp.asarray(lx1), jnp.arange(n1, dtype=jnp.uint32))
    out = jax.jit(theta_inner)(jnp.asarray(lx1),
                               jnp.arange(n1, dtype=jnp.uint32))
    pairs = int(np.asarray(out[1]))
    print(f"  -> {pairs/1e6:.1f}M pairs, {pairs/m/1e6:.1f} M pairs/s",
          flush=True)


if __name__ == "__main__":
    main()
