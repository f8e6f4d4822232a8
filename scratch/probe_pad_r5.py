"""Round-5 probe: the pad-to-power-of-two ripple lever (VERDICT item 3).

At the 1.5 GB sweep point (93.75M u64-pair rows) lax.sort pads to 2^27 =
134.2M rows (~43% pad). Candidate: split into 64M + 29.75M, sort each
(pads 67.1M + 33.6M = 7.4% total), then merge. The merge floor is a
splitter partition (run-structured appends) + a batched leaf rowsort.

Measures, single-call packed+donated exactly like bench.py (each call
pays the relay's ~29 ms dispatch charge; the split path fused in one jit
would pay one, so phase sums are charged once):

  A  whole sort at 93.75M           (the current 1.5 GB row, ~0.82 s)
  B1 sort at 64M                    (pads to 67.1M)
  B2 sort at 29.75M                 (pads to 33.6M)
  C  batched rowsort (n/4096, 4096) (the merge's leaf re-sort)
  D  whole sort at 2^26 exactly     (pad-free anchor for the cost model)

Decision rule: if B1+B2+C >= 0.9*A the lever is dead before counting the
partition kernel (>=50 ms more); close it in BASELINE.md with these
numbers. Run: PYTHONPATH=/root/repo:$PYTHONPATH python scratch/probe_pad_r5.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu.ops import pallas_sort
from radix_sort_tpu.utils.timing import sync

RUNS = 3


def gen(key, n):
    khi, klo = jax.random.split(key)
    hi = jax.random.bits(khi, (n,), jnp.uint32)
    lo = jax.random.bits(klo, (n,), jnp.uint32)
    z = jnp.zeros((2, n), jnp.uint32)
    return jnp.concatenate([hi[None], lo[None], z])


def timeit(name, fn, make_data):
    key = jax.random.PRNGKey(0)
    sync(fn(make_data(key)))  # compile + warmup
    ts = []
    for r in range(RUNS):
        key, sub = jax.random.split(key)
        d = sync(make_data(sub))
        t0 = time.perf_counter()
        sync(fn(d))
        ts.append(time.perf_counter() - t0)
    m = float(np.mean(ts))
    print(f"{name:28s} {m:7.3f} s  (runs {['%.3f' % t for t in ts]})",
          flush=True)
    return m


def full_sort(p):
    out = pallas_sort.sort_pairs_limbs(p[0], p[1], p[2], p[3],
                                       engine="comparator")
    return jnp.stack(out)


def row_sort(p):
    # batched 4-op 2-key sort over rows of 4096 (the merge leaf)
    out = jax.lax.sort([p[0], p[1], p[2], p[3]], dimension=1,
                       num_keys=2, is_stable=True)
    return jnp.stack(out)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n_whole = 93_750_000           # the 1.5 GB sweep point
    n_b1, n_b2 = 64 * 1024 * 1024, n_whole - 64 * 1024 * 1024

    jf = jax.jit(full_sort, donate_argnums=0)
    a = timeit("A  whole 93.75M", jf, lambda k: gen(k, n_whole))
    d = timeit("D  whole 2^26", jf, lambda k: gen(k, 1 << 26))
    b1 = timeit("B1 sort 64M", jf, lambda k: gen(k, n_b1))
    b2 = timeit(f"B2 sort {n_b2/1e6:.2f}M", jf, lambda k: gen(k, n_b2))

    m = 4096
    rows = n_whole // m  # 22888 full rows ~ 93.7M
    jr = jax.jit(row_sort, donate_argnums=0)
    c = timeit("C  rowsort m=4096", jr,
               lambda k: gen(k, rows * m).reshape(4, rows, m))

    split = b1 + b2 + c
    print(f"\nwhole A        = {a:.3f} s")
    print(f"split B1+B2+C  = {split:.3f} s ({split/a:.2f}x of A; "
          f"partition kernel still unpaid)")
    print(f"pad-free anchor D(2^26)={d:.3f}s -> per-elem "
          f"{d/ (1<<26) *1e9:.2f} ns")
    verdict = ("DEAD (close it)" if split >= 0.9 * a
               else "LIVE (wire partition next)")
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
