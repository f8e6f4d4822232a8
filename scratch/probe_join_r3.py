"""Round-3: end-to-end hash_join at mid/high fanout with the
software-pipelined expand kernel and the lowered fanout-16 gate.
Packed one-buffer I/O; min-of-3 wall clock."""

from __future__ import annotations

import sys, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import query as Q
from radix_sort_tpu.utils.timing import sync

CAP = 1 << 24


def timeit(fn, *args, runs=3):
    sync(fn(*args))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_case(n_left, n_right, seed=0):
    rng = np.random.default_rng(seed)
    lk = rng.permutation(n_left).astype(np.uint32)
    rk = rng.permutation(
        np.arange(n_right, dtype=np.uint32) % n_left
    ).astype(np.uint32)
    lv = np.arange(n_left, dtype=np.uint32)
    rv = np.arange(n_right, dtype=np.uint32)
    return jnp.asarray(np.stack([lk, lv])), jnp.asarray(np.stack([rk, rv]))


@jax.jit
def full_join(pl, pr):
    ok, olv, orv, cnt, ovf = Q.hash_join(
        pl[0], pl[1], pr[0], pr[1], capacity=CAP
    )
    return jnp.stack([ok, olv, orv]), cnt, ovf


def main():
    for name, n_l, n_r in [
        ("fanout=16   1Mx16M", 1 << 20, 1 << 24),
        ("fanout=64 256Kx16M", 1 << 18, 1 << 24),
        ("fanout=256 64Kx16M", 1 << 16, 1 << 24),
    ]:
        pl, pr = make_case(n_l, n_r)
        t_full = timeit(full_join, pl, pr)
        out, cnt, ovf = sync(full_join(pl, pr))
        print(
            f"{name}: full={t_full*1e3:8.1f} ms  cnt={int(cnt):,} "
            f"ovf={bool(ovf)}  ({t_full/CAP*1e9:.2f} ns/out-pair)",
            flush=True,
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
