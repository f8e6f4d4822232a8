"""Probe: where does hash_join time go at high fanout?

NOTES.md open item 1: the expansion does ~5 plain gathers x capacity
(~10 ns/elem); a run-structured expansion pays off only for high-fanout
joins — measure a fanout-heavy case first.

Cases (all capacity = 16M output pairs, packed one-buffer I/O):
  A. 16M x 16M, 1:1 keys (fanout 1)        — merge_rank dominated
  B. 1M left x 16M right, fanout 16
  C. 64K left x 16M right, fanout 256
Phases, separately jitted:
  probes  = encode + build-sort + 2 merge_rank over left
  expand  = the t/merge_rank(starts)/gather block over capacity
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu import keys as K
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
    # pack: one device buffer in
    packed_l = jnp.asarray(np.stack([lk, lv]))
    packed_r = jnp.asarray(np.stack([rk, rv]))
    return packed_l, packed_r


@jax.jit
def full_join(pl, pr):
    ok, olv, orv, cnt, ovf = Q.hash_join(
        pl[0], pl[1], pr[0], pr[1], capacity=CAP
    )
    return jnp.stack([ok, olv, orv]), cnt, ovf


@jax.jit
def probes_only(pl, pr):
    lk = K.encode(pl[0])
    rk = K.encode(pr[0])
    rks, rvs = jax.lax.sort([rk, pr[1]], num_keys=1, is_stable=True)
    lo = Q.merge_rank(rks, lk, side="left")
    hi = Q.merge_rank(rks, lk, side="right")
    return lo + hi, rvs


@jax.jit
def expand_only(pl, lo_hi_rvs):
    # reuse precomputed lo/hi/rvs; time just the expansion block
    lo, hi, rvs = lo_hi_rvs
    lk = K.encode(pl[0])
    matches = hi - lo
    starts = jnp.cumsum(matches) - matches
    total = starts[-1] + matches[-1]
    t = jnp.arange(CAP, dtype=jnp.int32)
    i = Q.merge_rank(starts, t, side="right") - 1
    i = jnp.clip(i, 0, lk.shape[0] - 1)
    j = t - starts[i]
    valid = t < total
    ridx = jnp.clip(lo[i] + j, 0, rvs.shape[0] - 1)
    out_keys = jnp.where(valid, lk[i], 0)
    out_lv = jnp.where(valid, pl[1][i], 0)
    out_rv = jnp.where(valid, rvs[ridx], 0)
    return jnp.stack([out_keys, out_lv, out_rv])


@jax.jit
def precompute(pl, pr):
    lk = K.encode(pl[0])
    rk = K.encode(pr[0])
    rks, rvs = jax.lax.sort([rk, pr[1]], num_keys=1, is_stable=True)
    lo = Q.merge_rank(rks, lk, side="left")
    hi = Q.merge_rank(rks, lk, side="right")
    return lo, hi, rvs


def main():
    for name, n_l, n_r in [
        ("A fanout=1   16Mx16M", 1 << 24, 1 << 24),
        ("B fanout=16   1Mx16M", 1 << 20, 1 << 24),
        ("C fanout=256 64Kx16M", 1 << 16, 1 << 24),
    ]:
        pl, pr = make_case(n_l, n_r)
        t_full = timeit(full_join, pl, pr)
        t_probe = timeit(probes_only, pl, pr)
        pre = sync(precompute(pl, pr))
        t_exp = timeit(expand_only, pl, pre)
        print(
            f"{name}: full={t_full*1e3:8.1f} ms  probes={t_probe*1e3:8.1f} ms"
            f"  expand={t_exp*1e3:8.1f} ms"
            f"  ({t_exp/CAP*1e9:.2f} ns/out-pair)"
        )


if __name__ == "__main__":
    main()
