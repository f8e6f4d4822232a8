"""Round-3 probe: expand_join_runs per-run cost across fanouts.

Amortized protocol (NOTES.md): fori_loop inside one jit, dependency
chained through the full output array (orv feeds the next iteration's
rvs). Baseline (round-2 kernel, from NOTES): ~456 ns/run at fanout 16,
~1.0 us/run at fanout 256.
"""

import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import expand

N_OUT = 1 << 24


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


def probe(fanout, k1=2, k2=8):
    n_l = N_OUT // fanout
    rng = np.random.default_rng(0)
    lo = np.arange(n_l, dtype=np.int32) * fanout
    desc = np.stack(
        [
            rng.integers(0, 2**31, n_l).astype(np.int32),
            np.arange(n_l, dtype=np.int32),
            lo,
            np.full(n_l, fanout, np.int32),
            np.full(n_l, fanout, np.int32),
            np.zeros(n_l, np.int32),
            np.zeros(n_l, np.int32),
            np.zeros(n_l, np.int32),
        ],
        axis=1,
    )
    rvs = rng.integers(0, 2**32, N_OUT, dtype=np.uint32)

    def mk(k):
        @jax.jit
        def f(rv, d):
            def body(i, st):
                rv_i, dd = st
                ok, ol, orv, cnt = expand.expand_join_runs(
                    rv_i, dd, capacity=N_OUT
                )
                return (orv, dd)

            return jax.lax.fori_loop(0, k, body, (rv, d))

        return lambda: f(jnp.asarray(rvs), jnp.asarray(desc))

    f1, f2 = mk(k1), mk(k2)
    sync(f1()); sync(f2())
    dt = (tmin(f2) - tmin(f1)) / (k2 - k1)
    print(
        f"expand fanout={fanout:4d}: {dt*1e3:8.2f} ms "
        f"({dt/n_l*1e9:7.1f} ns/run, {dt/N_OUT*1e9:5.2f} ns/elem)",
        flush=True,
    )


which = [int(x) for x in sys.argv[1:]] or [16, 64, 256]
for f in which:
    probe(f)
print("done", flush=True)
