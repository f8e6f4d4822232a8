"""Amortized multi-operand rowsort costs (the local-sort engine decision)."""
import time, sys
import jax, jax.numpy as jnp, numpy as np

N = 1 << 24
ITERS = 8


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def timed(f, *args, reps=3):
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


ops = tuple(jax.random.bits(jax.random.PRNGKey(i), (N,), jnp.uint32) for i in range(4))
floor = timed(jax.jit(lambda x: x[:8] + 1), ops[0])
print(f"floor {floor*1e3:.1f} ms"); sys.stdout.flush()


def bench(name, nops, nkeys, m):
    def step(args):
        rs = [a.reshape(-1, m) for a in args]
        out = jax.lax.sort(rs, dimension=1, num_keys=nkeys, is_stable=True)
        return tuple(o.reshape(-1) for o in out)

    def loop(*args):
        return jax.lax.fori_loop(0, ITERS, lambda i, a: step(a), args)

    t = (timed(jax.jit(loop), *ops[:nops]) - floor) / ITERS
    print(f"{name}: {t*1e3:8.2f} ms  {N/t/1e6:8.1f} M/s")
    sys.stdout.flush()


for m in (1024, 4096):
    bench(f"rowsort 2op 1key m={m}", 2, 1, m)
    bench(f"rowsort 4op 1key m={m}", 4, 1, m)
    bench(f"rowsort 4op 2key m={m}", 4, 2, m)
bench("fullsort 4op 2key     ", 4, 2, N)
bench("fullsort 2op 1key     ", 2, 1, N)
