"""Amortized probes: run each primitive ITERS times inside one jit, chained
through the FULL output array (so DCE can't strip the work), subtract floor.
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np

N = 1 << 24
ITERS = 8


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf.reshape(-1)[-1:])
    return out


def timed(f, *args, reps=3):
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


key = jax.random.PRNGKey(0)
x = jax.random.bits(key, (N,), jnp.uint32)

floor = timed(jax.jit(lambda x: x[:8] + 1), x)
print(f"dispatch floor: {floor*1e3:.2f} ms")
sys.stdout.flush()


def bench(name, step, n=N):
    """step: uint32[N] -> uint32[N] (full-array data dependency)."""
    def loop(x):
        return jax.lax.fori_loop(0, ITERS, lambda i, a: step(a), x)
    t = (timed(jax.jit(loop), x) - floor) / ITERS
    print(f"{name}: {t*1e3:8.2f} ms  {n/t/1e6:8.1f} M/s  {n*4*2/t/1e9:6.1f} GB/s(r+w)")
    sys.stdout.flush()


bench("copy x+1        ", lambda x: x + 1)
R, K, C = 256, 128, 512  # R*K*C = 16M
bench("transpose RKC   ", lambda x: jnp.swapaxes(x.reshape(R, K, C), 0, 1).reshape(-1))
for m in (1024, 4096, 65536):
    bench(f"rowsort m={m:>6}", lambda x, m=m: jax.lax.sort(x.reshape(-1, m), dimension=1).reshape(-1))
bench("fullsort        ", lambda x: jax.lax.sort(x, dimension=0))
idx = jax.random.randint(jax.random.PRNGKey(2), (N // 1024, 1024), 0, 1024, jnp.int32)
bench("rowgather m=1024", lambda x: jnp.take_along_axis(x.reshape(-1, 1024), idx, axis=1).reshape(-1))
# histogram: result (256,) -> broadcast-xor into x to keep dependency
def hist_dep(x):
    h = jnp.zeros((256,), jnp.uint32).at[(x >> 24).astype(jnp.int32)].add(1)
    return x ^ h[0]
bench("hist scatter-add", hist_dep)
def hist_cmp(x):
    d = (x >> 24).astype(jnp.int32).reshape(-1, 128)
    bins = jnp.arange(256, dtype=jnp.int32)
    h = (d[:, :, None] == bins[None, None, :]).astype(jnp.int32).sum((0, 1))
    return x ^ h[0].astype(jnp.uint32)
bench("hist one-hot    ", hist_cmp)
bench("cumsum N        ", lambda x: jnp.cumsum(x))
KB = 64
def compact(x):
    bufs = x.reshape(KB, N // KB)
    out = jnp.zeros((N,), jnp.uint32)
    def body(k, out):
        return jax.lax.dynamic_update_slice(out, bufs[k], (k * (N // KB),))
    return jax.lax.fori_loop(0, KB, body, out)
bench("compact DUS K=64", compact)
# vmapped dynamic-slice extraction at matched size
starts = jax.random.randint(jax.random.PRNGKey(3), (R, K), 0, N // R - C, jnp.int32)
def extract(x):
    xr = x.reshape(R, N // R)
    def per_row(row, st):
        return jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(row, s, C))(st)
    return jax.vmap(per_row)(xr, starts).reshape(-1)
bench("extract RKC     ", extract)
