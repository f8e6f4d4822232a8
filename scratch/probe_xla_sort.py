"""Probe XLA-level building blocks for the production sort design.

E1: batched row sort cost vs row length (log^2 m scaling)
E2: vmapped dynamic_slice bucket extraction (R,K,C)
E3: sequential dynamic_update_slice compaction
E4: lax.sort operand-count scaling
E7: batched take_along_axis (within-row permutation apply)
E8: transpose (R,K,C)->(K,R,C) cost
"""
import time, sys
import jax, jax.numpy as jnp, numpy as np

N = 1 << 24


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


def report(name, t, n=N):
    print(f"{name}: {t*1e3:8.2f} ms  {n/t/1e6:9.1f} M/s")
    sys.stdout.flush()


key = jax.random.PRNGKey(0)
x = jax.random.bits(key, (N,), jnp.uint32)

# E1: batched row sorts
for m in (1024, 4096, 65536, 1 << 20):
    f = jax.jit(lambda x, m=m: jax.lax.sort(x.reshape(-1, m), dimension=1))
    report(f"E1 rowsort m={m:>7}", timed(f, x))

# E1b: batched row sort with 4 operands (pairs as limbs), 2 keys
ops4 = tuple(jax.random.bits(jax.random.PRNGKey(i), (N,), jnp.uint32) for i in range(4))
for m in (4096, 65536):
    f = jax.jit(
        lambda a, b, c, d, m=m: jax.lax.sort(
            [a.reshape(-1, m), b.reshape(-1, m), c.reshape(-1, m), d.reshape(-1, m)],
            dimension=1, num_keys=2, is_stable=True,
        )
    )
    report(f"E1b rowsort4 m={m:>6}", timed(f, *ops4))

# E4: operand scaling, full 1-D sort
for k in (1, 2, 3, 4):
    f = jax.jit(
        lambda *a: jax.lax.sort(list(a), dimension=0, num_keys=1, is_stable=True)
    )
    report(f"E4 sort ops={k}", timed(f, *ops4[:k]))

# E7: batched take_along_axis within rows
for m in (1024, 65536):
    R = N // m
    idx = jax.random.randint(jax.random.PRNGKey(2), (R, m), 0, m, jnp.int32)
    f = jax.jit(lambda x, i, m=m: jnp.take_along_axis(x.reshape(-1, m), i, axis=1))
    report(f"E7 rowgather m={m:>6}", timed(f, x, idx))

# E2: vmapped dynamic_slice extraction (R, K, C) from padded rows
R, K, C = 256, 64, 2048  # m = 65536 per row, C = 2*m/K
xr = x.reshape(R, N // R)
starts = jax.random.randint(jax.random.PRNGKey(3), (R, K), 0, N // R - C, jnp.int32)


def extract(xr, starts):
    def per_row(row, st):
        return jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(row, s, C))(st)
    return jax.vmap(per_row)(xr, starts)


f = jax.jit(extract)
report(f"E2 extract RKC={R}x{K}x{C}", timed(f, xr, starts), n=R * K * C)

# E8: transpose (R,K,C) -> (K,R,C)
buf = extract(xr, starts)
f = jax.jit(lambda b: jnp.swapaxes(b, 0, 1).reshape(K, R * C))
report("E8 transpose RKC", timed(f, buf), n=R * K * C)

# E3: sequential compaction via dynamic_update_slice
KB = 64
bucket_len = N // KB
bufs = x.reshape(KB, bucket_len)
offs = (jnp.arange(KB, dtype=jnp.int32) * bucket_len)


def compact(bufs, offs):
    out = jnp.zeros((N + bucket_len,), jnp.uint32)
    def body(k, out):
        return jax.lax.dynamic_update_slice(out, bufs[k], (offs[k],))
    return jax.lax.fori_loop(0, KB, body, out)[:N]


f = jax.jit(compact)
report(f"E3 compact K={KB}", timed(f, bufs, offs))

# E5: histogram via segment/one-hot on 16M
f = jax.jit(lambda x: jnp.zeros((256,), jnp.int32).at[(x >> 24).astype(jnp.int32)].add(1))
report("E5 scatter-add hist", timed(f, x))
