"""Marginal stage costs of the REAL fused pipeline via cumulative prefixes."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import sample_sort as ss
from radix_sort_tpu.ops import extract

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

N = 1 << 24
W, num_keys = 4, 2
m, K, alpha = 4096, 32, 1.15  # round-1 profile shapes (DEFAULT_M/K removed)
LANES = 128

rng = np.random.default_rng(0)
arrs = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(W)]
sync(arrs)


def pipeline(stop, *ops):
    ops = list(ops)
    N_ = ops[0].shape[0]
    Np = ss._ceil_to(max(N_, 8 * m), 8 * m)
    nchunks = Np // m
    ops = ss._rowsort(ops, m, num_keys)
    if stop == "rowsort1":
        return tuple(ops)
    sw1, sp1 = ss._round1_splitters(ops, num_keys, m, K)
    sw1 = [jnp.broadcast_to(w[None, :], (nchunks, K - 1)) for w in sw1]
    sp1l = sp1[None, :] - (jnp.arange(nchunks, dtype=jnp.int32) * m)[:, None]
    vl1 = jnp.full((nchunks,), m, jnp.int32)
    bounds1 = ss._bucket_ids(ops, num_keys, m, sw1, sp1l, vl1)
    if stop == "bounds1":
        return (*ops, bounds1)
    cap1 = ss._ceil_to(int(alpha * Np / K) + m, max(m, 1024))
    outs1, counts1 = extract.bucket_extract(
        [o.reshape(-1, LANES) for o in ops], bounds1, K=K,
        cap_rows=cap1 // LANES, chunks_per_bucket=nchunks, nbuckets=1)
    if stop == "extract1":
        return (*outs1, counts1)
    ops = [o.reshape(-1) for o in outs1]
    ops = ss._rowsort(ops, m, num_keys)
    if stop == "rowsort2":
        return (*ops, counts1)
    cpb = cap1 // m
    sw2, sp2 = ss._round2_splitters(ops, num_keys, counts1, cap1, K)
    sw2 = [jnp.repeat(w, cpb, axis=0) for w in sw2]
    sp2 = jnp.repeat(sp2, cpb, axis=0)
    cib = jnp.tile(jnp.arange(cpb, dtype=jnp.int32), K)
    vl2 = jnp.clip(jnp.repeat(counts1, cpb) - cib * m, 0, m)
    bounds2 = ss._bucket_ids(ops, num_keys, m, sw2, sp2 - (cib * m)[:, None], vl2)
    if stop == "bounds2":
        return (*ops, bounds2)
    cap2 = ss._ceil_to(int(alpha * Np / (K * K)) + 1024, 1024)
    outs2, counts2 = extract.bucket_extract(
        [o.reshape(-1, LANES) for o in ops], bounds2, K=K,
        cap_rows=cap2 // LANES, chunks_per_bucket=cpb, nbuckets=K)
    if stop == "extract2":
        return (*outs2, counts2)
    ops = [o.reshape(-1) for o in outs2]
    ops = ss._rowsort(ops, cap2, num_keys)
    if stop == "final":
        return (*ops, counts2)
    dense, total = extract.compact_regions(
        [o.reshape(-1, LANES) for o in ops], counts2, cap_rows=cap2 // LANES)
    return tuple(o.reshape(-1)[:N_] for o in dense)


prev = 0.0
for stop in ["rowsort1", "bounds1", "extract1", "rowsort2",
             "bounds2", "extract2", "final", "all"]:
    f = jax.jit(lambda *o, s=stop: pipeline(s, *o))
    t = timed(f, *arrs)
    print(f"up to {stop:10}: {t*1e3:7.1f} ms  (marginal {max(0, t-prev)*1e3:6.1f})", flush=True)
    prev = t
