"""Round-2 design probes: price the surrogate-grouping pipeline pieces.

Amortized timing protocol (scratch/NOTES.md): loop the op inside ONE jit via
lax.fori_loop with a real data dependency chained through full arrays; time
min-of-3 at two loop counts with a wide spread and report the per-iteration
difference.
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import extract

LANES = 128
N = 1 << 24
rng = np.random.default_rng(0)


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:] if leaf.ndim else leaf)
    return o


def tmin(f, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def amortized(name, mk_loop, k1=2, k2=10):
    f1, f2 = mk_loop(k1), mk_loop(k2)
    sync(f1()); sync(f2())  # compile
    ms = (tmin(f2) - tmin(f1)) / (k2 - k1) * 1e3
    print(f"{name}: {ms:8.2f} ms", flush=True)
    return ms


OPS4 = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(4)]
SRC = jnp.asarray(
    np.argsort(rng.integers(0, 2**32, N, dtype=np.uint32).reshape(-1, 1024), axis=1,
               kind="stable").astype(np.int32).reshape(-1))


def loop_ops(body, ops, k):
    # ops must be jit ARGUMENTS: closed-over arrays get baked into the HLO
    # as constants and blow the axon remote-compile request limit (HTTP 413)
    @jax.jit
    def f(*o):
        return jax.lax.fori_loop(0, k, lambda i, oo: body(oo, i), list(o))
    return lambda: f(*ops)


probes = []

# --- 1. rowsort 1op (surrogate sort candidate) at several m
for m in (1024, 4096, 16384):
    probes.append((
        f"rowsort 1op m={m}",
        lambda k, m=m: loop_ops(
            lambda o, i: [jax.lax.sort([o[0].reshape(-1, m)], dimension=1,
                                       num_keys=1, is_stable=True)[0].reshape(-1)],
            OPS4[:1], k)))

# --- 2. multi-op rowsorts (current pipeline + final-sort candidates)
for (W, nk, m) in ((2, 1, 1024), (4, 2, 1024), (4, 2, 2048), (4, 2, 4608)):
    Nn = (N // m) * m
    probes.append((
        f"rowsort {W}op{nk}key m={m}",
        lambda k, W=W, nk=nk, m=m, Nn=Nn: loop_ops(
            lambda o, i: [x.reshape(-1) for x in jax.lax.sort(
                [y.reshape(-1, m) for y in o], dimension=1, num_keys=nk,
                is_stable=True)],
            [o[:Nn] for o in OPS4[:W]], k)))

# --- 3. apply_perm_chunks probe removed with ops/permute.py (orphan
# kernel of the abandoned surrogate-rowsort design, deleted round 3)

# --- 4. bid compute: composite (2-word key) lexge-sums, K-1 splitters
def bid_body(Ksp):
    hi_s = jnp.asarray(rng.integers(0, 2**32, Ksp, dtype=np.uint32))
    lo_s = jnp.asarray(rng.integers(0, 2**32, Ksp, dtype=np.uint32))

    def body(o, i):
        hi, lo = o[0], o[1]
        bid = jnp.zeros(hi.shape, jnp.uint32)
        for t in range(Ksp):
            ge = (hi > hi_s[t]) | ((hi == hi_s[t]) & (lo >= lo_s[t]))
            bid = bid + ge.astype(jnp.uint32)
        return [o[0] ^ (bid & 0x7), o[1]]

    return body

for Ksp in (15, 63):
    probes.append((f"bid {Ksp} splitters 2word",
                   lambda k, Ksp=Ksp: loop_ops(bid_body(Ksp), OPS4[:2], k)))

# --- 5. bucket_extract at several (m, K)
def extract_probe(m, K):
    nchunks = N // m
    step = m // K
    b = np.zeros((nchunks, K + 1), np.int32)
    for t in range(K + 1):
        b[:, t] = min(t * step, m)
    b[:, K] = m
    bounds = jnp.asarray(b)
    cap_elems = ((int(1.15 * N / K) + m) // 1024 + 1) * 1024
    cap_rows = cap_elems // LANES

    def body(o, i):
        outs, counts = extract.bucket_extract(
            [x.reshape(-1, LANES) for x in o], bounds, K=K,
            cap_rows=cap_rows, chunks_per_bucket=nchunks, nbuckets=1)
        return [x.reshape(-1)[:N] for x in outs]

    return lambda k: loop_ops(body, OPS4, k)

for (m, K) in ((16384, 64), (16384, 16), (1024, 16), (2048, 16), (4096, 16),
               (1024, 64), (4096, 64)):
    probes.append((f"extract m={m} K={K}", extract_probe(m, K)))

which = sys.argv[1:] if len(sys.argv) > 1 else None
for name, mk in probes:
    if which and not any(w in name for w in which):
        continue
    try:
        if "extract" in name:
            amortized(name, mk, k1=1, k2=5)
        else:
            amortized(name, mk)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
print("done", flush=True)
