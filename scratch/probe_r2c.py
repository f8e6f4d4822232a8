"""Round-2 probe c: extract with dyadic tiers at candidate (m, K), plus the
m=4096 multi-op rowsort. Amortized protocol per scratch/NOTES.md."""
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


def amortized(name, mk_loop, k1=1, k2=5):
    f1, f2 = mk_loop(k1), mk_loop(k2)
    sync(f1()); sync(f2())
    ms = (tmin(f2) - tmin(f1)) / (k2 - k1) * 1e3
    print(f"{name}: {ms:8.2f} ms", flush=True)
    return ms


OPS4 = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(4)]


def loop_ops(body, ops, k):
    @jax.jit
    def f(*o):
        return jax.lax.fori_loop(0, k, lambda i, oo: body(oo, i), list(o))
    return lambda: f(*ops)


def extract_probe(m, K):
    nchunks = N // m
    # balanced bounds with +-25% jitter (realistic run-length spread)
    step = m // K
    cuts = np.arange(1, K) * step
    b = np.zeros((nchunks, K + 1), np.int32)
    jit_amp = max(step // 4, 1)
    for c in range(nchunks):
        j = rng.integers(-jit_amp, jit_amp + 1, K - 1)
        cc = np.clip(np.sort(cuts + j), 0, m)
        b[c, 1:K] = cc
        b[c, K] = m
    bounds = jnp.asarray(b)
    cap_elems = ((int(1.3 * N / K) + m) // 1024 + 1) * 1024
    cap_rows = cap_elems // LANES

    def body(o, i):
        outs, counts = extract.bucket_extract(
            [x.reshape(-1, LANES) for x in o], bounds, K=K,
            cap_rows=cap_rows, chunks_per_bucket=nchunks, nbuckets=1)
        return [x.reshape(-1)[:N] for x in outs]

    return lambda k: loop_ops(body, OPS4, k)


probes = []
for (m, K) in ((2048, 16), (4096, 16), (4096, 64), (4096, 96), (4096, 128),
               (2048, 96), (16384, 16), (16384, 64), (8192, 96)):
    probes.append((f"extract m={m} K={K}", extract_probe(m, K)))

for m in (4096, 2048):
    Nn = (N // m) * m
    probes.append((
        f"rowsort 4op2key m={m}",
        lambda k, m=m, Nn=Nn: loop_ops(
            lambda o, i: [x.reshape(-1) for x in jax.lax.sort(
                [y.reshape(-1, m) for y in o], dimension=1, num_keys=2,
                is_stable=True)],
            [o[:Nn] for o in OPS4], k)))

which = sys.argv[1:] if len(sys.argv) > 1 else None
for name, mk in probes:
    if which and not any(w in name for w in which):
        continue
    try:
        amortized(name, mk)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
print("done", flush=True)
