"""End-to-end correctness + speed of sample_sort_words on TPU."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import sample_sort


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def check(name, N, W, num_keys, seed=0, dist="uniform", **kw):
    rng = np.random.default_rng(seed)
    if dist == "uniform":
        arrs = [rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(W)]
    elif dist == "dup":  # duplicate-heavy
        arrs = [rng.integers(0, 4, N).astype(np.uint32) for _ in range(num_keys)] + [
            rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(W - num_keys)
        ]
    elif dist == "sorted":
        arrs = [np.sort(rng.integers(0, 2**32, N, dtype=np.uint32))] + [
            rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(W - 1)
        ]
    elif dist == "const":
        arrs = [np.full(N, 7, np.uint32) for _ in range(num_keys)] + [
            np.arange(N, dtype=np.uint32) for _ in range(W - num_keys)
        ]
    f = jax.jit(
        lambda *o: sample_sort.sample_sort_words(list(o), num_keys, **kw)
    )
    out = sync(f(*[jnp.asarray(a) for a in arrs]))
    out = [np.asarray(o) for o in out]
    # oracle: stable lexsort by key words (np.lexsort uses last key as primary)
    perm = np.lexsort(tuple(reversed([arrs[i] for i in range(num_keys)])))
    ok = True
    for w in range(W):
        ref = arrs[w][perm]
        if not np.array_equal(out[w], ref):
            bad = np.nonzero(out[w] != ref)[0][:5]
            print(f"  MISMATCH op{w} at {bad}: got {out[w][bad]} want {ref[bad]}")
            ok = False
    print(f"[{'OK' if ok else 'FAIL'}] {name}")
    return ok


ok = True
ok &= check("1op uniform 128K", 1 << 17, 1, 1, m=1024, K=16)
ok &= check("2op uniform 128K", 1 << 17, 2, 1, m=1024, K=16)
ok &= check("4op 2key uniform 128K", 1 << 17, 4, 2, m=1024, K=16)
ok &= check("2op dup-heavy", 1 << 17, 2, 1, m=1024, K=16, dist="dup")
ok &= check("2op const keys", 1 << 17, 2, 1, m=1024, K=16, dist="const")
ok &= check("2op sorted input", 1 << 17, 2, 1, m=1024, K=16, dist="sorted")
ok &= check("2op odd N", (1 << 17) - 777, 2, 1, m=1024, K=16)
print("ALL OK" if ok else "FAILURES", flush=True)

if ok:
    # speed: flagship config
    N = 1 << 24
    rng = np.random.default_rng(0)
    arrs = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(4)]
    f = jax.jit(lambda *o: sample_sort.sample_sort_words(list(o), 2))
    sync(f(*arrs))
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(*arrs))
        print(f"u64-pairs 16M: {(time.perf_counter()-t0)*1e3:.1f} ms")
