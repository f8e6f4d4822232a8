"""Standalone correctness check of bucket_extract + compact_regions."""
import sys
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import extract


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def ref_extract(ops_np, bounds, K, cap_rows, chunks_per_bucket, nbuckets):
    """numpy oracle: per bucket-region, concatenation of its runs."""
    cr = ops_np[0].size // (bounds.shape[0] * 128)
    chunk = cr * 128
    regions = [[[] for _ in range(K)] for _ in range(nbuckets)]
    for c in range(bounds.shape[0]):
        b = c // chunks_per_bucket
        base = c * chunk
        for d in range(K):
            lo, hi = bounds[c, d], bounds[c, d + 1]
            regions[b][d].append((base + lo, base + hi))
    out = []
    for w, x in enumerate(ops_np):
        xf = x.reshape(-1)
        per = np.full((nbuckets * K, cap_rows * 128), 0xFFFFFFFF, np.uint32)
        cnts = np.zeros(nbuckets * K, np.int32)
        for b in range(nbuckets):
            for d in range(K):
                runs = [xf[lo:hi] for lo, hi in regions[b][d]]
                v = np.concatenate(runs) if runs else np.zeros(0, np.uint32)
                per[b * K + d, : len(v)] = v
                cnts[b * K + d] = len(v)
        out.append(per)
    return out, cnts


def run_case(name, N, cr, K, chunks_per_bucket, nbuckets, num_ops, seed=0):
    rng = np.random.default_rng(seed)
    chunk = cr * 128
    nchunks = chunks_per_bucket * nbuckets
    assert N == nchunks * chunk
    ops_np = [rng.integers(0, 2**32 - 2, N, dtype=np.uint32) for _ in range(num_ops)]
    # random non-decreasing bounds per chunk, ending at a random valid len
    bounds = np.zeros((nchunks, K + 1), np.int32)
    for c in range(nchunks):
        valid = rng.integers(0, chunk + 1)
        cuts = np.sort(rng.integers(0, valid + 1, K - 1)) if K > 1 else np.zeros(0, int)
        bounds[c] = np.concatenate([[0], cuts, [valid]])
    cap_rows = ((chunks_per_bucket * chunk // K * 3 // 2 + chunk) // 128 // 8 + 2) * 8

    outs = [jnp.asarray(x).reshape(-1, 128) for x in ops_np]
    per_op, counts = sync(
        jax.jit(
            lambda ops, b: extract.bucket_extract(
                list(ops), b, K=K, cap_rows=cap_rows,
                chunks_per_bucket=chunks_per_bucket, nbuckets=nbuckets,
            )
        )((*outs,), jnp.asarray(bounds))
    )
    ref_ops, ref_cnts = ref_extract(ops_np, bounds, K, cap_rows, chunks_per_bucket, nbuckets)
    cnts = np.asarray(counts)
    ok_c = np.array_equal(cnts, ref_cnts)
    ok = ok_c
    for w in range(num_ops):
        got = np.asarray(per_op[w]).reshape(nbuckets * K, cap_rows * 128)
        for r in range(nbuckets * K):
            n = ref_cnts[r]
            if not np.array_equal(got[r, :n], ref_ops[w][r, :n]):
                bad = np.nonzero(got[r, :n] != ref_ops[w][r, :n])[0][:5]
                print(f"  MISMATCH op{w} region{r} n={n} at {bad} got={got[r,bad]} want={ref_ops[w][r,bad]}")
                ok = False
                break
        if not ok:
            break
    print(f"[{'OK' if ok else 'FAIL'}] {name} counts_ok={ok_c}")
    return ok


ok = True
ok &= run_case("small k4", N=8 * 1024, cr=8, K=4, chunks_per_bucket=8, nbuckets=1, num_ops=1)
ok &= run_case("2ops 2buckets", N=16 * 1024, cr=8, K=4, chunks_per_bucket=8, nbuckets=2, num_ops=2)
ok &= run_case("cr32 K16", N=64 * 4096, cr=32, K=16, chunks_per_bucket=16, nbuckets=4, num_ops=2)
ok &= run_case("4ops K64", N=64 * 4096, cr=32, K=64, chunks_per_bucket=32, nbuckets=2, num_ops=4)

# compactor
rng = np.random.default_rng(1)
nreg, cap_rows = 64, 16
x = rng.integers(0, 2**32 - 2, nreg * cap_rows * 128, dtype=np.uint32)
cnt = rng.integers(0, cap_rows * 128 + 1, nreg).astype(np.int32)
douts, total = sync(
    jax.jit(
        lambda o, c: extract.compact_regions([o], c, cap_rows=cap_rows)
    )(jnp.asarray(x).reshape(-1, 128), jnp.asarray(cnt))
)
got = np.asarray(douts[0]).reshape(-1)
refc = np.concatenate([x[r * cap_rows * 128 : r * cap_rows * 128 + cnt[r]] for r in range(nreg)])
tot = int(np.asarray(total)[0])
okc = tot == len(refc) and np.array_equal(got[: len(refc)], refc)
print(f"[{'OK' if okc else 'FAIL'}] compactor total={tot} expected={len(refc)}")
ok &= okc
print("ALL OK" if ok else "FAILURES")
