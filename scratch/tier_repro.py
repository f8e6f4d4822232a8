"""Repro: bucket_extract correctness across append-tier boundaries."""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import extract

rng = np.random.default_rng(0)


def check(num_ops, m, K, lens_per_chunk):
    """lens_per_chunk: list over chunks of list of K run lengths (sum<=m)."""
    nchunks = len(lens_per_chunk)
    bounds = np.zeros((nchunks, K + 1), np.int32)
    for c, lens in enumerate(lens_per_chunk):
        b = np.cumsum([0] + list(lens))
        bounds[c, : K + 1] = np.concatenate([b, [b[-1]] * (K - len(lens))])[: K + 1]
        bounds[c, K] = b[-1]
    ops = [rng.integers(0, 2**32, nchunks * m, dtype=np.uint32) for _ in range(num_ops)]
    cap = max(int(2 * nchunks * m / K) + 2048, 2048)
    cap_rows = -(-cap // 1024) * 8  # mult of 8 rows
    outs, counts = extract.bucket_extract(
        [jnp.asarray(o).reshape(-1, 128) for o in ops],
        jnp.asarray(bounds),
        K=K,
        cap_rows=cap_rows,
        chunks_per_bucket=nchunks,
        nbuckets=1,
        interpret=True,
    )
    ok = True
    for d in range(K):
        ref = np.concatenate(
            [
                ops[0][c * m + bounds[c, d] : c * m + bounds[c, d + 1]]
                for c in range(nchunks)
            ]
        ) if nchunks else np.zeros(0, np.uint32)
        got = np.asarray(outs[0]).reshape(-1)[
            d * cap_rows * 128 : d * cap_rows * 128 + len(ref)
        ]
        if int(counts[d]) != len(ref) or not np.array_equal(got, ref):
            bad = np.nonzero(got != ref)[0]
            print(
                f"  FAIL bucket {d}: count {int(counts[d])} vs {len(ref)}, "
                f"first mismatch at {bad[0] if len(bad) else 'count'}"
            )
            ok = False
    print(("OK " if ok else "BAD") + f" num_ops={num_ops} m={m} K={K}")
    return ok


# tier-boundary run lengths
LNS = [1, 64, 127, 128, 129, 250, 383, 384, 385, 700, 895, 896, 1000, 1500, 1920]

allok = True
for num_ops in (1, 2, 3, 4):
    # K=2: alternate a boundary length with a random filler
    lens = []
    for ln in LNS:
        filler = int(rng.integers(0, 2048 - ln + 1))
        lens.append([ln, filler])
    m = 2048
    allok &= check(num_ops, m, 2, lens[:8])
    allok &= check(num_ops, m, 2, lens[8:] + [[17, 900]])
# single-chunk big-run (compact path shape): K=1, long runs > PIECE
for num_ops in (1, 4):
    allok &= check(num_ops, 4096, 1, [[3000], [4096], [1]] + [[0]] * 5)
print("ALL OK" if allok else "FAILURES")
