"""bucket_extract append-tier + drain coverage (ops/extract.py).

Run lengths are chosen to land on every dyadic append-window boundary
(E in {2,4,8,16}: max lengths 127/383/895/1920) and on the fine-grained
drain's partial-quantum sizes; oracle is a host-side concatenation.
"""

import numpy as np
import jax.numpy as jnp

from radix_sort_tpu.ops import extract


def _check(rng, num_ops, m, K, lens_per_chunk):
    nchunks = len(lens_per_chunk)
    bounds = np.zeros((nchunks, K + 1), np.int32)
    for c, lens in enumerate(lens_per_chunk):
        b = np.cumsum([0] + list(lens))
        bounds[c, : len(b)] = b
        bounds[c, len(b) :] = b[-1]
    ops = [
        rng.integers(0, 2**32, nchunks * m, dtype=np.uint32)
        for _ in range(num_ops)
    ]
    cap = max(int(2 * nchunks * m / K) + 2048, 2048)
    cap_rows = -(-cap // 1024) * 8
    outs, counts = extract.bucket_extract(
        [jnp.asarray(o).reshape(-1, 128) for o in ops],
        jnp.asarray(bounds),
        K=K,
        cap_rows=cap_rows,
        chunks_per_bucket=nchunks,
        nbuckets=1,
    )
    for w in range(num_ops):
        got_all = np.asarray(outs[w]).reshape(-1)
        for d in range(K):
            ref = np.concatenate(
                [
                    ops[w][c * m + bounds[c, d] : c * m + bounds[c, d + 1]]
                    for c in range(nchunks)
                ]
            )
            assert int(counts[d]) == len(ref)
            got = got_all[d * cap_rows * 128 : d * cap_rows * 128 + len(ref)]
            np.testing.assert_array_equal(got, ref)


# every tier boundary +-1, plus drain partial-quantum sizes (1..8 rows)
BOUNDARY_LENS = [1, 127, 128, 129, 383, 384, 385, 895, 896, 1000, 1500, 1920,
                 129, 257, 385, 513]


def test_tier_boundaries_single_op(rng):
    lens = [[ln, int(rng.integers(0, 2048 - ln + 1))] for ln in BOUNDARY_LENS]
    _check(rng, 1, 2048, 2, lens)


def test_tier_boundaries_four_ops(rng):
    lens = [[ln, int(rng.integers(0, 2048 - ln + 1))] for ln in BOUNDARY_LENS]
    _check(rng, 4, 2048, 2, lens)


def test_long_runs_and_exact_fill(rng):
    # runs longer than one append piece (1920) split across pieces; a
    # full-chunk run exercises the exactly-full drain path
    _check(rng, 2, 4096, 1, [[3000], [4096], [1], [0], [2500], [4095], [97], [4096]])
