"""Within-chunk permutation-apply kernel (ops/permute.py).

Parked primitive for the surrogate-sort engine design (scratch/NOTES.md);
covered here so it stays correct while out of the production path.
"""

import numpy as np
import jax.numpy as jnp

from radix_sort_tpu.ops import permute


def test_applies_per_chunk_permutation(rng):
    m, nch, W = 512, 8, 3
    N = m * nch
    ops = [rng.integers(0, 2**32, N, dtype=np.uint32) for _ in range(W)]
    src = np.concatenate(
        [rng.permutation(m) for _ in range(nch)]
    ).astype(np.int32)
    out = permute.apply_perm_chunks(
        [jnp.asarray(x) for x in ops], jnp.asarray(src), m
    )
    for got, x in zip(out, ops):
        ref = np.concatenate(
            [x[c * m : (c + 1) * m][src[c * m : (c + 1) * m]] for c in range(nch)]
        )
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_gather_not_permutation(rng):
    # arbitrary (non-bijective) source indices are fine: it's a gather
    m, nch = 256, 4
    N = m * nch
    x = rng.integers(0, 2**32, N, dtype=np.uint32)
    src = rng.integers(0, m, N).astype(np.int32)
    out = permute.apply_perm_chunks([jnp.asarray(x)], jnp.asarray(src), m)
    ref = np.concatenate(
        [x[c * m : (c + 1) * m][src[c * m : (c + 1) * m]] for c in range(nch)]
    )
    np.testing.assert_array_equal(np.asarray(out[0]), ref)
