"""Production engine tests: Pallas bucket extraction + MSD sample sort.

Runs on the CPU backend in Pallas interpret mode (sizes kept small); the same
code paths compile to Mosaic on TPU. Oracle pattern follows the reference's
tests (src/radix_sort/tests.rs:7-23): exact equality against a trusted stable
comparison sort.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from radix_sort_tpu.ops import extract, sample_sort


def _sorted_by(arrs, num_keys):
    perm = np.lexsort(tuple(reversed([np.asarray(a) for a in arrs[:num_keys]])))
    return [np.asarray(a)[perm] for a in arrs]


def _run(arrs, num_keys, **kw):
    out = sample_sort.sample_sort_words(
        [jnp.asarray(a) for a in arrs], num_keys, **kw
    )
    return [np.asarray(o) for o in out]


class TestBucketExtract:
    def test_runs_move_to_regions(self, rng):
        cr, K, nchunks = 8, 4, 8
        chunk = cr * 128
        x = rng.integers(0, 2**32 - 2, nchunks * chunk, dtype=np.uint32)
        bounds = np.zeros((nchunks, K + 1), np.int32)
        for c in range(nchunks):
            valid = rng.integers(0, chunk + 1)
            cuts = np.sort(rng.integers(0, valid + 1, K - 1))
            bounds[c] = np.concatenate([[0], cuts, [valid]])
        cap_rows = 48
        outs, counts = extract.bucket_extract(
            [jnp.asarray(x).reshape(-1, 128)],
            jnp.asarray(bounds),
            K=K,
            cap_rows=cap_rows,
            chunks_per_bucket=nchunks,
            nbuckets=1,
        )
        got = np.asarray(outs[0]).reshape(K, cap_rows * 128)
        for d in range(K):
            runs = [
                x[c * chunk + bounds[c, d] : c * chunk + bounds[c, d + 1]]
                for c in range(nchunks)
            ]
            ref = np.concatenate(runs)
            assert counts[d] == len(ref)
            np.testing.assert_array_equal(got[d, : len(ref)], ref)

    def test_compactor(self, rng):
        nreg, cap_rows = 16, 16
        x = rng.integers(0, 2**32 - 2, nreg * cap_rows * 128, dtype=np.uint32)
        cnt = rng.integers(0, cap_rows * 128 + 1, nreg).astype(np.int32)
        outs, total = extract.compact_regions(
            [jnp.asarray(x).reshape(-1, 128)], jnp.asarray(cnt), cap_rows=cap_rows
        )
        ref = np.concatenate(
            [x[r * cap_rows * 128 : r * cap_rows * 128 + cnt[r]] for r in range(nreg)]
        )
        assert int(total[0]) == len(ref)
        np.testing.assert_array_equal(np.asarray(outs[0]).reshape(-1)[: len(ref)], ref)


class TestSampleSort:
    KW = dict(m=512, K=8)

    def test_uniform_pairs(self, rng):
        n = 512 * 9 + 13
        arrs = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(2)]
        out = _run(arrs, 1, **self.KW)
        ref = _sorted_by(arrs, 1)
        for o, r in zip(out, ref):
            np.testing.assert_array_equal(o, r)

    def test_two_word_keys(self, rng):
        n = 512 * 8
        arrs = [rng.integers(0, 2**32, n, dtype=np.uint32) for _ in range(4)]
        out = _run(arrs, 2, **self.KW)
        ref = _sorted_by(arrs, 2)
        for o, r in zip(out, ref):
            np.testing.assert_array_equal(o, r)

    def test_duplicate_heavy_stability(self, rng):
        # the reference's StepUniform regime (distr.rs:78-106): few distinct
        # keys; payload order must be preserved (tests.rs:175-187)
        n = 512 * 16
        keys = rng.integers(0, 3, n).astype(np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        out = _run([keys, vals], 1, **self.KW)
        ref = _sorted_by([keys, vals], 1)
        np.testing.assert_array_equal(out[0], ref[0])
        np.testing.assert_array_equal(out[1], ref[1])

    def test_all_equal_keys(self, rng):
        n = 512 * 8
        keys = np.full(n, 0xDEADBEEF, np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        out = _run([keys, vals], 1, **self.KW)
        np.testing.assert_array_equal(out[1], vals)

    def test_presorted_input(self, rng):
        n = 512 * 8
        keys = np.sort(rng.integers(0, 2**32, n, dtype=np.uint32))
        vals = rng.integers(0, 2**32, n, dtype=np.uint32)
        out = _run([keys, vals], 1, **self.KW)
        np.testing.assert_array_equal(out[0], keys)
        np.testing.assert_array_equal(out[1], vals)

    def test_max_words_present(self, rng):
        # real 0xFFFFFFFF keys must not be confused with the sentinel fill
        n = 512 * 8
        keys = rng.integers(0, 2**32, n, dtype=np.uint32)
        keys[:: 7] = 0xFFFFFFFF
        vals = np.arange(n, dtype=np.uint32)
        out = _run([keys, vals], 1, **self.KW)
        ref = _sorted_by([keys, vals], 1)
        np.testing.assert_array_equal(out[0], ref[0])
        np.testing.assert_array_equal(out[1], ref[1])

    def test_multi_round_plans(self, rng):
        # force 2- and 3-round plans (the planner picks R=1 at this size):
        # exercises per-region splitters, valid-length clamps and local
        # position shifts at every depth
        n = 512 * 16 + 77
        keys = rng.integers(0, 2**32, n, dtype=np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        ref = _sorted_by([keys, vals], 1)
        for rounds in ([4, 4], [2, 2, 2]):
            out = _run([keys, vals], 1, m=512, rounds=rounds)
            np.testing.assert_array_equal(out[0], ref[0])
            np.testing.assert_array_equal(out[1], ref[1])

    def test_multi_round_duplicate_heavy(self, rng):
        n = 512 * 16
        keys = rng.integers(0, 2, n).astype(np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        out = _run([keys, vals], 1, m=512, rounds=[4, 4])
        ref = _sorted_by([keys, vals], 1)
        np.testing.assert_array_equal(out[0], ref[0])
        np.testing.assert_array_equal(out[1], ref[1])

    def test_overflow_falls_back_to_comparator(self, rng):
        # alpha far below 1 makes region capacities insufficient; the
        # overflow flag must reroute through the lax.sort fallback branch
        # and still return the exact stable result
        n = 512 * 16
        keys = rng.integers(0, 2**32, n, dtype=np.uint32)
        vals = np.arange(n, dtype=np.uint32)
        out = _run([keys, vals], 1, m=512, K=8, alpha=0.05)
        ref = _sorted_by([keys, vals], 1)
        np.testing.assert_array_equal(out[0], ref[0])
        np.testing.assert_array_equal(out[1], ref[1])

    def test_rejects_bad_chunk_elems(self, rng):
        arrs = [rng.integers(0, 2**32, 2048, dtype=np.uint32)]
        with pytest.raises(ValueError, match="power of two"):
            _run(arrs, 1, m=1536)
        with pytest.raises(ValueError, match="multiple of 128"):
            _run(arrs, 1, m=96)

    def test_overflow_with_giant_region_counts(self, rng):
        # counts can exceed region capacity by far more than one append
        # piece; the compactor must clamp them (device-UB otherwise) and the
        # fallback must still deliver the exact result
        n = 512 * 32
        keys = np.full(n, 3, np.uint32)  # all-equal: one bucket takes all
        vals = np.arange(n, dtype=np.uint32)
        out = _run([keys, vals], 1, m=512, K=8, alpha=0.01)
        ref = _sorted_by([keys, vals], 1)
        np.testing.assert_array_equal(out[0], ref[0])
        np.testing.assert_array_equal(out[1], ref[1])
