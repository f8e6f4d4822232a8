"""expand_join_runs kernel coverage (ops/expand.py) vs a host oracle.

Run lengths cross every dyadic append-tier boundary (127/383/895/1920) and
the >PIECE piece-split path; fill runs (m_copy=0, m_emit=1) model a left
join's unmatched rows. Oracle: per-run numpy concatenation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radix_sort_tpu.ops import expand


def _run(rng, spec, n_r=None, capacity=None):
    """spec: list of (lo, m_copy, m_emit)."""
    if n_r is None:
        n_r = max([lo + mc for lo, mc, _ in spec], default=0) + 1
    rvs = rng.integers(0, 2**32, n_r, dtype=np.uint32)
    n = len(spec)
    desc = np.zeros((max(n, 1), expand.DESC_COLS), np.int32)
    keys = rng.integers(0, 2**31, max(n, 1)).astype(np.int32)
    lvs = rng.integers(0, 2**31, max(n, 1)).astype(np.int32)
    ref_k, ref_l, ref_r = [], [], []
    for i, (lo, mc, me) in enumerate(spec):
        desc[i] = [keys[i], lvs[i], lo, mc, me, 0, 0, 0]
        ref_k += [keys[i]] * me
        ref_l += [lvs[i]] * me
        ref_r += list(rvs[lo : lo + mc]) + [0] * (me - mc)
    total = len(ref_k)
    if capacity is None:
        capacity = total + 17
    ok, ol, orv, cnt = expand.expand_join_runs(
        jnp.asarray(rvs), jnp.asarray(desc), capacity=capacity
    )
    assert int(cnt) == total
    np.testing.assert_array_equal(
        np.asarray(ok)[:total].astype(np.int64), np.asarray(ref_k, np.int64)
    )
    np.testing.assert_array_equal(
        np.asarray(ol)[:total].astype(np.int64), np.asarray(ref_l, np.int64)
    )
    np.testing.assert_array_equal(
        np.asarray(orv)[:total].astype(np.int64),
        np.asarray(ref_r, np.int64),
    )
    # tail rows keep the MAX-sentinel prefill
    if capacity > total:
        assert (np.asarray(orv)[total:] == 0xFFFFFFFF).all()


BOUNDARIES = [1, 2, 127, 128, 129, 383, 384, 385, 895, 896, 1919, 1920]


class TestExpandJoinRuns:
    def test_tier_boundaries(self, rng):
        spec = [
            (int(rng.integers(0, 4000)), ln, ln) for ln in BOUNDARIES
        ]
        _run(rng, spec, n_r=8192)

    def test_long_runs_piece_split(self, rng):
        spec = [
            (0, 1921, 1921),
            (100, 4000, 4000),
            (7, 5000, 5000),
        ]
        _run(rng, spec, n_r=8192)

    def test_fill_and_zero_runs(self, rng):
        spec = [
            (0, 5, 5),
            (0, 0, 1),  # unmatched left row: key/lv broadcast, rv=0
            (50, 0, 0),  # zero-emission row is skipped entirely
            (9, 130, 130),
            (0, 0, 1),
        ]
        _run(rng, spec, n_r=512)

    def test_random_mix(self, rng):
        spec = []
        for _ in range(300):
            ln = int(rng.integers(0, 300))
            lo = int(rng.integers(0, 4096))
            if rng.random() < 0.1:
                spec.append((lo, 0, 1))
            else:
                spec.append((lo, ln, ln))
        _run(rng, spec, n_r=8192)

    def test_unaligned_sources(self, rng):
        # lo positions straddling lane/sublane boundaries
        spec = [
            (127, 3, 3),
            (128, 130, 130),
            (255, 300, 300),
            (1023, 1000, 1000),
            (129, 1, 1),
        ]
        _run(rng, spec, n_r=4096)

    def test_many_blocks(self, rng):
        # more runs than one descriptor block (RUNS_PER_BLOCK)
        spec = [
            (int(rng.integers(0, 1024)), int(rng.integers(1, 9)),) * 1
            + ()
            for _ in range(expand.RUNS_PER_BLOCK * 2 + 5)
        ]
        spec = [(lo, m, m) for (lo, m) in spec]
        _run(rng, spec, n_r=2048)

    def test_exact_capacity(self, rng):
        spec = [(0, 100, 100), (10, 28, 28)]
        _run(rng, spec, n_r=512, capacity=128)
