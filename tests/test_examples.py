"""The composed query example must match a numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from examples.query_demo import build_query


def test_query_demo_matches_oracle(rng):
    n, n_accounts = 20_000, 256
    t_keys = rng.integers(0, n_accounts, n).astype(np.uint32)
    t_amounts = rng.integers(0, 1 << 16, n).astype(np.uint32)
    a_keys = np.arange(n_accounts, dtype=np.uint32)
    a_tier = rng.integers(0, 3, n_accounts).astype(np.uint32)
    thr = np.uint32(1 << 14)

    q = build_query(n_accounts, join_capacity=n + 128)
    uk, sums, n_groups, ovf = q(
        jnp.asarray(t_keys), jnp.asarray(t_amounts),
        jnp.asarray(a_keys), jnp.asarray(a_tier), jnp.asarray(thr),
    )
    assert not bool(ovf)
    n_groups = int(n_groups)

    # oracle
    keep = t_amounts > thr
    tk, ta = t_keys[keep], t_amounts[keep]
    good = set(a_keys[a_tier == 1].tolist())
    mask = np.isin(tk, list(good))
    tk, ta = tk[mask], ta[mask]
    ref_keys = np.unique(tk)
    ref_sums = np.array([ta[tk == k].sum(dtype=np.uint32) for k in ref_keys])
    assert n_groups == len(ref_keys)
    np.testing.assert_array_equal(np.asarray(uk)[:n_groups], ref_keys)
    np.testing.assert_array_equal(
        np.asarray(sums)[:n_groups].astype(np.uint32), ref_sums
    )
