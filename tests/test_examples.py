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


def test_table_demo_matches_oracle(rng):
    from examples.table_demo import build_pipeline

    n, n_q, n_sym = 10_000, 640, 32
    sym = rng.integers(0, n_sym, n).astype(np.uint32)
    qty = rng.integers(1, 500, n).astype(np.uint32)
    ts = np.sort(rng.integers(0, 1 << 30, n).astype(np.uint32))
    q_ts = rng.integers(0, 1 << 30, n_q).astype(np.uint32)
    q_px = rng.integers(90, 110, n_q).astype(np.uint32)

    run = build_pipeline(min_qty=250)
    s, cnt, notional, num = run(*(jnp.asarray(a) for a in
                                  (sym, qty, ts, q_ts, q_px)))
    num = int(num)

    # numpy oracle (backward asof: latest quote at-or-before; unmatched
    # trades contribute notional 0 via fill=0; modular uint32 sums)
    keep = qty > 250
    ks, kq, kt = sym[keep], qty[keep], ts[keep]
    order = np.argsort(q_ts, kind="stable")
    sq_ts, sq_px = q_ts[order], q_px[order]
    hi = np.searchsorted(sq_ts, kt, side="right")
    px = np.where(hi > 0, sq_px[np.clip(hi - 1, 0, None)], 0).astype(np.uint32)
    notl = (kq * px).astype(np.uint32)
    uk = np.unique(ks)
    ref = [(u, (ks == u).sum(),
            np.sum(notl[ks == u], dtype=np.uint32)) for u in uk]
    ref.sort(key=lambda r: (0xFFFFFFFF - r[2], r[0]))  # notional desc, stable
    assert num == len(ref)
    got_s = np.asarray(s)[:num]
    got_n = np.asarray(cnt)[:num]
    got_v = np.asarray(notional)[:num].astype(np.uint32)
    np.testing.assert_array_equal(got_v, [r[2] for r in ref])
    # symbols within equal notionals may tie-order by input position; check
    # as multisets per notional value
    for v in np.unique(got_v):
        np.testing.assert_array_equal(
            np.sort(got_s[got_v == v]),
            np.sort(np.array([r[0] for r in ref if r[2] == v])),
        )
    np.testing.assert_array_equal(
        np.sort(got_n), np.sort(np.array([r[1] for r in ref]))
    )


def test_dist_table_demo_matches_oracle(rng):
    from jax.sharding import Mesh

    from examples.dist_table_demo import build_pipeline

    n, n_sym, min_qty = 8 * 512, 16, 100
    sym = rng.integers(0, n_sym, n).astype(np.uint32)
    qty = rng.integers(1, 1000, n).astype(np.uint32)
    ts = rng.integers(0, 1 << 30, n).astype(np.uint32)

    mesh = Mesh(np.array(jax.devices()), ("x",))
    run = build_pipeline(mesh, min_qty=min_qty, max_groups=n_sym * 2)
    s, cnt, vol, peak, num = run(
        jnp.asarray(sym), jnp.asarray(qty), jnp.asarray(ts)
    )
    num = int(num)

    keep = qty > min_qty
    ks, kq, kt = sym[keep], qty[keep], ts[keep]
    refs = []
    for u in np.unique(ks):
        g = kq[ks == u]
        order = np.argsort(kt[ks == u], kind="stable")
        refs.append((int(u), len(g), int(g.sum()),
                     int(np.max(np.cumsum(g[order])))))
    refs.sort(key=lambda r: (-r[2],))
    assert num == len(refs)
    got_v = np.asarray(vol)[:num].astype(np.int64)
    np.testing.assert_array_equal(got_v, [r[2] for r in refs])
    # ties in volume may order by input position; compare per-volume sets
    got = list(zip(np.asarray(s)[:num].tolist(),
                   np.asarray(cnt)[:num].tolist(),
                   got_v.tolist(),
                   np.asarray(peak)[:num].astype(np.int64).tolist()))
    assert sorted(got) == sorted(refs)
