"""Distributed ASOF join over a device mesh.

The MPP form of :func:`radix_sort_tpu.join_asof` (nearest-key timeseries
join), built from the same exchange machinery as the other distributed
operators:

  1. **Union sort**: each shard's left (query) and right (data) rows frame
     one tagged union relation; ONE global stable sort by
     (key limbs..., origin tag) with the composite position-tiebroken
     splitters of :mod:`parallel.dist_sort` — balanced for ANY key
     distribution (no key-only routing to overflow on duplicate-heavy
     keys). The tag orders data before equal queries for backward matches
     and after for forward, exactly the single-chip merge-rank layout
     (ops/query.py:merge_rank). Query/data original positions and data
     values ride the exchange.
  2. **Local fill + carry**: within a shard the backward candidate is a
     running "last data row so far" (``cummax`` over data positions) and
     the forward candidate its reverse; a query whose candidate lies on
     another shard takes the carry — each shard publishes its last/first
     data row (a few scalars, ``all_gather``), and the nearest non-empty
     predecessor/successor resolves with one P-length scan, replicated.
  3. **Route home**: per-query results exchange back to the query's home
     shard by original position (fixed splitters, deterministic capacity)
     — outputs come back sharded and row-aligned with ``left_keys``.

Wire traffic: one union exchange + one result exchange + O(P) scalars.
The provisioned capacities make overflow impossible; if forced through the
override, the replicated single-chip fallback produces the exact result
(inside ``lax.cond``), mirroring ``distributed_sort``'s contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from radix_sort_tpu import keys as K
from radix_sort_tpu.ops import relational
from radix_sort_tpu.parallel import dist_sort

__all__ = ["distributed_join_asof"]

_BIG = np.int32(2**31 - 1)


def distributed_join_asof(
    left_keys: jnp.ndarray,
    right_keys: jnp.ndarray,
    right_values: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "x",
    *,
    direction: str = "backward",
    tolerance=None,
    fill=0,
    capacity: int | None = None,
):
    """Nearest-key join over row-sharded sides; same semantics as
    :func:`radix_sort_tpu.join_asof` (backward / forward / nearest,
    optional ``tolerance``, latest-tie-backward etc.).

    Returns ``(values, matched, right_pos)`` sharded exactly like
    ``left_keys``, row-aligned: ``values[i]`` is the matched row's
    ``right_values`` entry (``fill`` where unmatched), ``right_pos`` the
    matched row's global index into ``right_keys`` (-1 where unmatched).

    ``capacity`` overrides the provisioned union-exchange bound (test
    knob); an override-forced overflow falls back to the exact replicated
    single-chip join.
    """
    if direction not in relational.ASOF_DIRECTIONS:
        raise ValueError(
            f"direction must be one of {relational.ASOF_DIRECTIONS}, "
            f"got {direction!r}"
        )
    if np.dtype(left_keys.dtype) != np.dtype(right_keys.dtype):
        raise ValueError("left and right keys must share a dtype")
    if right_values.shape[0] != right_keys.shape[0]:
        raise ValueError("right keys/values length mismatch")
    if (tolerance is not None and isinstance(tolerance, (int, float))
            and tolerance < 0):
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    kdt = np.dtype(left_keys.dtype)
    needs_dist = direction == "nearest" or tolerance is not None
    if needs_dist and K.num_limbs(kdt) != 1:
        raise ValueError(
            "nearest/tolerance need arithmetic key distances — supported "
            f"for <=32-bit keys, got {kdt}"
        )
    num_devices = mesh.shape[axis_name]
    n_l, n_r = left_keys.shape[0], right_keys.shape[0]
    vdt = right_values.dtype
    if num_devices == 1 or n_r == 0 or n_l == 0:
        out = relational.join_asof(
            left_keys, right_keys, right_values,
            direction=direction, tolerance=tolerance, fill=fill,
        )
        return out
    if n_l % num_devices or n_r % num_devices:
        raise ValueError(
            f"row counts ({n_l}, {n_r}) must divide the mesh axis "
            f"({num_devices})"
        )
    if max(n_l, n_r) >= 2**31:
        raise ValueError("distributed_join_asof supports < 2**31 rows")
    nl_local = n_l // num_devices
    nr_local = n_r // num_devices
    nu_local = nl_local + nr_local
    cap1 = capacity if capacity is not None else dist_sort.exchange_capacity(
        nu_local, num_devices
    )
    cap2 = -(-(cap1 + nl_local) // 8) * 8
    sentinel = np.uint32(np.iinfo(np.uint32).max)
    splitters_back = jnp.asarray(
        [(r + 1) * nl_local for r in range(num_devices - 1)], jnp.uint32
    )
    # backward/nearest layout: data sorts before equal queries (tag 0 < 1);
    # forward: queries first. See module docstring / merge_rank.
    data_tag = np.uint32(0 if direction != "forward" else 1)
    query_tag = np.uint32(1 - data_tag)
    l_limbs = K.encode_limbs(left_keys)
    r_limbs = K.encode_limbs(right_keys)
    nk = len(l_limbs)
    fill_v = jnp.asarray(fill, vdt)
    is_float = np.issubdtype(kdt, np.floating)

    def shard(*ops):
        lw = list(ops[:nk])
        rw = list(ops[nk:2 * nk])
        rv = ops[2 * nk]
        r = jax.lax.axis_index(axis_name).astype(jnp.int32)

        # ---- union framing: local queries + local data, tagged ----
        uk = [jnp.concatenate([a, b]) for a, b in zip(lw, rw)]
        tag = jnp.concatenate([
            jnp.full((nl_local,), query_tag),
            jnp.full((nr_local,), data_tag),
        ])
        qpos = jnp.concatenate([
            (r * np.int32(nl_local)
             + jnp.arange(nl_local, dtype=jnp.int32)).astype(jnp.uint32),
            jnp.full((nr_local,), np.uint32(0)),
        ])
        rpos = jnp.concatenate([
            jnp.zeros((nl_local,), jnp.int32),
            r * np.int32(nr_local) + jnp.arange(nr_local, dtype=jnp.int32),
        ])
        vals_u = jnp.concatenate([jnp.zeros((nl_local,), vdt), rv])

        ow, ov, cnt1, ovf1 = dist_sort._local_exchange(
            [*uk, tag], [qpos, rpos, vals_u], axis_name, num_devices, cap1,
            sentinel,
        )
        sk, stag = list(ow[:nk]), ow[nk]
        qpos_s, rpos_s, val_s = ov
        cnt = cnt1[0]
        cap = sk[0].shape[0]
        i = jnp.arange(cap, dtype=jnp.int32)
        v = i < cnt
        is_d = v & (stag == data_tag)
        is_q = v & (stag == query_tag)

        # ---- local candidate fills ----
        bi = jax.lax.cummax(jnp.where(is_d, i, -1))                # <= self
        fi = jax.lax.cummin(jnp.where(is_d, i, _BIG), reverse=True)  # >= self
        # forward layout puts candidates AFTER equal queries, so fi at a
        # query row is the first data at-or-after it in key order; in the
        # backward layout fi is strictly-after (used only by `nearest`,
        # where the equal-key case is the backward candidate at distance 0)
        has_b_loc = bi >= 0
        has_f_loc = fi < cnt

        # ---- boundary carry: last/first data row per shard ----
        last_i = jnp.max(jnp.where(is_d, i, -1))
        first_i = jnp.min(jnp.where(is_d, i, _BIG))
        has_d = last_i >= 0
        li = jnp.clip(last_i, 0, cap - 1)
        fi0 = jnp.clip(first_i, 0, cap - 1)
        summ = jnp.stack([
            has_d.astype(jnp.int32), rpos_s[li], rpos_s[fi0],
        ])
        gsum = jax.lax.all_gather(summ, axis_name, tiled=False)  # (P, 3)
        gval = jax.lax.all_gather(
            jnp.stack([val_s[li], val_s[fi0]]), axis_name, tiled=False
        )  # (P, 2)
        gkw = jax.lax.all_gather(
            jnp.stack([sk[0][li], sk[0][fi0]]), axis_name, tiled=False
        )  # (P, 2) leading key limb (enough for 1-limb distances)
        g_has = gsum[:, 0] > 0
        pidx = jnp.arange(num_devices, dtype=jnp.int32)
        # nearest non-empty predecessor / successor shard
        prev_idx = jax.lax.cummax(
            jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                             jnp.where(g_has, pidx, -1)[:-1]])
        )[r]
        nxt_idx = jax.lax.cummin(
            jnp.concatenate([jnp.where(g_has, pidx, _BIG)[1:],
                             jnp.full((1,), _BIG, jnp.int32)]),
            reverse=True,
        )[r]
        has_prev = prev_idx >= 0
        has_nxt = nxt_idx < _BIG
        pc = jnp.clip(prev_idx, 0, num_devices - 1)
        nc = jnp.clip(nxt_idx, 0, num_devices - 1)
        carry_b = (g_has[pc] & has_prev, gval[pc, 0], gsum[pc, 1], gkw[pc, 0])
        carry_f = (g_has[nc] & has_nxt, gval[nc, 1], gsum[nc, 2], gkw[nc, 1])

        # ---- per-query candidate resolution (rows where is_q) ----
        bic = jnp.clip(bi, 0, cap - 1)
        fic = jnp.clip(fi, 0, cap - 1)
        m_b = has_b_loc | carry_b[0]
        m_f = has_f_loc | carry_f[0]
        val_b = jnp.where(has_b_loc, val_s[bic], carry_b[1])
        val_f = jnp.where(has_f_loc, val_s[fic], carry_f[1])
        rp_b = jnp.where(has_b_loc, rpos_s[bic], carry_b[2])
        rp_f = jnp.where(has_f_loc, rpos_s[fic], carry_f[2])
        kw_b = jnp.where(has_b_loc, sk[0][bic], carry_b[3])
        kw_f = jnp.where(has_f_loc, sk[0][fic], carry_f[3])
        qw = sk[0]

        def _dist(kw, back):
            if is_float:
                q = K.decode_limbs([qw], kdt)
                k = K.decode_limbs([kw], kdt)
                return jnp.abs(q - k if back else k - q)
            return qw - kw if back else kw - qw

        if direction == "backward":
            m, val, rp = m_b, val_b, rp_b
            picked_back = jnp.ones((cap,), jnp.bool_)
            kw = kw_b
        elif direction == "forward":
            m, val, rp = m_f, val_f, rp_f
            picked_back = jnp.zeros((cap,), jnp.bool_)
            kw = kw_f
        else:
            d_b = _dist(kw_b, True)
            d_f = _dist(kw_f, False)
            use_f = m_f & (~m_b | (d_f < d_b))
            m = m_b | m_f
            val = jnp.where(use_f, val_f, val_b)
            rp = jnp.where(use_f, rp_f, rp_b)
            kw = jnp.where(use_f, kw_f, kw_b)
            picked_back = ~use_f
        if tolerance is not None:
            d = jnp.where(picked_back, _dist(kw, True), _dist(kw, False))
            tol = (jnp.asarray(tolerance, kdt) if is_float
                   else jnp.asarray(tolerance).astype(jnp.uint32))
            m = m & (d <= tol)

        out_val = jnp.where(is_q & m, val, fill_v)
        out_m = (is_q & m).astype(jnp.uint32)
        out_rp = jnp.where(is_q & m, rp, -1)

        # ---- route home by query position (non-queries stay local) ----
        home_last = (r + 1) * np.uint32(nl_local) - np.uint32(1)
        gpos2 = jnp.where(is_q, qpos_s, home_last)
        fake = (~is_q).astype(jnp.uint32)
        _, ov2, _, ovf2 = dist_sort._local_exchange(
            [gpos2, fake], [out_val, out_m, out_rp], axis_name, num_devices,
            cap2, sentinel, splitters=splitters_back,
        )
        hv, hm, hr = [x[:nl_local] for x in ov2]
        return hv, hm.astype(jnp.bool_), hr, (ovf1[0] | ovf2[0]).reshape(1)

    fn = shard_map(
        shard,
        mesh=mesh,
        in_specs=(P(axis_name),) * (2 * nk + 1),
        out_specs=(P(axis_name),) * 4,
        check_vma=False,
    )
    values, matched, right_pos, ovf = fn(*l_limbs, *r_limbs, right_values)
    overflow = jnp.any(ovf)

    def fb(_):
        return relational.join_asof(
            left_keys, right_keys, right_values,
            direction=direction, tolerance=tolerance, fill=fill,
        )

    values, matched, right_pos = jax.lax.cond(
        overflow, fb, lambda t: t, (values, matched, right_pos)
    )
    return values, matched, right_pos
