"""Distributed window functions over a device mesh.

The distributed form of :func:`radix_sort_tpu.ops.window.window`: rows are
row-sharded, partitions may span shards, and results come back row-aligned
with the input sharding. The plan is the classic MPP window strategy,
built from this package's exchange machinery:

  1. **Global sort** by (partition limbs, order limbs) with the composite
     position-tiebroken splitters of :mod:`parallel.dist_sort` — balanced
     for ANY distribution (a single giant partition spans shards instead of
     flooding one), stable (ties keep global input order, the same
     deterministic contract as the single-chip op). Each row's original
     global position rides the exchange.
  2. **Local window math per shard** (same segment formulation as
     ops/window.py), plus a tiny per-shard boundary summary: head/tail
     partition and order keys, head/tail run counts/sums/min/max words,
     first/last values. Summaries ``all_gather`` (a few dozen scalars per
     shard) and every shard replays the P-step carry chain — the
     distributed segmented scan: a partition spanning shards t..s
     accumulates its prefix stats left-to-right (for running ops and
     ranks) and its suffix stats right-to-left (for partition-wide
     aggregates), chaining THROUGH shards wholly covered by the partition.
  3. **Route back**: results exchange home by original position (fixed
     position splitters; every destination receives exactly its rows plus
     its own padding — deterministically within capacity), and one stable
     sort by position restores the input layout.

Wire traffic: one data exchange each way plus O(P × ops) scalars — no
replication of the relation anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from radix_sort_tpu import keys as K
from radix_sort_tpu.ops import query
from radix_sort_tpu.ops import window as W
from radix_sort_tpu.parallel import dist_sort

__all__ = ["distributed_window"]

_BIG = np.int32(2**31 - 1)

# set by distributed_window: whether the last call took the replicated
# overflow fallback (eager mode: a concrete bool array) — test/debug only
_last_fallback = None


def _stack_gather(vals, axis_name, dtype):
    """Stack per-shard scalars and all_gather -> (P, len(vals))."""
    v = jnp.stack([jnp.asarray(x, dtype) for x in vals])
    return jax.lax.all_gather(v, axis_name, tiled=False)


def _eq_rows(a, b):
    """Row-wise equality of two (P,)-limb lists at python index level."""
    e = a[0] == b[0]
    for x, y in zip(a[1:], b[1:]):
        e = e & (x == y)
    return e


def _word_max_chains(g_stats, g_valid, g_whole, g_hp, g_tp, npl, r, nP):
    """Partition-max carry replay for ONE derived word column.

    ``g_stats``: (P, 2) gathered per-shard [head-partition max,
    tail-partition max] of the derived word. Returns ``(cin, cout)`` for
    shard ``r``: the max of the column over earlier shards' rows of my
    head partition, and over later shards' rows of my tail partition —
    the same P-step replicated replay as the main value chains, reduced
    to one combine."""
    zero = jnp.zeros((), g_stats.dtype)

    def _run(rng, p_open, p_close, stat_col):
        has = jnp.bool_(False)
        p_st = [jnp.zeros((), jnp.uint32)] * npl
        m_st = zero
        carried = [None] * nP
        for s in rng:
            sv = g_valid[s]
            cont = has & sv & _eq_rows(p_st, [g[s] for g in p_open]) \
                if npl else (has & sv)
            carried[s] = jnp.where(cont, m_st, zero)
            acc = cont & g_whole[s]
            n_m = jnp.maximum(g_stats[s, stat_col],
                              jnp.where(acc, m_st, zero))
            m_st = jnp.where(sv, n_m, m_st)
            p_st = [jnp.where(sv, g[s], x) for x, g in zip(p_st, p_close)]
            has = has | sv
        return jnp.stack(carried)[r]

    # forward: earlier shards' tail stats accumulate into my head partition
    cin = _run(range(nP), g_hp, g_tp, 1)
    # backward: later shards' head stats accumulate into my tail partition
    cout = _run(range(nP - 1, -1, -1), g_tp, g_hp, 0)
    return cin, cout


def distributed_window(
    ops,
    *,
    partition_by=None,
    order_by=None,
    descending=None,
    mesh: Mesh,
    axis_name: str = "x",
    capacity: int | None = None,
    range_halo: int | None = None,
):
    """Evaluate window functions over row-sharded columns.

    Same specs and semantics as :func:`radix_sort_tpu.window` — the FULL
    single-chip surface (rank ops incl. percent_rank/cume_dist/ntile,
    partition-wide aggregates, running aggregates, first/last/nth value,
    lag/lead, rolling frames), with ``partition_by`` / ``order_by`` as
    columns or column lists sharded over ``mesh``'s ``axis_name`` and
    ``descending`` as per-order-column direction flags. Returns
    the result columns sharded exactly like the inputs, row-aligned:
    element i of every output corresponds to input row i. Ties in
    ``order_by`` break by global input position (deterministic, matching
    the single-chip op bit-for-bit).

    Rolling frames and ``lag``/``lead`` exchange a halo of ``preceding``
    (resp. offset) rows from the previous shard and ``following`` rows
    from the next (one ``ppermute`` each way); a frame bound or offset
    exceeding a neighbor shard's row count trips the exact replicated
    fallback — results are always exact. BOUNDED value (RANGE) frames
    shard the same way with a FIXED halo of ``range_halo`` sorted
    neighbor rows each way (default: n_local // 4, min 64): bounds come
    from merge-rank searchsorted over the halo-extended view, and any
    frame that touches a visible edge its partition may extend past
    trips the same replicated fallback (UNBOUNDED sides always
    replicate). Wire traffic is proportional to the halo, not the
    table. ``nth_value`` broadcasts the
    partition's k-th row by a marked-word partition max (one extra
    O(P)-scalar carry replay per nth spec; no extra data exchange).

    ``capacity`` overrides the provisioned per-shard exchange bound
    (test/tuning knob, as in :func:`distributed_sort`).
    """
    global _last_fallback
    single = isinstance(ops, (str, tuple))
    specs = [W._normalize_spec(ops)] if single else [
        W._normalize_spec(s) for s in ops
    ]
    if not specs:
        raise ValueError("ops must contain at least one window op")
    single_out = single
    range_specs = [sp for sp in specs if sp[0] in W._RANGE_OPS]
    if range_specs and any(sp[2] is None or sp[3] is None
                           for sp in range_specs):
        # UNBOUNDED RANGE sides span whole partitions by definition — no
        # halo can bound them; take the exact replicated path (the same
        # evaluation the overflow fallback runs). BOUNDED range frames
        # shard below: a fixed value-halo of ``range_halo`` sorted rows
        # from each neighbor covers them, with a halo-edge overflow check
        # tripping this same replicated fallback when a frame cannot be
        # proven complete.
        _last_fallback = jnp.bool_(True)  # replicated path by definition
        fres = W.window(
            [_respec(sp) for sp in specs],
            partition_by=partition_by, order_by=order_by,
            descending=descending,
        )
        return fres[0] if single_out else fres

    p_cols = ([] if partition_by is None else
              list(partition_by) if isinstance(partition_by, (list, tuple))
              else [partition_by])
    o_cols = ([] if order_by is None else
              list(order_by) if isinstance(order_by, (list, tuple))
              else [order_by])

    n = None
    for c in p_cols + o_cols + [s[1] for s in specs if s[1] is not None]:
        if n is None:
            n = c.shape[0]
        elif c.shape[0] != n:
            raise ValueError("all partition/order/value columns must have "
                             "equal length")
    if n is None:
        raise ValueError("distributed_window needs at least one column")

    num_devices = mesh.shape[axis_name]
    if num_devices == 1:
        _last_fallback = jnp.bool_(True)  # single-chip path
        out = W.window(ops, partition_by=partition_by, order_by=order_by,
                       descending=descending)
        return out
    if n % num_devices != 0:
        raise ValueError(
            f"n ({n}) must be divisible by the mesh axis ({num_devices})"
        )
    n_local = n // num_devices
    if n >= 2**31:
        raise ValueError("distributed_window supports < 2**31 rows")

    # partition limbs; a constant limb when there is no partition_by keeps
    # the boundary/exchange machinery uniform (splitters stay balanced via
    # the position tiebreak)
    if p_cols:
        p_limbs = W._cols_to_limbs(p_cols)
    else:
        p_limbs = [jnp.zeros((n,), jnp.uint32)]
    o_limbs = W._order_limbs(
        o_cols, W._norm_descending(descending, len(o_cols))
    )
    npl, nol = len(p_limbs), len(o_limbs)

    if range_specs:
        # mirror the single-chip contract (ops/window.py)
        if len(o_cols) != 1:
            raise ValueError(
                "RANGE frames need exactly one order_by column"
            )
        if W._norm_descending(descending, 1)[0]:
            raise ValueError(
                "RANGE frames need an ascending order_by column"
            )

    # distinct value columns ride the exchange once
    val_ids, val_arrays = {}, []
    for _, v, _, _, _ in specs:
        if v is not None and id(v) not in val_ids:
            val_ids[id(v)] = len(val_arrays)
            val_arrays.append(v)
    if range_specs and id(o_cols[0]) not in val_ids:
        # RANGE bounds are value deltas against the raw order column
        val_ids[id(o_cols[0])] = len(val_arrays)
        val_arrays.append(o_cols[0])
    nv = len(val_arrays)
    if range_halo is None:
        range_halo = min(n_local, max(64, n_local // 4))
    range_halo = min(range_halo, n_local)

    cap1 = capacity if capacity is not None else dist_sort.exchange_capacity(
        n_local, num_devices
    )
    cap2 = -(-(cap1 + n_local) // 8) * 8
    sentinel = np.uint32(np.iinfo(np.uint32).max)
    splitters_back = jnp.asarray(
        [(r + 1) * n_local for r in range(num_devices - 1)], jnp.uint32
    )

    body = functools.partial(
        _window_shard,
        specs=specs,
        npl=npl,
        nol=nol,
        nv=nv,
        val_ids=val_ids,
        axis_name=axis_name,
        num_devices=num_devices,
        n_local=n_local,
        cap1=cap1,
        cap2=cap2,
        sentinel=sentinel,
        splitters_back=splitters_back,
        range_halo=range_halo,
        order_cid=(val_ids[id(o_cols[0])] if range_specs else -1),
    )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name),) * (npl + nol + nv),
        out_specs=(P(axis_name),) * (len(specs) + 1),
        check_vma=False,
    )
    out = fn(*p_limbs, *o_limbs, *val_arrays)
    results, ovf = list(out[:-1]), out[-1]
    overflow = jnp.any(ovf)
    _last_fallback = overflow  # test/debug introspection: True means the
    #                            replicated fallback produced this result

    # The provisioned bounds make overflow impossible; a capacity override
    # can force it, in which case the exact replicated single-chip path runs
    # instead (inside the cond, so it never executes eagerly) — the result
    # is ALWAYS exact, mirroring distributed_sort's fallback contract.
    def fb(_):
        fres = W.window(
            [(_respec(s)) for s in specs],
            partition_by=partition_by, order_by=order_by,
            descending=descending,
        )
        return tuple(fres)

    results = list(jax.lax.cond(
        overflow, fb, lambda t: t, tuple(results)
    ))
    return results[0] if single else results


def _respec(spec):
    """(name, values, p1, p2, fill) -> the public spec tuple form."""
    name, values, p1, p2, fill = spec
    if name == "ntile":
        return (name, p1)
    if name in ("rolling_count", "range_count"):
        return (name, p1, p2)
    if values is None:
        return name
    if name in W._ROLLING_OPS or name in W._RANGE_OPS:
        return (name, values, p1, p2)
    if name in ("lag", "lead", "nth_value"):
        return (name, values, p1, 0 if fill is None else fill)
    return (name, values)


def _window_shard(*operands, specs, npl, nol, nv, val_ids, axis_name,
                  num_devices, n_local, cap1, cap2, sentinel,
                  splitters_back, range_halo=0, order_cid=-1):
    """Per-device body: exchange by (partition, order), local window math +
    carry chains, route results home by original position."""
    p_in = list(operands[:npl])
    o_in = list(operands[npl:npl + nol])
    vals_in = list(operands[npl + nol:])
    r = jax.lax.axis_index(axis_name).astype(jnp.int32)
    gpos = (r * np.int32(n_local)
            + jnp.arange(n_local, dtype=jnp.int32)).astype(jnp.uint32)

    # ---- exchange 1: global stable sort by (partition, order) ----
    keys1 = p_in + o_in
    vals1 = [gpos] + vals_in
    ow, ov, cnt1, ovf1 = dist_sort._local_exchange(
        keys1, vals1, axis_name, num_devices, cap1, sentinel
    )
    ow, ov = list(ow), list(ov)
    cnt = cnt1[0]
    sp, so = ow[:npl], ow[npl:]
    gpos_s = ov[0]
    vals_s = ov[1:]
    cap = sp[0].shape[0]

    # ---- local segment structure (validity leads the partition key so
    # exchange padding forms one trailing pseudo-partition) ----
    i = jnp.arange(cap, dtype=jnp.int32)
    v = i < cnt
    inv = (~v).astype(jnp.uint32)
    pf = W._boundary([inv, *sp], cap)
    of = pf | (W._boundary([inv, *sp, *so], cap) if so else pf)
    start = jax.lax.cummax(jnp.where(pf, i, -1))
    part_last = jnp.concatenate([pf[1:], jnp.ones((1,), jnp.bool_)])
    pend = jax.lax.cummin(jnp.where(part_last, i, _BIG), reverse=True)
    rn0 = i - start
    gid = jnp.cumsum(pf.astype(jnp.int32)) - 1
    rid = jnp.cumsum(of.astype(jnp.int32)) - 1
    last_idx = jnp.clip(cnt - 1, 0, cap - 1)
    gid_last = gid[last_idx]
    rid_last = rid[last_idx]
    headm = v & (gid == 0)
    tailm = v & (gid == gid_last)
    in_first_run = v & (rid == 0)

    # ---- per-shard boundary summaries ----
    h_cnt = jnp.sum(headm.astype(jnp.int32))
    t_cnt = jnp.sum(tailm.astype(jnp.int32))
    t_tie = jnp.sum((v & (rid == rid_last)).astype(jnp.int32))
    h_tie = jnp.sum(in_first_run.astype(jnp.int32))
    h_runs = jnp.max(jnp.where(headm, rid, -1)) + 1
    rid_tail_start = jnp.min(jnp.where(tailm, rid, _BIG))
    t_runs = jnp.where(cnt > 0, rid_last - rid_tail_start + 1, 0)
    valid_s = cnt > 0
    whole_s = valid_s & (gid_last == 0)
    tie_span = t_tie == cnt   # tail tie run covers every valid row
    htie_span = h_tie == cnt  # head tie run covers every valid row

    ig = _stack_gather(
        [cnt, h_cnt, t_cnt, t_tie, h_runs, t_runs,
         valid_s.astype(jnp.int32), whole_s.astype(jnp.int32),
         tie_span.astype(jnp.int32), h_tie, htie_span.astype(jnp.int32)],
        axis_name, jnp.int32,
    )  # (P, 11)
    g_cnt, g_hcnt, g_tcnt, g_ttie, g_hruns, g_truns = (
        ig[:, 0], ig[:, 1], ig[:, 2], ig[:, 3], ig[:, 4], ig[:, 5]
    )
    g_valid = ig[:, 6] > 0
    g_whole = ig[:, 7] > 0
    g_tiespan = ig[:, 8] > 0
    g_htie = ig[:, 9]
    g_htiespan = ig[:, 10] > 0

    hp = [w[0] for w in sp]
    tp = [w[last_idx] for w in sp]
    ho = [w[0] for w in so]
    to = [w[last_idx] for w in so]
    lg = _stack_gather(hp + tp + ho + to, axis_name, jnp.uint32)  # (P, L)
    g_hp = [lg[:, l] for l in range(npl)]
    g_tp = [lg[:, npl + l] for l in range(npl)]
    g_ho = [lg[:, 2 * npl + l] for l in range(nol)]
    g_to = [lg[:, 2 * npl + nol + l] for l in range(nol)]

    # per-value-column stats: raw (sums / first / last) + encoded words
    # (min / max). Head stats feed the backward chain, tail the forward.
    col_stats = []
    for vc in vals_s:
        wc = K.encode(vc)
        maxw = jnp.asarray(np.iinfo(np.dtype(wc.dtype)).max, wc.dtype)
        zero = jnp.zeros((), vc.dtype)
        h_first = vc[0]
        t_last = vc[last_idx]
        t_first = vc[jnp.argmax(tailm)]
        h_last = vc[jnp.max(jnp.where(headm, i, 0))]
        raw = _stack_gather(
            [jnp.sum(jnp.where(tailm, vc, zero)),
             jnp.sum(jnp.where(headm, vc, zero)),
             h_first, t_first, h_last, t_last],
            axis_name, vc.dtype,
        )  # (P, 6): t_sum, h_sum, h_first, t_first, h_last, t_last
        words = _stack_gather(
            [jnp.min(jnp.where(tailm, wc, maxw)),
             jnp.max(jnp.where(tailm, wc, jnp.zeros((), wc.dtype))),
             jnp.min(jnp.where(headm, wc, maxw)),
             jnp.max(jnp.where(headm, wc, jnp.zeros((), wc.dtype)))],
            axis_name, wc.dtype,
        )  # (P, 4): t_minw, t_maxw, h_minw, h_maxw
        col_stats.append((wc, maxw, raw, words))

    # ---- forward carry chain: for each shard, stats of its HEAD partition
    # accumulated over all earlier shards (replicated P-step replay) ----
    nP = num_devices
    z32 = jnp.int32(0)
    st = {
        "has": jnp.bool_(False),
        "p": [jnp.uint32(0)] * npl,
        "o": [jnp.uint32(0)] * nol,
        "cnt": z32, "tie": z32, "runs": z32,
        "sum": [jnp.zeros((), vc.dtype) for vc in vals_s],
        "minw": [mw for (_, mw, _, _) in col_stats],
        "maxw": [jnp.zeros((), wc.dtype) for (wc, _, _, _) in col_stats],
        "first": [jnp.zeros((), vc.dtype) for vc in vals_s],
    }
    cin = {k: [] for k in
           ("cnt", "tie", "runs", "ov", "sum", "minw", "maxw", "first")}
    for s in range(nP):
        sv = g_valid[s]
        cont = st["has"] & sv & _eq_rows(st["p"], [g[s] for g in g_hp]) \
            if npl else (st["has"] & sv)
        oeq = cont & (_eq_rows(st["o"], [g[s] for g in g_ho])
                      if nol else jnp.bool_(True))
        cin["cnt"].append(jnp.where(cont, st["cnt"], 0))
        cin["tie"].append(jnp.where(oeq, st["tie"], 0))
        cin["runs"].append(jnp.where(cont, st["runs"], 0))
        cin["ov"].append(jnp.where(oeq, 1, 0).astype(jnp.int32))
        cin["sum"].append([jnp.where(cont, x, jnp.zeros((), x.dtype))
                           for x in st["sum"]])
        cin["minw"].append([jnp.where(cont, x, mw)
                            for x, (_, mw, _, _) in
                            zip(st["minw"], col_stats)])
        cin["maxw"].append([jnp.where(cont, x, jnp.zeros((), x.dtype))
                            for x in st["maxw"]])
        cin["first"].append([jnp.where(cont, x, jnp.zeros((), x.dtype))
                             for x in st["first"]])
        # fold shard s into the open-partition state
        acc = cont & g_whole[s]
        tie_acc = oeq & g_whole[s] & g_tiespan[s]
        n_cnt = g_tcnt[s] + jnp.where(acc, st["cnt"], 0)
        n_tie = g_ttie[s] + jnp.where(tie_acc, st["tie"], 0)
        n_runs = g_truns[s] + jnp.where(
            acc, st["runs"] - jnp.where(oeq, 1, 0), 0
        )
        n_sum = [rw[s, 0] + jnp.where(acc, x, jnp.zeros((), x.dtype))
                 for x, (_, _, rw, _) in zip(st["sum"], col_stats)]
        n_minw = [jnp.minimum(wd[s, 0], jnp.where(acc, x, mw))
                  for x, (_, mw, _, wd) in zip(st["minw"], col_stats)]
        n_maxw = [jnp.maximum(wd[s, 1],
                              jnp.where(acc, x, jnp.zeros((), x.dtype)))
                  for x, (_, _, _, wd) in zip(st["maxw"], col_stats)]
        n_first = [jnp.where(acc, x, rw[s, 3])
                   for x, (_, _, rw, _) in zip(st["first"], col_stats)]
        st = {
            "has": st["has"] | sv,
            "p": [jnp.where(sv, g[s], x) for x, g in zip(st["p"], g_tp)],
            "o": [jnp.where(sv, g[s], x) for x, g in zip(st["o"], g_to)],
            "cnt": jnp.where(sv, n_cnt, st["cnt"]),
            "tie": jnp.where(sv, n_tie, st["tie"]),
            "runs": jnp.where(sv, n_runs, st["runs"]),
            "sum": [jnp.where(sv, a, b) for a, b in zip(n_sum, st["sum"])],
            "minw": [jnp.where(sv, a, b)
                     for a, b in zip(n_minw, st["minw"])],
            "maxw": [jnp.where(sv, a, b)
                     for a, b in zip(n_maxw, st["maxw"])],
            "first": [jnp.where(sv, a, b)
                      for a, b in zip(n_first, st["first"])],
        }
    my_cin = {
        k: jnp.stack(vv)[r] for k, vv in cin.items()
        if k in ("cnt", "tie", "runs", "ov")
    }
    my_cin_sum = [jnp.stack([row[c] for row in cin["sum"]])[r]
                  for c in range(nv)]
    my_cin_minw = [jnp.stack([row[c] for row in cin["minw"]])[r]
                   for c in range(nv)]
    my_cin_maxw = [jnp.stack([row[c] for row in cin["maxw"]])[r]
                   for c in range(nv)]
    my_cin_first = [jnp.stack([row[c] for row in cin["first"]])[r]
                    for c in range(nv)]

    # ---- backward carry chain: stats of each shard's TAIL partition over
    # all later shards (for partition-wide aggregates / last_value) ----
    st = {
        "has": jnp.bool_(False),
        "p": [jnp.uint32(0)] * npl,
        "o": [jnp.uint32(0)] * nol,
        "cnt": z32,
        "tie": z32,
        "sum": [jnp.zeros((), vc.dtype) for vc in vals_s],
        "minw": [mw for (_, mw, _, _) in col_stats],
        "maxw": [jnp.zeros((), wc.dtype) for (wc, _, _, _) in col_stats],
        "last": [jnp.zeros((), vc.dtype) for vc in vals_s],
    }
    cout = {k: [None] * nP
            for k in ("cnt", "tie", "sum", "minw", "maxw", "last")}
    for s in range(nP - 1, -1, -1):
        sv = g_valid[s]
        cont = st["has"] & sv & _eq_rows(st["p"], [g[s] for g in g_tp]) \
            if npl else (st["has"] & sv)
        # suffix-head order run continues my tail run iff the order keys
        # also match (mirror of the forward chain's oeq)
        oeq_b = cont & (_eq_rows(st["o"], [g[s] for g in g_to])
                        if nol else jnp.bool_(True))
        cout["cnt"][s] = jnp.where(cont, st["cnt"], 0)
        cout["tie"][s] = jnp.where(oeq_b, st["tie"], 0)
        cout["sum"][s] = [jnp.where(cont, x, jnp.zeros((), x.dtype))
                          for x in st["sum"]]
        cout["minw"][s] = [jnp.where(cont, x, mw)
                           for x, (_, mw, _, _) in
                           zip(st["minw"], col_stats)]
        cout["maxw"][s] = [jnp.where(cont, x, jnp.zeros((), x.dtype))
                           for x in st["maxw"]]
        cout["last"][s] = [jnp.where(cont, x, jnp.zeros((), x.dtype))
                           for x in st["last"]]
        acc = cont & g_whole[s]
        n_cnt = g_hcnt[s] + jnp.where(acc, st["cnt"], 0)
        # shard s's head run keeps accumulating iff one run covers shard s
        # and it ties with the suffix head run
        n_tie_b = g_htie[s] + jnp.where(
            oeq_b & g_htiespan[s], st["tie"], 0
        )
        n_sum = [rw[s, 1] + jnp.where(acc, x, jnp.zeros((), x.dtype))
                 for x, (_, _, rw, _) in zip(st["sum"], col_stats)]
        n_minw = [jnp.minimum(wd[s, 2], jnp.where(acc, x, mw))
                  for x, (_, mw, _, wd) in zip(st["minw"], col_stats)]
        n_maxw = [jnp.maximum(wd[s, 3],
                              jnp.where(acc, x, jnp.zeros((), x.dtype)))
                  for x, (_, _, _, wd) in zip(st["maxw"], col_stats)]
        n_last = [jnp.where(acc, x, rw[s, 4])
                  for x, (_, _, rw, _) in zip(st["last"], col_stats)]
        st = {
            "has": st["has"] | sv,
            "p": [jnp.where(sv, g[s], x) for x, g in zip(st["p"], g_hp)],
            "o": [jnp.where(sv, g[s], x) for x, g in zip(st["o"], g_ho)],
            "cnt": jnp.where(sv, n_cnt, st["cnt"]),
            "tie": jnp.where(sv, n_tie_b, st["tie"]),
            "sum": [jnp.where(sv, a, b) for a, b in zip(n_sum, st["sum"])],
            "minw": [jnp.where(sv, a, b)
                     for a, b in zip(n_minw, st["minw"])],
            "maxw": [jnp.where(sv, a, b)
                     for a, b in zip(n_maxw, st["maxw"])],
            "last": [jnp.where(sv, a, b)
                     for a, b in zip(n_last, st["last"])],
        }
    my_cout_cnt = jnp.stack(cout["cnt"])[r]
    my_cout_tie = jnp.stack(cout["tie"])[r]
    my_cout_sum = [jnp.stack([row[c] for row in cout["sum"]])[r]
                   for c in range(nv)]
    my_cout_minw = [jnp.stack([row[c] for row in cout["minw"]])[r]
                    for c in range(nv)]
    my_cout_maxw = [jnp.stack([row[c] for row in cout["maxw"]])[r]
                    for c in range(nv)]
    my_cout_last = [jnp.stack([row[c] for row in cout["last"]])[r]
                    for c in range(nv)]

    # ---- nth_value: the partition's k-th row under the global order marks
    # its encoded word (global offsets need the forward chain, hence this
    # second tiny replay); a partition-wide max — local segmented + one
    # forward/backward carry per spec — broadcasts it to every row.
    rn_g0 = rn0 + jnp.where(headm, my_cin["cnt"], 0)  # 0-based global
    nth_carry = {}
    for j, (name, vcol, p1, _, _) in enumerate(specs):
        if name != "nth_value":
            continue
        c = val_ids[id(vcol)]
        wc = col_stats[c][0]
        zero = jnp.zeros((), wc.dtype)
        marked = jnp.where(v & (rn_g0 == p1 - 1), wc, zero)
        g_stats = _stack_gather(
            [jnp.max(jnp.where(headm, marked, zero)),
             jnp.max(jnp.where(tailm, marked, zero))],
            axis_name, wc.dtype,
        )  # (P, 2)
        cin_j, cout_j = _word_max_chains(
            g_stats, g_valid, g_whole, g_hp, g_tp, npl, r, num_devices
        )
        seg = jax.ops.segment_max(
            marked, gid, num_segments=cap, indices_are_sorted=True
        )
        nth_carry[j] = jnp.maximum(
            jnp.maximum(seg[gid], jnp.where(headm, cin_j, zero)),
            jnp.where(tailm, cout_j, zero),
        )

    # ---- neighbor halo (rolling frames + lag/lead): frames/offsets reach
    # at most `preceding` rows left and `following` rows right, so one
    # ppermute each way of that many sorted rows (plus partition limbs and
    # validity) from the neighbor shards makes every frame local. A bound
    # exceeding a neighbor's valid row count trips the overflow flag ->
    # exact replicated fallback.
    roll_specs = [s for s in specs if s[0] in W._ROLLING_OPS]
    lag_specs = [s for s in specs if s[0] == "lag"]
    lead_specs = [s for s in specs if s[0] == "lead"]
    range_specs = [s for s in specs if s[0] in W._RANGE_OPS]
    halo_specs = roll_specs + lag_specs + lead_specs + range_specs
    roll_insufficient = jnp.bool_(False)
    rb_state = {"ins": jnp.bool_(False), "cache": {}}
    if halo_specs:
        # row-count needs of the row-offset ops; RANGE adds a FIXED halo
        # of range_halo sorted rows each way (value spans are data-
        # dependent — the halo-edge check below catches insufficiency)
        ph_roll = max([s[2] for s in roll_specs]
                      + [s[2] for s in lag_specs] + [0])
        fh_roll = max([s[3] for s in roll_specs]
                      + [s[2] for s in lead_specs] + [0])
        rh = range_halo if range_specs else 0
        ph, fh = max(ph_roll, rh), max(fh_roll, rh)
        ph_eff, fh_eff = min(ph, cap), min(fh, cap)
        roll_cids = sorted(
            {val_ids[id(s[1])] for s in halo_specs if s[1] is not None}
            | ({order_cid} if range_specs else set())
        )
        vflag = v.astype(jnp.uint32)
        halo_so = list(so) if range_specs else []
        halo_cols = ([vflag, *sp, *halo_so]
                     + [vals_s[c] for c in roll_cids])
        hl = hr = None
        if ph_eff:
            # my LAST ph_eff valid rows -> next shard (left halo there).
            # When cnt < ph_eff the window starts at 0 and carries my
            # exchange-padding junk AFTER the valid rows; roll it so the
            # junk lands at the FAR edge of the receiver's view and my
            # valid rows sit adjacent to its local rows — otherwise the
            # junk would sever every partition run crossing the boundary
            # (silently wrong frames; caught in round-5 review)
            lo_i = jnp.clip(cnt - ph_eff, 0, cap - ph_eff)
            shift = jnp.maximum(ph_eff - cnt, 0)
            perm = [(s, s + 1) for s in range(num_devices - 1)]
            hl = [
                jax.lax.ppermute(
                    jnp.roll(
                        jax.lax.dynamic_slice(x, (lo_i,), (ph_eff,)),
                        shift, axis=0,
                    ),
                    axis_name, perm,
                )
                for x in halo_cols
            ]
        if fh_eff:
            # my FIRST fh_eff rows -> previous shard (right halo there)
            perm = [(s, s - 1) for s in range(1, num_devices)]
            hr = [
                jax.lax.ppermute(x[:fh_eff], axis_name, perm)
                for x in halo_cols
            ]

        def _ext(k):
            x = halo_cols[k]
            if fh_eff:
                # splice the right halo directly after my valid rows so
                # frames stay contiguous across the shard boundary
                x = jnp.concatenate([x, jnp.zeros((fh_eff,), x.dtype)])
                x = jax.lax.dynamic_update_slice(x, hr[k], (cnt,))
            if ph_eff:
                x = jnp.concatenate([hl[k], x])
            return x

        exts = [_ext(k) for k in range(len(halo_cols))]
        inv_ext = (exts[0] == 0).astype(jnp.uint32)
        sp_ext = exts[1:1 + npl]
        nso = len(halo_so)
        so_ext = exts[1 + npl:1 + npl + nso]
        vals_ext = dict(zip(roll_cids, exts[1 + npl + nso:]))
        Lx = cap + ph_eff + fh_eff
        ix = jnp.arange(Lx, dtype=jnp.int32)
        pfx = W._boundary([inv_ext, *sp_ext], Lx)
        plx = jnp.concatenate([pfx[1:], jnp.ones((1,), jnp.bool_)])
        start_x = jax.lax.cummax(jnp.where(pfx, ix, -1))
        pend_x = jax.lax.cummin(jnp.where(plx, ix, _BIG), reverse=True)
        prev_cnt = g_cnt[jnp.maximum(r - 1, 0)]
        next_cnt = g_cnt[jnp.minimum(r + 1, num_devices - 1)]
        ins_l = ((r > 0) & (prev_cnt < ph_roll)) if ph_roll > 0 \
            else jnp.bool_(False)
        ins_r = (((r < num_devices - 1) & (next_cnt < fh_roll))
                 if fh_roll > 0 else jnp.bool_(False))
        roll_insufficient = ins_l | ins_r

    if range_specs:
        # merge-rank data keys over the extended view: junk slots get
        # position-consistent sentinels (left junk is already all-zero
        # from the no-source ppermute fill; right junk forces to MAX) so
        # the extended key array stays globally sorted
        maxu = jnp.asarray(np.iinfo(np.uint32).max, jnp.uint32)
        right_junk = (inv_ext == 1) & (ix >= ph_eff)
        left_junk = (inv_ext == 1) & (ix < ph_eff)
        rb_data = [jnp.where(right_junk, maxu,
                             jnp.where(left_junk, jnp.uint32(0), w))
                   for w in [*sp_ext, *so_ext]]
        ov_x = vals_ext[order_cid]
        fv = jnp.min(jnp.where(inv_ext == 0, ix, _BIG))
        lvx = jnp.max(jnp.where(inv_ext == 0, ix, -1))
        unsigned_ov = jnp.issubdtype(ov_x.dtype, jnp.unsignedinteger)
        local_valid = v

        def _range_bounds_ext(p1, p2):
            """Frame row bounds on the halo-extended view (the
            single-chip _range_bounds over [halo | local | halo]), plus
            the halo-edge insufficiency check: a VALID LOCAL row whose
            partition run starts (ends) at the first (last) visible
            valid slot AND whose frame bound sits on that edge cannot be
            proven complete — its partition may continue in unseen
            shards — and trips the replicated fallback."""
            key = (p1, p2)
            if key in rb_state["cache"]:
                return rb_state["cache"][key]
            d1 = W._range_delta(ov_x, p1)
            lo_v = ov_x - (jnp.minimum(ov_x, d1) if unsigned_ov else d1)
            ws_x = jnp.clip(
                query.merge_rank(rb_data,
                                 [*sp_ext, *K.encode_limbs(lo_v)],
                                 side="left"),
                start_x, pend_x,
            )
            d2 = W._range_delta(ov_x, p2)
            if unsigned_ov:
                room = jnp.array(jnp.iinfo(ov_x.dtype).max,
                                 ov_x.dtype) - ov_x
                d2 = jnp.minimum(room, d2)
            we_x = jnp.clip(
                query.merge_rank(rb_data,
                                 [*sp_ext, *K.encode_limbs(ov_x + d2)],
                                 side="right") - 1,
                start_x, pend_x,
            )
            ins_rows = (((r > 0) & (start_x == fv) & (ws_x == fv))
                        | ((r < num_devices - 1) & (pend_x == lvx)
                           & (we_x == lvx)))
            rb_state["ins"] = rb_state["ins"] | jnp.any(
                ins_rows[ph_eff:ph_eff + cap] & local_valid
            )
            rb_state["cache"][key] = (ws_x, we_x)
            return ws_x, we_x

    # ---- per-spec results on the sorted-local view ----
    headm_i = headm.astype(jnp.int32)
    tailm_i = tailm.astype(jnp.int32)
    results = []
    for j, (name, vcol, p1, p2, fill) in enumerate(specs):
        c = val_ids[id(vcol)] if vcol is not None else None
        if name == "row_number":
            res = rn0 + 1 + headm_i * my_cin["cnt"]
        elif name == "rank":
            run_start = jax.lax.cummax(jnp.where(of, i, -1))
            local = run_start - start + 1
            adj = jnp.where(in_first_run,
                            my_cin["cnt"] - my_cin["tie"], my_cin["cnt"])
            res = local + headm_i * adj
        elif name == "dense_rank":
            rid_start = jax.lax.cummax(jnp.where(pf, rid, 0))
            local = rid - rid_start + 1
            res = local + headm_i * (my_cin["runs"] - my_cin["ov"])
        elif name == "count":
            local = pend - start + 1
            res = (local + headm_i * my_cin["cnt"]
                   + tailm_i * my_cout_cnt)
        elif name == "percent_rank":
            run_start = jax.lax.cummax(jnp.where(of, i, -1))
            local = run_start - start + 1
            adj = jnp.where(in_first_run,
                            my_cin["cnt"] - my_cin["tie"], my_cin["cnt"])
            rank_g = local + headm_i * adj
            cnt_g = (pend - start + 1 + headm_i * my_cin["cnt"]
                     + tailm_i * my_cout_cnt)
            denom = jnp.maximum(cnt_g - 1, 1).astype(jnp.float32)
            res = jnp.where(
                cnt_g > 1, (rank_g - 1).astype(jnp.float32) / denom, 0.0
            )
        elif name == "cume_dist":
            order_last = jnp.concatenate(
                [of[1:], jnp.ones((1,), jnp.bool_)]
            )
            run_end = jax.lax.cummin(
                jnp.where(order_last, i, _BIG), reverse=True
            )
            in_last_run = (rid == rid_last).astype(jnp.int32)
            peers = (run_end - start + 1 + headm_i * my_cin["cnt"]
                     + in_last_run * my_cout_tie)
            cnt_g = (pend - start + 1 + headm_i * my_cin["cnt"]
                     + tailm_i * my_cout_cnt)
            res = (peers.astype(jnp.float32)
                   / jnp.maximum(cnt_g, 1).astype(jnp.float32))
        elif name == "ntile":
            rn_g = rn0 + headm_i * my_cin["cnt"]  # 0-based global
            cnt_g = (pend - start + 1 + headm_i * my_cin["cnt"]
                     + tailm_i * my_cout_cnt)
            base = cnt_g // p1
            extra = cnt_g % p1
            thr = extra * (base + 1)
            tile = jnp.where(
                rn_g < thr,
                rn_g // (base + 1),
                extra + (rn_g - thr) // jnp.maximum(base, 1),
            )
            res = tile.astype(jnp.int32) + 1
        elif name in W._RANGE_OPS:
            ws_x, we_x = _range_bounds_ext(p1, p2)
            if name == "range_count":
                res_x = (we_x - ws_x + 1).astype(jnp.int32)
            elif name in ("range_min", "range_max"):
                svx = vals_ext[c]
                wcx = K.encode(svx)
                if name == "range_min":
                    identr = jnp.array(jnp.iinfo(wcx.dtype).max,
                                       wcx.dtype)
                    combr = jnp.minimum
                else:
                    identr = jnp.array(0, wcx.dtype)
                    combr = jnp.maximum
                # frame lengths are data-dependent: full sparse table
                tables = W._pow2_tables(wcx, Lx, combr, identr)
                a, b = W._rolling_two_windows(tables, ws_x, we_x)
                res_x = K.decode(combr(a, b), svx.dtype)
            else:  # range_sum / range_mean
                svx = vals_ext[c]
                if jnp.issubdtype(svx.dtype, jnp.floating):
                    tables = W._pow2_tables(svx, Lx, jnp.add,
                                            svx.dtype.type(0))
                    s_x = W._binary_decomp_sum(tables, ws_x, we_x,
                                               svx.dtype.type(0))
                else:
                    csum = jnp.cumsum(svx)
                    prev = jnp.where(
                        ws_x > 0, csum[jnp.maximum(ws_x - 1, 0)], 0
                    )
                    s_x = csum[we_x] - prev
                if name == "range_mean":
                    mdt = W._mean_dt(svx.dtype)
                    s_x = (s_x.astype(mdt)
                           / (we_x - ws_x + 1).astype(mdt))
                res_x = s_x
            res = res_x[ph_eff:ph_eff + cap]
        elif name in W._ROLLING_OPS:
            ws = jnp.maximum(start_x, ix - p1)
            we = jnp.minimum(pend_x, ix + p2)
            max_len = p1 + p2 + 1
            if name == "rolling_count":
                res_x = (we - ws + 1).astype(jnp.int32)
            elif name in ("rolling_min", "rolling_max"):
                svx = vals_ext[c]
                wcx = K.encode(svx)
                if name == "rolling_min":
                    ident = jnp.asarray(
                        np.iinfo(np.dtype(wcx.dtype)).max, wcx.dtype
                    )
                    comb = jnp.minimum
                else:
                    ident = jnp.zeros((), wcx.dtype)
                    comb = jnp.maximum
                tables = W._pow2_tables(wcx, max_len, comb, ident)
                a, b = W._rolling_two_windows(tables, ws, we)
                res_x = K.decode(comb(a, b), svx.dtype)
            else:  # rolling_sum / rolling_mean
                svx = vals_ext[c]
                if jnp.issubdtype(svx.dtype, jnp.floating):
                    tables = W._pow2_tables(
                        svx, max_len, jnp.add, svx.dtype.type(0)
                    )
                    s_x = W._binary_decomp_sum(
                        tables, ws, we, svx.dtype.type(0)
                    )
                else:
                    csum = jnp.cumsum(svx)
                    prev = jnp.where(
                        ws > 0, csum[jnp.maximum(ws - 1, 0)], 0
                    )
                    s_x = csum[we] - prev
                if name == "rolling_mean":
                    mdt = W._mean_dt(svx.dtype)
                    s_x = s_x.astype(mdt) / (we - ws + 1).astype(mdt)
                res_x = s_x
            res = res_x[ph_eff:ph_eff + cap]
        elif name in ("sum", "mean"):
            sv = vals_s[c]
            seg = jax.ops.segment_sum(
                sv, gid, num_segments=cap, indices_are_sorted=True
            )
            total = (seg[gid]
                     + jnp.where(headm, my_cin_sum[c],
                                 jnp.zeros((), sv.dtype))
                     + jnp.where(tailm, my_cout_sum[c],
                                 jnp.zeros((), sv.dtype)))
            if name == "mean":
                mdt = W._mean_dt(sv.dtype)
                cnt_adj = (pend - start + 1 + headm_i * my_cin["cnt"]
                           + tailm_i * my_cout_cnt)
                total = total.astype(mdt) / cnt_adj.astype(mdt)
            res = total
        elif name in ("min", "max"):
            sv = vals_s[c]
            wc, maxw, _, _ = col_stats[c]
            if name == "min":
                seg = jax.ops.segment_min(
                    wc, gid, num_segments=cap, indices_are_sorted=True
                )
                wres = jnp.minimum(
                    jnp.minimum(seg[gid],
                                jnp.where(headm, my_cin_minw[c], maxw)),
                    jnp.where(tailm, my_cout_minw[c], maxw),
                )
            else:
                zero = jnp.zeros((), wc.dtype)
                seg = jax.ops.segment_max(
                    wc, gid, num_segments=cap, indices_are_sorted=True
                )
                wres = jnp.maximum(
                    jnp.maximum(seg[gid],
                                jnp.where(headm, my_cin_maxw[c], zero)),
                    jnp.where(tailm, my_cout_maxw[c], zero),
                )
            res = K.decode(wres, sv.dtype)
        elif name == "cumsum":
            sv = vals_s[c]
            if jnp.issubdtype(sv.dtype, jnp.floating):
                run = W._seg_scan(sv, rn0, jnp.add, sv.dtype.type(0))
            else:
                csum = jnp.cumsum(sv)
                before = jnp.where(
                    start > 0, csum[jnp.maximum(start - 1, 0)], 0
                )
                run = csum - before
            res = run + jnp.where(headm, my_cin_sum[c],
                                  jnp.zeros((), sv.dtype))
        elif name in ("cummin", "cummax"):
            sv = vals_s[c]
            wc, maxw, _, _ = col_stats[c]
            if name == "cummin":
                run = W._seg_scan(wc, rn0, jnp.minimum, maxw)
                wres = jnp.minimum(
                    run, jnp.where(headm, my_cin_minw[c], maxw)
                )
            else:
                zero = jnp.zeros((), wc.dtype)
                run = W._seg_scan(wc, rn0, jnp.maximum, zero)
                wres = jnp.maximum(
                    run, jnp.where(headm, my_cin_maxw[c], zero)
                )
            res = K.decode(wres, sv.dtype)
        elif name == "first_value":
            sv = vals_s[c]
            res = jnp.where(headm & (my_cin["cnt"] > 0),
                            my_cin_first[c], sv[start])
        elif name == "nth_value":
            sv = vals_s[c]
            fill_v = (sv.dtype.type(0) if fill is None
                      else jnp.asarray(fill, sv.dtype))
            cnt_g = (pend - start + 1 + headm_i * my_cin["cnt"]
                     + tailm_i * my_cout_cnt)
            res = jnp.where(cnt_g >= p1,
                            K.decode(nth_carry[j], sv.dtype), fill_v)
        elif name in ("lag", "lead"):
            svx = vals_ext[c]
            fill_v = (svx.dtype.type(0) if fill is None
                      else jnp.asarray(fill, svx.dtype))
            if name == "lag":
                idx_x = ix - p1
                okx = idx_x >= start_x
            else:
                idx_x = ix + p1
                okx = idx_x <= pend_x
            res_x = jnp.where(
                okx, svx[jnp.clip(idx_x, 0, Lx - 1)], fill_v
            )
            res = res_x[ph_eff:ph_eff + cap]
        else:  # last_value
            sv = vals_s[c]
            res = jnp.where(tailm & (my_cout_cnt > 0),
                            my_cout_last[c], sv[jnp.minimum(pend, cap - 1)])
        results.append(jnp.where(v, res, jnp.zeros((), res.dtype)))

    # ---- route results home by original position ----
    fake = inv  # 1 on exchange padding
    home_last = (r + 1) * np.uint32(n_local) - np.uint32(1)
    gpos2 = jnp.where(v, gpos_s, home_last)
    ow2, ov2, cnt2, ovf2 = dist_sort._local_exchange(
        [gpos2, fake], results, axis_name, num_devices, cap2,
        np.uint32(np.iinfo(np.uint32).max), splitters=splitters_back,
    )
    outs = [x[:n_local] for x in (ov2 if isinstance(ov2, list) else [ov2])]
    ovf = (ovf1[0] | ovf2[0] | roll_insufficient
           | rb_state["ins"]).reshape(1)
    return (*outs, ovf)
