"""SQL window functions (OVER PARTITION BY ... ORDER BY ...).

The reference crate is sort-only; window functions are part of the
north-star query surface this framework adds (BASELINE.json). On a vector
machine the classic row-at-a-time window evaluation serializes; the
massively-parallel equivalent is the same recipe as the other operators in
:mod:`radix_sort_tpu.ops.query`:

  1. ONE stable variadic sort by (partition limbs, order limbs) with the
     original position and every value column riding along;
  2. vectorized segment math on the sorted view — partition starts/ends via
     boundary flags + ``cummax``/reverse ``cummin`` forward/backward fills,
     exact integer prefix-sum differences, ``jax.ops.segment_*`` for
     partition-wide float reductions, and a log-step (Hillis–Steele)
     segmented scan for running float sums / running min / max (24
     elementwise sweeps at 16M — cheap next to the sorts, and avoids
     ``lax.associative_scan``, which does not compile at scale on the
     target relay);
  3. ONE stable restore sort by original position.

All requested window columns share the two sorts. Ties in ``order_by``
(and rows with no ``order_by``) keep their input order — the sort is
stable, so results are deterministic (stronger than SQL's unspecified
tie order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from radix_sort_tpu import keys as K

__all__ = ["window", "WINDOW_OPS"]

# value-less rank/count ops and value ops (partition-wide vs running)
_RANK_OPS = ("row_number", "rank", "dense_rank", "count")
_VALUE_OPS = (
    "sum", "min", "max", "mean",          # partition-wide, broadcast to rows
    "cumsum", "cummin", "cummax",         # running (rows up to and incl. self)
    "first_value", "last_value",          # partition first/last under order
    "lag", "lead",                        # shifted within partition
)
WINDOW_OPS = _RANK_OPS + _VALUE_OPS


def _normalize_spec(spec):
    """spec -> (name, values|None, offset, fill)."""
    if isinstance(spec, str):
        name, rest = spec, ()
    elif isinstance(spec, tuple) and spec and isinstance(spec[0], str):
        name, rest = spec[0], tuple(spec[1:])
    else:
        raise ValueError(
            f"bad window op spec: {spec!r} (a spec is a name string or a "
            "(name, values, ...) tuple; pass several specs as a list)"
        )
    if name not in WINDOW_OPS:
        raise ValueError(f"op must be one of {WINDOW_OPS}, got {name!r}")
    if name in _RANK_OPS:
        if rest:
            raise ValueError(f"{name!r} takes no value column")
        return name, None, 1, None
    if not rest:
        raise ValueError(f"{name!r} needs a value column: ({name!r}, values)")
    values, rest = rest[0], rest[1:]
    offset, fill = 1, None
    if name in ("lag", "lead"):
        if rest:
            offset, rest = int(rest[0]), rest[1:]
            if offset < 1:
                raise ValueError(f"{name!r} offset must be >= 1")
        if rest:
            fill, rest = rest[0], rest[1:]
    if rest:
        raise ValueError(f"too many arguments for {name!r}: {spec!r}")
    return name, values, offset, fill


def _cols_to_limbs(cols):
    limbs = []
    for c in cols:
        limbs.extend(K.encode_limbs(c))
    return limbs


def _limbs_differ(limbs_a, limbs_b):
    d = limbs_a[0] != limbs_b[0]
    for a, b in zip(limbs_a[1:], limbs_b[1:]):
        d = d | (a != b)
    return d


def _boundary(limbs, n):
    """first-row-of-run flags for consecutive equal rows of a limb list."""
    if not limbs:
        return jnp.zeros((n,), jnp.bool_).at[0].set(True)
    return jnp.concatenate(
        [jnp.ones((1,), jnp.bool_),
         _limbs_differ([w[1:] for w in limbs], [w[:-1] for w in limbs])]
    )


def _shift_back(arr, s, fill):
    return jnp.concatenate([jnp.full((s,), fill, arr.dtype), arr[:-s]])


def _seg_scan(vals, rn0, combine, identity):
    """Inclusive segmented scan (Hillis–Steele doubling): position i gets
    combine over its partition's rows [start, i]. ``rn0`` is the 0-based
    offset within the partition; an element ``s`` back is in-partition iff
    ``rn0 >= s``. log2(n) unrolled elementwise sweeps — no associative_scan
    (which fails to compile at 16M on the axon relay, scratch/NOTES.md)."""
    n = vals.shape[0]
    w = vals
    s = 1
    while s < n:
        prev = _shift_back(w, s, identity)
        w = jnp.where(rn0 >= s, combine(w, prev), w)
        s *= 2
    return w


def _mean_dt(dt):
    return jnp.float64 if dt == jnp.float64 else jnp.float32


def window(ops, *, partition_by=None, order_by=None):
    """Evaluate window functions over partitions.

    ``ops`` is one spec or a list of specs, each:

      - ``"row_number"`` — 1-based position within the partition in
        ``order_by`` order (ties broken by input order; deterministic);
      - ``"rank"`` / ``"dense_rank"`` — SQL semantics over ``order_by``
        ties (with no ``order_by`` every row ranks 1);
      - ``"count"`` — partition size, broadcast to every row;
      - ``(agg, values)`` with agg in sum/min/max/mean — partition-wide
        aggregate broadcast to every row;
      - ``("cumsum"|"cummin"|"cummax", values)`` — running aggregate over
        the partition's rows up to and including the current row;
      - ``("first_value"|"last_value", values)`` — the partition's
        first/last row's value under ``order_by``;
      - ``("lag"|"lead", values[, offset[, fill]])`` — the value ``offset``
        rows back/ahead within the partition (default offset 1, fill 0).

    ``partition_by`` / ``order_by``: None, a column, or a list of columns
    (any supported dtype mix; multi-column keys order lexicographically).
    With ``partition_by=None`` the whole input is one partition.

    Returns one array per spec (a single array if ``ops`` was a single
    spec), aligned with the INPUT row order. Integer sums are exact
    (modular); float partition sums use an independent per-group
    segmented reduction (ULP(group_sum) accuracy); float running sums use
    a log-depth segmented scan (tree-reduction accuracy, better than the
    global prefix-difference trick's cancellation).
    """
    single = isinstance(ops, (str, tuple))
    specs = [_normalize_spec(ops)] if single else [
        _normalize_spec(s) for s in ops
    ]
    if not specs:
        raise ValueError("ops must contain at least one window op")

    p_cols = ([] if partition_by is None else
              list(partition_by) if isinstance(partition_by, (list, tuple))
              else [partition_by])
    o_cols = ([] if order_by is None else
              list(order_by) if isinstance(order_by, (list, tuple))
              else [order_by])

    # infer n and validate lengths
    n = None
    for c in p_cols + o_cols + [s[1] for s in specs if s[1] is not None]:
        if n is None:
            n = c.shape[0]
        elif c.shape[0] != n:
            raise ValueError("all partition/order/value columns must have "
                             "equal length")
    if n is None:
        raise ValueError("window needs at least one column to infer length "
                         "(partition_by, order_by, or a value column)")

    def _out_dt(name, values):
        if name in _RANK_OPS:
            return jnp.int32
        if name == "mean":
            return _mean_dt(values.dtype)
        return values.dtype

    if n == 0:
        outs = [jnp.zeros((0,), _out_dt(nm, v)) for nm, v, _, _ in specs]
        return outs[0] if single else outs

    p_limbs = _cols_to_limbs(p_cols)
    o_limbs = _cols_to_limbs(o_cols)

    # one stable sort by (partition, order); position + value columns ride
    pos = jnp.arange(n, dtype=jnp.int32)
    val_ids, val_arrays = {}, []
    for _, v, _, _ in specs:
        if v is not None and id(v) not in val_ids:
            val_ids[id(v)] = len(val_arrays)
            val_arrays.append(v)
    nk = len(p_limbs) + len(o_limbs)
    if nk:
        out = jax.lax.sort(
            [*p_limbs, *o_limbs, pos, *val_arrays],
            num_keys=nk, is_stable=True,
        )
        sp = list(out[:len(p_limbs)])
        so = list(out[len(p_limbs):nk])
        pos_s = out[nk]
        vals_s = list(out[nk + 1:])
    else:
        sp, so, pos_s, vals_s = [], [], pos, val_arrays

    i = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(2**31 - 1)
    part_first = _boundary(sp, n)
    part_last = jnp.concatenate([part_first[1:], jnp.ones((1,), jnp.bool_)])
    start = jax.lax.cummax(jnp.where(part_first, i, -1))
    pend = jax.lax.cummin(jnp.where(part_last, i, big), reverse=True)
    rn0 = i - start
    gid = jnp.cumsum(part_first.astype(jnp.int32)) - 1

    # (partition, order) run boundaries for rank/dense_rank
    order_first = part_first | _boundary(so, n) if so else part_first

    def _sv(spec_v):
        return vals_s[val_ids[id(spec_v)]]

    results = []
    for name, v, offset, fill in specs:
        if name == "row_number":
            results.append(rn0 + 1)
        elif name == "rank":
            run_start = jax.lax.cummax(jnp.where(order_first, i, -1))
            results.append(run_start - start + 1)
        elif name == "dense_rank":
            rid = jnp.cumsum(order_first.astype(jnp.int32))
            rid_start = jax.lax.cummax(jnp.where(part_first, rid, 0))
            results.append(rid - rid_start + 1)
        elif name == "count":
            results.append(pend - start + 1)
        elif name in ("sum", "mean", "cumsum"):
            sv = _sv(v)
            is_float = jnp.issubdtype(sv.dtype, jnp.floating)
            if name == "cumsum":
                if is_float:
                    run = _seg_scan(sv, rn0, jnp.add, sv.dtype.type(0))
                else:
                    csum = jnp.cumsum(sv)
                    before = jnp.where(
                        start > 0, csum[jnp.maximum(start - 1, 0)], 0
                    )
                    run = csum - before  # exact under modular arithmetic
                results.append(run)
                continue
            if is_float:
                seg = jax.ops.segment_sum(
                    sv, gid, num_segments=n, indices_are_sorted=True
                )
                total = seg[gid]
            else:
                csum = jnp.cumsum(sv)
                before = jnp.where(
                    start > 0, csum[jnp.maximum(start - 1, 0)], 0
                )
                total = csum[pend] - before
            if name == "mean":
                mdt = _mean_dt(sv.dtype)
                cnt = (pend - start + 1).astype(mdt)
                total = total.astype(mdt) / cnt
            results.append(total)
        elif name in ("min", "max"):
            sv = _sv(v)
            w = K.encode(sv)
            seg = (jax.ops.segment_min if name == "min"
                   else jax.ops.segment_max)(
                w, gid, num_segments=n, indices_are_sorted=True
            )
            results.append(K.decode(seg[gid], sv.dtype))
        elif name in ("cummin", "cummax"):
            sv = _sv(v)
            w = K.encode(sv)
            ident = (jnp.iinfo(w.dtype).max if name == "cummin"
                     else jnp.array(0, w.dtype))
            comb = jnp.minimum if name == "cummin" else jnp.maximum
            run = _seg_scan(w, rn0, comb, ident)
            results.append(K.decode(run, sv.dtype))
        elif name == "first_value":
            sv = _sv(v)
            results.append(sv[start])
        elif name == "last_value":
            sv = _sv(v)
            results.append(sv[pend])
        else:  # lag / lead
            sv = _sv(v)
            fill_v = sv.dtype.type(0) if fill is None else jnp.asarray(
                fill, sv.dtype
            )
            k = min(offset, n)
            if name == "lag":
                shifted = _shift_back(sv, k, fill_v)
                ok = rn0 >= k
            else:
                shifted = jnp.concatenate(
                    [sv[k:], jnp.full((k,), fill_v, sv.dtype)]
                )
                ok = i + k <= pend
            results.append(jnp.where(ok, shifted, fill_v))

    if nk:
        out = jax.lax.sort([pos_s, *results], num_keys=1, is_stable=True)
        results = list(out[1:])
    return results[0] if single else results
