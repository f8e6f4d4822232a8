"""Benchmark demo CLI — the reference's `cargo run -r` path rebuilt for TPU.

Reproduces the measurement protocols of src/main.rs:

  - main.rs:101-127 (main): a GB sweep per row type; fresh rows per run;
    mean wall-clock per size. Extras: selectable distribution, keys/s and
    GB/s columns.
  - main.rs:36-45 (bench_sorts): SEVERAL engines timed on clones of the SAME
    data — `--engines comparator pallas` prints a side-by-side table.
  - main.rs:47-81 (bench_sorts_data) + main.rs:83-99 (gen_data): persist a
    dataset once (`--gen-data file.raw --n ...`), bench it repeatedly and
    bit-identically (`--data file.raw`).

Run:  python -m radix_sort_tpu.demo --sizes 0.5 1.0 --dtypes u32 u64 --runs 5
      python -m radix_sort_tpu.demo --gen-data /tmp/d.raw --n 1e8 --dist zipf
      python -m radix_sort_tpu.demo --data /tmp/d.raw --engines comparator pallas
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--sizes", type=float, nargs="+",
        default=[0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0],
        help="data sizes in GB (element count = GB*1e9/rowbytes, main.rs:24)",
    )
    p.add_argument("--dtypes", nargs="+", default=["u32", "u64"],
                   choices=["u32", "u64"], help="key/payload word width")
    p.add_argument("--runs", type=int, default=5, help="runs per size (main.rs:102)")
    p.add_argument("--dist", default="uniform",
                   choices=["uniform", "zipf", "geometric", "step_uniform"])
    p.add_argument("--zipf-s", type=float, default=1.1)
    p.add_argument("--steps", type=int, default=1000,
                   help="distinct values for step_uniform")
    p.add_argument("--implementation", default=None,
                   help="single engine (legacy alias for --engines X)")
    p.add_argument("--engines", nargs="+", default=None,
                   help="engines timed side-by-side on clones of the same "
                        "data (main.rs:36-42), e.g. comparator pallas")
    p.add_argument("--data", default=None, metavar="FILE.raw",
                   help="bench keys from a persisted dataset "
                        "(utils.io.read_raw; main.rs:47-81)")
    p.add_argument("--gen-data", default=None, metavar="FILE.raw",
                   help="generate+persist a dataset, then exit (main.rs:83-99)")
    p.add_argument("--n", type=float, default=None,
                   help="element count for --gen-data")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--suite", default="sort",
                   choices=["sort", "ops", "queries"],
                   help="sort = the reference GB sweep (default); ops = "
                        "query-operator throughputs (window / rolling / "
                        "asof join / holistic aggregates / hash join) at "
                        "--ops-n rows; queries = end-to-end SQL analytics "
                        "(TPC-H-shaped Q1/Q3/window) through the planner")
    p.add_argument("--ops-n", type=float, default=float(1 << 24),
                   help="row count for --suite ops")
    p.add_argument("--groups", type=float, default=float(1 << 20),
                   help="group/partition count for --suite ops")
    return p.parse_args(argv)


def _gen_keys(key, n, dtype, args):
    from radix_sort_tpu.utils import distributions as D

    if args.dist == "uniform":
        return D.key_uniform(key, n, dtype)
    if args.dist == "zipf":
        return D.zipf(key, n, dtype, s=args.zipf_s)
    if args.dist == "geometric":
        return D.geometric(key, n, dtype=dtype)
    return D.step_uniform(key, n, args.steps, dtype)


def _gen_limbs(key, n, args):
    from radix_sort_tpu.utils import distributions as D

    if args.dist == "uniform":
        return D.key_uniform_limbs(key, n)
    if args.dist == "zipf":
        return D.zipf_limbs(key, n, s=args.zipf_s)
    if args.dist == "geometric":
        return D.geometric_limbs(key, n)
    return D.step_uniform_limbs(key, n, args.steps)


def _engine_fns(dt_name, engines, donate=False):
    """One jitted packed-rows -> packed-sorted closure per engine name.

    Rows travel as ONE stacked array each way: the axon relay charges ~29 ms
    per input/output buffer per dispatch (scratch/NOTES.md), which would
    otherwise dominate the measurement. ``donate`` frees the packed input
    for the output (the 4.0 GB sweep point needs it to fit HBM) — only
    safe when each buffer is sorted exactly once, i.e. a single engine."""
    from radix_sort_tpu.ops import pallas_sort
    import radix_sort_tpu as rst

    fns = {}
    for eng in engines:
        if dt_name == "u64":
            # device-native u64 path: (hi, lo) u32 limb pairs end to end;
            # "auto" passes through so sort_pairs_limbs resolves it from the
            # active config's default engine
            limb_eng = {"pallas": "sample", "comparator": "comparator",
                        "auto": "auto"}.get(eng)
            if limb_eng is None:
                raise SystemExit(f"u64 rows support comparator/pallas, not {eng!r}")
            fns[eng] = jax.jit(
                lambda p, e=limb_eng: jnp.stack(
                    pallas_sort.sort_pairs_limbs(p[0], p[1], p[2], p[3], engine=e)
                ),
                donate_argnums=(0,) if donate else (),
            )
        else:
            fns[eng] = jax.jit(
                lambda p, e=eng: jnp.stack(
                    rst.sort_pairs(p[0], p[1], implementation=e)
                ),
                donate_argnums=(0,) if donate else (),
            )
    return fns


def _queries_suite(args):
    """End-to-end SQL analytics throughput: TPC-H-shaped queries compiled
    by the SQL frontend onto the lazy planner and jitted whole (the Table
    verbs are traceable; one packed buffer each way per dispatch)."""
    import radix_sort_tpu as rst
    from radix_sort_tpu.sql import sql
    from radix_sort_tpu.table import Table
    from radix_sort_tpu.utils.timing import sync

    n = int(args.ops_n)
    n_c = max(8, n // 16)
    runs = args.runs
    rng = np.random.default_rng(args.seed)
    as_u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)
    as_f32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
    as_i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)

    from radix_sort_tpu.dates import parse_date

    d_lo, d_hi = parse_date("2024-01-01"), parse_date("2027-01-01")
    line = jnp.asarray(np.stack([
        rng.integers(0, 8, n).astype(np.uint32),           # status
        rng.integers(1, 51, n).astype(np.uint32),          # qty
        (rng.random(n) * 1000).astype(np.float32).view(np.uint32),
        (rng.random(n) * 0.1).astype(np.float32).view(np.uint32),
        rng.integers(0, n_c, n).astype(np.uint32),         # custkey
        rng.integers(d_lo, d_hi, n).astype(np.uint32),     # shipdate
    ]))
    cust = jnp.asarray(np.stack([
        np.arange(n_c, dtype=np.uint32),                   # custkey
        rng.integers(0, 5, n_c).astype(np.uint32),         # mktseg
    ]))

    def timed(fn, *bufs):
        sync(fn(*bufs))
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            sync(fn(*bufs))
            ts.append(time.perf_counter() - t0)
        return float(np.mean(ts))

    def report(name, rows, dt):
        print(f"{name:45s} {dt*1e3:9.1f} ms   {rows/dt/1e6:8.1f} M rows/s")

    print(f"backend={jax.default_backend()} lineitem={n:,} "
          f"customers={n_c:,} runs={runs}")

    @jax.jit
    def q1(p):
        t = Table({"status": p[0], "qty": as_i32(p[1]),
                   "price": as_f32(p[2]), "disc": as_f32(p[3])})
        out = sql(
            "SELECT status, COUNT(*) AS n, SUM(qty) AS sq, "
            "SUM(price * (1 - disc)) AS rev, AVG(qty) AS aq "
            "FROM l WHERE qty < 45 GROUP BY status ORDER BY status",
            {"l": t}, max_groups=8,
        ).collect()
        return jnp.stack([out["status"], as_u32(out["n"].astype(jnp.int32)),
                          as_u32(out["sq"].astype(jnp.int32)),
                          as_u32(out["rev"].astype(jnp.float32)),
                          as_u32(out["aq"].astype(jnp.float32))])

    report("Q1 pricing summary (filter+group+4 aggs)", n, timed(q1, line))

    @jax.jit
    def q3(p, c):
        t = Table({"custkey": p[4], "price": as_f32(p[2])})
        ct = Table({"custkey": c[0], "mktseg": c[1]})
        out = sql(
            "SELECT custkey, SUM(price) AS rev FROM l "
            "JOIN c USING (custkey) WHERE mktseg = 2 "
            "GROUP BY custkey ORDER BY rev DESC LIMIT 10",
            {"l": t, "c": ct}, capacity=n, max_groups=n_c,
        ).collect()
        return jnp.stack([out["custkey"],
                          as_u32(out["rev"].astype(jnp.float32))])

    report("Q3 revenue top-10 (join+group+topk)", n, timed(q3, line, cust))

    @jax.jit
    def qwin(p):
        t = Table({"custkey": p[4], "price": as_f32(p[2])})
        out = sql(
            "SELECT custkey, price, "
            "RANK() OVER (PARTITION BY custkey ORDER BY price DESC) AS r, "
            "SUM(price) OVER (PARTITION BY custkey) AS tot "
            "FROM l", {"l": t},
        ).collect()
        return jnp.stack([out["custkey"], as_u32(out["r"].astype(jnp.int32)),
                          as_u32(out["tot"].astype(jnp.float32))])

    report("window rank + partition total over 1/16 parts", n,
           timed(qwin, line))

    @jax.jit
    def qsub(p, c):
        t = Table({"custkey": p[4], "qty": as_i32(p[1])})
        ct = Table({"custkey": c[0], "mktseg": c[1]})
        out = sql(
            "SELECT custkey FROM l WHERE qty > 40 AND custkey IN "
            "(SELECT custkey FROM c WHERE mktseg < 2)",
            {"l": t, "c": ct},
        ).collect()
        return out["custkey"]

    report("IN-subquery semi join (filter+semi)", n, timed(qsub, line, cust))

    @jax.jit
    def qdate(p):
        t = Table({"d": as_i32(p[5]), "price": as_f32(p[2])})
        out = sql(
            "SELECT DATE_TRUNC('month', d) AS mo, COUNT(*) AS cnt, "
            "SUM(price) AS rev FROM l "
            "WHERE d >= DATE '2025-01-01' AND d < DATE '2026-01-01' "
            "GROUP BY DATE_TRUNC('month', d) ORDER BY mo",
            {"l": t}, max_groups=16,
        ).collect()
        return jnp.stack([as_u32(out["mo"]),
                          as_u32(out["cnt"].astype(jnp.int32)),
                          as_u32(out["rev"].astype(jnp.float32))])

    report("date filter + DATE_TRUNC month group", n, timed(qdate, line))

    @jax.jit
    def qrollup(p):
        t = Table({"status": p[0], "qty": as_i32(p[1]),
                   "d": as_i32(p[5])})
        out = sql(
            "SELECT status, COUNT(*) AS cnt, SUM(qty) AS s FROM l "
            "GROUP BY ROLLUP(status, YEAR(d))",
            {"l": t}, max_groups=64,
        ).collect()
        return jnp.stack([out["status"],
                          as_u32(out["cnt"].astype(jnp.int32)),
                          as_u32(out["s"].astype(jnp.int32))])

    report("ROLLUP(status, YEAR(d)) 3-level aggregate", n,
           timed(qrollup, line))

    @jax.jit
    def qunion(p):
        t = Table({"status": p[0], "qty": as_i32(p[1])})
        out = sql(
            "SELECT status, COUNT(*) AS n FROM "
            "(SELECT status FROM l WHERE qty < 10 "
            "UNION ALL SELECT status FROM l WHERE qty >= 45) "
            "GROUP BY status ORDER BY status",
            {"l": t}, max_groups=8,
        ).collect()
        return jnp.stack([out["status"],
                          as_u32(out["n"].astype(jnp.int32))])

    report("UNION ALL of two filtered scans + group", 2 * n,
           timed(qunion, line))

    # 4 contact rows per customer: the inner join has fanout 4, so the
    # naive plan materializes a 4n-row join before grouping — the
    # eager-aggregation rewrite (plan._eager_join_aggregate) never
    # expands (lookup join + multiplicity scaling), exact at any fanout
    cont = jnp.asarray(np.stack([
        np.repeat(np.arange(n_c, dtype=np.uint32), 4),
        rng.integers(0, 5, 4 * n_c).astype(np.uint32),
    ]))

    @jax.jit
    def qfan(p, co):
        t = Table({"custkey": p[4], "price": as_f32(p[2])})
        ct = Table({"custkey": co[0], "region": co[1]})
        out = sql(
            "SELECT custkey, SUM(price) AS rev, COUNT(*) AS cnt FROM l "
            "JOIN c USING (custkey) GROUP BY custkey "
            "ORDER BY rev DESC LIMIT 10",
            {"l": t, "c": ct}, capacity=4 * n, max_groups=n_c,
        ).collect()
        return jnp.stack([out["custkey"],
                          as_u32(out["rev"].astype(jnp.float32)),
                          as_u32(out["cnt"].astype(jnp.int32))])

    report("fanout-4 join + group (eager-agg rewrite)", n,
           timed(qfan, line, cont))

    n_w = 1024
    wvocab = np.sort(np.array(
        [f"w{i:04d}" for i in rng.permutation(n_w)], dtype=np.str_))
    wcodes = jnp.asarray(rng.integers(1, n_w, n).astype(np.uint32))

    @jax.jit
    def qstr(codes, p):
        t = Table({"w": codes, "qty": as_i32(p[1])},
                  dictionaries={"w": wvocab})
        out = sql(
            "SELECT UPPER(w) AS u, COUNT(*) AS cnt FROM l "
            "WHERE w LIKE 'w0%' AND CONTAINS(w, '1') "
            "GROUP BY UPPER(w) ORDER BY cnt DESC LIMIT 20",
            {"l": t}, max_groups=2 * n_w,
        ).collect()
        return jnp.stack([out["u"], as_u32(out["cnt"].astype(jnp.int32))])

    report("string fns: LIKE+CONTAINS filter, UPPER group", n,
           timed(qstr, wcodes, line))


def _ops_suite(args):
    """Query-operator throughput table (one packed buffer each way — the
    relay's ~29 ms/buffer dispatch charge would otherwise dominate)."""
    import radix_sort_tpu as rst
    from radix_sort_tpu.utils.timing import sync

    n = int(args.ops_n)
    g = max(1, int(args.groups))
    runs = args.runs
    rng = np.random.default_rng(args.seed)
    as_i32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)

    def timed(fn, packed):
        sync(fn(packed))  # compile + warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            sync(fn(packed))
            ts.append(time.perf_counter() - t0)
        return float(np.mean(ts))

    def report(name, rows, dt):
        print(f"{name:45s} {dt*1e3:9.1f} ms   {rows/dt/1e6:8.1f} M rows/s")

    print(f"backend={jax.default_backend()} n={n:,} groups={g:,} runs={runs}")

    k = rng.integers(0, g, n).astype(np.uint32)
    o = rng.integers(0, 1 << 31, n).astype(np.uint32)
    v = rng.integers(-1000, 1000, n).astype(np.int32)
    packed = jnp.asarray(np.stack([k, o, v.view(np.uint32)]))

    @jax.jit
    def win(x):
        outs = rst.window(
            ["rank", ("cumsum", as_i32(x[2])), ("sum", as_i32(x[2]))],
            partition_by=x[0], order_by=x[1],
        )
        return jnp.stack([o.astype(jnp.uint32) for o in outs])

    report("window rank+cumsum+sum", n, timed(win, packed))

    @jax.jit
    def win_roll(x):
        out = rst.window(("rolling_sum", as_i32(x[2]), 64, 32),
                         partition_by=x[0], order_by=x[1])
        return out.astype(jnp.uint32)[None]

    report("window rolling_sum(64,32)", n, timed(win_roll, packed))

    for agg in ("sum", "median", "mode", "argmax", "count_distinct", "var"):
        @jax.jit
        def hagg(x, agg=agg):
            uk, av, cnt = rst.hash_aggregate(x[0], as_i32(x[2]), agg)
            return jnp.stack([uk, av.astype(jnp.uint32)])

        report(f"hash_aggregate {agg}", n, timed(hagg, packed))

    m = n // 4
    lk = rng.integers(0, 1 << 31, m).astype(np.int32)
    rk = rng.integers(0, 1 << 31, m).astype(np.int32)
    rv = rng.integers(0, 1 << 31, m).astype(np.uint32)
    packed2 = jnp.asarray(np.stack([lk.view(np.uint32), rk.view(np.uint32),
                                    rv]))

    @jax.jit
    def asof(x):
        vals, matched, pos = rst.join_asof(
            as_i32(x[0]), as_i32(x[1]), x[2], direction="backward"
        )
        return jnp.stack(
            [vals, matched.astype(jnp.uint32), pos.astype(jnp.uint32)]
        )

    def _fmt(x):
        return f"{x/(1<<20):g}M" if x >= (1 << 20) else f"{x/1024:g}K"

    report(f"join_asof backward {_fmt(m)}x{_fmt(m)}", m, timed(asof, packed2))

    jk = rng.integers(0, max(m // 4, 1), m).astype(np.uint32)
    jk2 = rng.integers(0, max(m // 4, 1), m).astype(np.uint32)
    packed3 = jnp.asarray(np.stack([jk, jk2, rv]))
    cap = 8 * m

    @jax.jit
    def hj(x):
        _, jl, jr, cnt, ovf = rst.hash_join(
            x[0], x[2], x[1], x[2], capacity=cap, how="inner"
        )
        return jnp.stack([jl, jr])

    report(f"hash_join inner {_fmt(m)}x{_fmt(m)} (cap {_fmt(cap)})",
           m, timed(hj, packed3))


def main(argv=None):
    args = _parse_args(argv)
    from radix_sort_tpu.utils.timing import sync
    from radix_sort_tpu.utils import io

    if args.suite == "ops":
        _ops_suite(args)
        return
    if args.suite == "queries":
        _queries_suite(args)
        return

    if args.gen_data:
        if args.n is None:
            raise SystemExit("--gen-data needs --n")
        kw = {}
        if args.dist == "zipf":
            kw["s"] = args.zipf_s
        if args.dist == "step_uniform":
            kw["num_steps"] = args.steps
        dtype = np.uint64 if "u64" in args.dtypes and "u32" not in args.dtypes else np.uint32
        arr = io.gen_data(args.gen_data, int(args.n), dtype=dtype,
                          dist=args.dist, seed=args.seed, **kw)
        print(f"wrote {arr.size} {arr.dtype} keys ({arr.nbytes/1e9:.2f} GB) "
              f"to {args.gen_data} (dist={args.dist})")
        return

    engines = args.engines or ([args.implementation] if args.implementation else ["auto"])
    print(f"backend={jax.default_backend()} devices={jax.devices()} "
          f"engines={engines}")
    key = jax.random.PRNGKey(args.seed)

    if args.data:
        # bit-identical persisted dataset (bench_sorts_data, main.rs:47-81)
        host = io.read_raw(args.data)
        dt_name = {4: "u32", 8: "u64"}[host.dtype.itemsize]
        n = host.size
        donate = len(engines) == 1
        fns = _engine_fns(dt_name, engines, donate)

        def upload():
            if dt_name == "u64":
                hi = jnp.asarray((host >> np.uint64(32)).astype(np.uint32))
                lo = jnp.asarray(host.astype(np.uint32))
                z = jnp.zeros((n,), jnp.uint32)
                return jnp.stack([hi, lo, z, z])
            return jnp.stack(
                [jnp.asarray(host), jnp.zeros((n,), jnp.uint32)]
            )

        data = upload()
        gb = host.nbytes * 2 / 1e9  # key+payload rows
        for eng in engines:
            sync(fns[eng](data))  # compile + warm
            times = []
            for _ in range(args.runs):
                if donate:
                    data = upload()  # the donated buffer was consumed
                t0 = time.perf_counter()
                sync(fns[eng](data))
                times.append(time.perf_counter() - t0)
            mean = float(np.mean(times))
            print(f"Sorted {args.data} [{n} ({dt_name},{dt_name}) rows] "
                  f"with {eng}: {mean:.4f}s  ({n/mean/1e6:.1f}M keys/s, "
                  f"{gb/mean:.2f} GB/s)")
        return

    for dt_name in args.dtypes:
        rowbytes = {"u32": 8, "u64": 16}[dt_name]
        fns = _engine_fns(dt_name, engines, donate=len(engines) == 1)

        def make(key, n):
            if dt_name == "u64":
                hi, lo = _gen_limbs(key, n, args)
                z = jnp.zeros((n,), jnp.uint32)
                return jnp.stack([hi, lo, z, z])
            return jnp.stack(
                [_gen_keys(key, n, jnp.uint32, args),
                 jnp.zeros((n,), jnp.uint32)]
            )

        for gb in args.sizes:
            n = int(gb * 1e9 / rowbytes)
            key, sub = jax.random.split(key)
            warm = sync(make(sub, n))
            for eng in engines:
                sync(fns[eng](warm))  # compile + warm up
            times = {eng: [] for eng in engines}
            for _ in range(args.runs):
                key, sub = jax.random.split(key)
                data = sync(make(sub, n))
                # every engine sorts THE SAME rows (clone semantics of
                # main.rs:36-42 — jax arrays are immutable, no copy needed)
                for eng in engines:
                    t0 = time.perf_counter()
                    sync(fns[eng](data))
                    times[eng].append(time.perf_counter() - t0)
            for eng in engines:
                mean = float(np.mean(times[eng]))
                tag = f" [{eng}]" if len(engines) > 1 else ""
                print(
                    f"Sorted {gb}GB of ({dt_name},{dt_name}) data in: {mean:.4f}s"
                    f"  ({n/mean/1e6:.1f}M keys/s, {gb/mean:.2f} GB/s,"
                    f" dist={args.dist}){tag}"
                )


if __name__ == "__main__":
    main()
