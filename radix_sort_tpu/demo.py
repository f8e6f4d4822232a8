"""Benchmark demo CLI — the reference's `cargo run -r` path rebuilt for TPU.

Reproduces the measurement protocol of src/main.rs:101-127: for each size in
a GB sweep and each row type, sample fresh uniform key/payload rows per run,
time the full sort on device, and print the mean wall-clock. Extras over the
reference: selectable distribution (uniform / zipf / geometric /
step_uniform, src/distr.rs), selectable engine, and keys/s + GB/s columns.

Run:  python -m radix_sort_tpu.demo --sizes 0.5 1.0 --dtypes u32 u64 --runs 5
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
    p.add_argument("--implementation", default="auto")
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


def main(argv=None):
    args = _parse_args(argv)
    from radix_sort_tpu.ops import pallas_sort
    from radix_sort_tpu.utils.timing import sync
    import radix_sort_tpu as rst

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    key = jax.random.PRNGKey(0)

    for dt_name in args.dtypes:
        rowbytes = {"u32": 8, "u64": 16}[dt_name]

        if dt_name == "u64":
            # device-native u64 path: (hi, lo) u32 limb pairs end to end
            engine = "sample" if args.implementation == "pallas" else "comparator"
            fn = jax.jit(
                lambda a, b, c, d: pallas_sort.sort_pairs_limbs(
                    a, b, c, d, engine=engine
                )
            )

            def make(key, n):
                # distribution shapes the hi limb (which carries the skew);
                # the lo limb stays uniform — the 64-bit analogue of the
                # 32-bit generators without device-side x64
                khi, klo = jax.random.split(key)
                return (
                    _gen_keys(khi, n, jnp.uint32, args),
                    jax.random.bits(klo, (n,), jnp.uint32),
                    jnp.zeros((n,), jnp.uint32),
                    jnp.zeros((n,), jnp.uint32),
                )
        else:
            impl = args.implementation

            def step(k, v):
                return rst.sort_pairs(k, v, implementation=impl)

            fn = jax.jit(step)

            def make(key, n):
                return (_gen_keys(key, n, jnp.uint32, args),
                        jnp.zeros((n,), jnp.uint32))

        for gb in args.sizes:
            n = int(gb * 1e9 / rowbytes)
            key, sub = jax.random.split(key)
            sync(fn(*make(sub, n)))  # compile + warm up
            times = []
            for _ in range(args.runs):
                key, sub = jax.random.split(key)
                data = sync(make(sub, n))
                t0 = time.perf_counter()
                sync(fn(*data))
                times.append(time.perf_counter() - t0)
            mean = float(np.mean(times))
            print(
                f"Sorted {gb}GB of ({dt_name},{dt_name}) data in: {mean:.4f}s"
                f"  ({n/mean/1e6:.1f}M keys/s, {gb/mean:.2f} GB/s,"
                f" dist={args.dist})"
            )


if __name__ == "__main__":
    main()
