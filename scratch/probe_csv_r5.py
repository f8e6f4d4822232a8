"""Round-5: native CSV loader throughput on a ~1 GB file (VERDICT #6).

Generates a mixed-type CSV (int64, float64, dict string, ISO date —
one of each) of ~1 GB, measures:
  - native C++ loader (csv_loader.cpp two-pass): full file
  - numpy fallback (utils/io.read_csv -> genfromtxt): a 1/16 slice,
    scaled (full-file genfromtxt is impractical)

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scratch/probe_csv_r5.py
"""

import os
import time

import numpy as np

PATH = "/tmp/bench_r5.csv"
TARGET = 1 << 30  # ~1 GB


def gen():
    rng = np.random.default_rng(0)
    words = np.array(["alpha", "bravo", "charlie", "delta", "echo",
                      "foxtrot", "golf", "hotel"])
    chunk_rows = 1 << 18
    written = 0
    t0 = time.perf_counter()
    with open(PATH, "w") as f:
        f.write("id,price,tag,day\n")
        while written < TARGET:
            ids = rng.integers(0, 1 << 40, chunk_rows)
            pr = rng.random(chunk_rows) * 1000
            tg = words[rng.integers(0, 8, chunk_rows)]
            dy = rng.integers(0, 20000, chunk_rows)
            days = dy.astype("datetime64[D]").astype(str)
            lines = [f"{i},{p:.4f},{t},{d}\n"
                     for i, p, t, d in zip(ids, pr, tg, days)]
            blob = "".join(lines)
            f.write(blob)
            written += len(blob)
    print(f"generated {written/1e9:.2f} GB in "
          f"{time.perf_counter()-t0:.0f} s", flush=True)
    return written


def main():
    if not os.path.exists(PATH) or os.path.getsize(PATH) < TARGET:
        gen()
    size = os.path.getsize(PATH)

    from radix_sort_tpu.native.csvio import parse_csv
    t0 = time.perf_counter()
    cols, dicts, masks = parse_csv(PATH)
    dt_native = time.perf_counter() - t0
    n = len(cols["id"])
    assert cols["id"].dtype == np.int64
    assert cols["price"].dtype == np.float64
    assert "tag" in dicts
    assert cols["day"].dtype == np.dtype("datetime64[D]")
    print(f"native: {size/1e9:.2f} GB, {n:,} rows in {dt_native:.2f} s "
          f"= {size/dt_native/1e6:.0f} MB/s, {n/dt_native/1e6:.2f} M rows/s",
          flush=True)

    # numpy fallback on a 1/16 slice
    slice_path = "/tmp/bench_r5_slice.csv"
    nlines = n // 16
    with open(PATH) as f, open(slice_path, "w") as g:
        for i, line in enumerate(f):
            g.write(line)
            if i > nlines:
                break
    ssize = os.path.getsize(slice_path)
    # the TRUE numpy fallback (read_csv would route to the native
    # loader again): genfromtxt exactly as utils/io.read_csv calls it
    t0 = time.perf_counter()
    raw = np.genfromtxt(slice_path, delimiter=",", names=True,
                        dtype=None, encoding="utf-8", autostrip=True)
    dt_np = time.perf_counter() - t0
    print(f"genfromtxt fallback: {ssize/1e9:.3f} GB slice in "
          f"{dt_np:.1f} s = {ssize/dt_np/1e6:.1f} MB/s "
          f"(native = x{(size/dt_native)/(ssize/dt_np):.1f})",
          flush=True)
    # small-file (cache-resident) native rate for the memory-bound gap
    t0 = time.perf_counter()
    parse_csv(slice_path)
    dt_s = time.perf_counter() - t0
    print(f"native on slice: {ssize/dt_s/1e6:.0f} MB/s", flush=True)
    os.unlink(slice_path)


if __name__ == "__main__":
    main()
