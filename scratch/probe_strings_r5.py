"""Round-5: high-cardinality string characterization (VERDICT #4).

Every string op is O(vocab) HOST work by design (strings.py: the device
sees only codes). All prior datapoints used a 1K-word vocabulary; this
measures the host-side costs at 1M and 16M DISTINCT values on 16M rows:

  - encode      np.unique over the raw column (ingestion, one-time)
  - like fast   vectorized %lit% contains scan (np.char, round-5 path)
  - like regex  the '_' fallback regex loop (measured at 100K, scaled)
  - transform   np.char.upper over the vocabulary + revocab
  - unify       np.union1d of two same-size vocabularies (join prep)

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  PYTHONPATH=/root/repo python scratch/probe_strings_r5.py
"""

import time

import numpy as np

from radix_sort_tpu import strings as S


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:44s} {dt:8.2f} s", flush=True)
    return out, dt


def charm(n_rows, n_distinct, rng):
    print(f"-- {n_rows/1e6:.0f}M rows, {n_distinct/1e6:g}M distinct",
          flush=True)
    base = rng.integers(0, n_distinct, n_rows)
    raw = np.char.add("w", base.astype(np.str_))
    (codes, vocab), _ = t("encode (np.unique sort + inverse)",
                          lambda: S.encode(raw))
    nv = len(vocab)
    print(f"  vocab = {nv:,}", flush=True)
    t("like_mask '%42%' (vectorized contains)",
      lambda: S.like_mask(vocab, "%42%"))
    sub = vocab[:100_000]
    _, dt_rx = t("like_mask 'w_1%' on 100K (regex path)",
                 lambda: S.like_mask(sub, "w_1%"))
    print(f"    -> regex path scaled to {nv/1e6:.0f}M: "
          f"~{dt_rx * nv / len(sub):.0f} s", flush=True)
    t("UPPER transform (np.char.upper + revocab)",
      lambda: S.revocab(np.char.upper(vocab)))
    other = np.unique(np.char.add("w", rng.integers(
        0, n_distinct, n_distinct).astype(np.str_)))
    t(f"unify (union1d {nv/1e6:.1f}M + {len(other)/1e6:.1f}M)",
      lambda: S.unify(vocab, other))


def main():
    rng = np.random.default_rng(0)
    charm(1 << 24, 1 << 20, rng)
    charm(1 << 24, 1 << 24, rng)


if __name__ == "__main__":
    main()
