"""Per-round instrumentation of the R-round sample sort on TPU: max counts
vs caps (overflow detection) + amortized per-phase timings."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu import config
from radix_sort_tpu.ops import extract, sample_sort as S

N = 1 << 24
rng = np.random.default_rng(0)
OPS = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(4)]
NUM_KEYS = 2


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:] if leaf.ndim else leaf)
    return o


def debug_run(ops, num_keys):
    cfg = config.get()
    m = cfg.chunk_elems
    K = cfg.buckets_per_round
    alpha = cfg.capacity_factor
    Np = S._ceil_to(max(N, 8 * m), 8 * m)
    assert Np == N
    Ks = S._plan(Np, K, cfg.final_chunk_target)
    print("plan:", Ks, flush=True)

    nregions, cap, counts = 1, Np, None
    for r, Kr in enumerate(Ks):
        ops = S._rowsort(ops, m, num_keys)
        cpb = cap // m
        nchunks = nregions * cpb
        nreg_next = nregions * Kr
        cap_next = S._next_cap(Np, nreg_next, alpha, m, r == len(Ks) - 1)
        if r == 0:
            sw, sp = S._round1_splitters(ops, num_keys, m, Kr, cfg.round1_samples_per_chunk)
            sw = [jnp.broadcast_to(w[None, :], (nchunks, Kr - 1)) for w in sw]
            sp_local = sp[None, :] - (jnp.arange(nchunks, dtype=jnp.int32) * m)[:, None]
            vl = jnp.full((nchunks,), m, jnp.int32)
        else:
            parent = Np // nregions
            margin = max(cap_next - 9 * 128 - int(alpha * Np / nreg_next), 1)
            p = 1.0 / Kr
            s2_need = int(16.0 * 2 * p * (1 - p) * (parent / margin) ** 2) + 1
            s2 = min(max(s2_need, cfg.round2_samples // 4, 4 * Kr, 64), 4096)
            print(f"round {r}: s2={s2} (need {s2_need})", flush=True)
            sw, sp = S._round2_splitters(ops, num_keys, counts, cap, Kr, s2)
            sw = [jnp.repeat(w, cpb, axis=0) for w in sw]
            sp = jnp.repeat(sp, cpb, axis=0)
            cib = jnp.tile(jnp.arange(cpb, dtype=jnp.int32), nregions)
            vl = jnp.clip(jnp.repeat(counts, cpb) - cib * m, 0, m)
            sp_local = sp - (cib * m)[:, None]
        bounds = S._bucket_ids(ops, num_keys, m, sw, sp_local, vl)
        outs, counts = extract.bucket_extract(
            [o.reshape(-1, S.LANES) for o in ops], bounds, K=Kr,
            cap_rows=cap_next // S.LANES, chunks_per_bucket=cpb,
            nbuckets=nregions,
        )
        ops = [o.reshape(-1) for o in outs]
        cnp = np.asarray(counts)
        print(f"round {r}: K={Kr} cap={cap_next} counts max={cnp.max()} "
              f"mean={cnp.mean():.0f} limit={cap_next - 9*128} "
              f"over={int((cnp > cap_next - 9*128).sum())}/{len(cnp)}", flush=True)
        nregions, cap = nreg_next, cap_next
    return ops, counts, cap


t0 = time.perf_counter()
ops, counts, cap = debug_run(list(OPS), NUM_KEYS)
print("debug total (with syncs):", time.perf_counter() - t0, flush=True)
