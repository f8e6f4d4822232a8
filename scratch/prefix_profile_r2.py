"""Prefix-timing of the jitted R-round pipeline: jit(prefix up to phase i),
time each, successive differences = per-phase cost (each prefix is one jit,
so XLA fusion context is realistic; min-of-3 wall clock)."""
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


def pipeline_prefix(ops, num_keys, stop):
    """stop: 'rowsort1','split1','bounds1','x1','rowsort2','split2','bounds2',
    'x2','rowsort3','split3','bounds3','x3','final','compact'"""
    cfg = config.get()
    m, K, alpha = cfg.chunk_elems, cfg.buckets_per_round, cfg.capacity_factor
    Np = N
    Ks = S._plan(Np, K, cfg.final_chunk_target)
    nregions, cap, counts = 1, Np, None
    for r, Kr in enumerate(Ks):
        ops = S._rowsort(ops, m, num_keys)
        if stop == f"rowsort{r+1}":
            return ops
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
            s2 = min(max(int(4.0 * 2 * p * (1 - p) * (parent / margin) ** 2) + 1,
                         cfg.round2_samples // 4, 4 * Kr, 64), 4096)
            sw, sp = S._round2_splitters(ops, num_keys, counts, cap, Kr, s2)
            sw = [jnp.repeat(w, cpb, axis=0) for w in sw]
            sp = jnp.repeat(sp, cpb, axis=0)
            cib = jnp.tile(jnp.arange(cpb, dtype=jnp.int32), nregions)
            vl = jnp.clip(jnp.repeat(counts, cpb) - cib * m, 0, m)
            sp_local = sp - (cib * m)[:, None]
        if stop == f"split{r+1}":
            return ops + [sw[0], sp]
        bounds = S._bucket_ids(ops, num_keys, m, sw, sp_local, vl)
        if stop == f"bounds{r+1}":
            return ops + [bounds]
        outs, counts = extract.bucket_extract(
            [o.reshape(-1, S.LANES) for o in ops], bounds, K=Kr,
            cap_rows=cap_next // S.LANES, chunks_per_bucket=cpb,
            nbuckets=nregions)
        ops = [o.reshape(-1) for o in outs]
        if stop == f"x{r+1}":
            return ops + [counts]
        nregions, cap = nreg_next, cap_next
    ops = S._rowsort(ops, cap, num_keys)
    if stop == "final":
        return ops
    dense, total = extract.compact_regions(
        [o.reshape(-1, S.LANES) for o in ops], counts, cap_rows=cap // S.LANES)
    return [o.reshape(-1)[:N] for o in dense]


STOPS = ["rowsort1", "split1", "bounds1", "x1",
         "rowsort2", "split2", "bounds2", "x2",
         "rowsort3", "split3", "bounds3", "x3",
         "final", "compact"]
which = sys.argv[1:] or STOPS
prev = 0.0
for stop in STOPS:
    if stop not in which:
        continue
    f = jax.jit(lambda *o, s=stop: pipeline_prefix(list(o), NUM_KEYS, s))
    sync(f(*OPS))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); sync(f(*OPS)); ts.append(time.perf_counter() - t0)
    t = min(ts) * 1e3
    print(f"{stop:>9}: {t:8.1f} ms  (+{t - prev:7.1f})", flush=True)
    prev = t
