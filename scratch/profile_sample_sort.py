"""Per-stage timing of the sample-sort pipeline at flagship config."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import sample_sort as ss
from radix_sort_tpu.ops import extract

N = 1 << 24
W, num_keys = 4, 2
m, K = 4096, 32  # round-1 profile shapes (DEFAULT_M/K removed)
LANES = 128


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def timed(name, f, *args, reps=3):
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:8.1f} ms", flush=True)
    return min(ts)


rng = np.random.default_rng(0)
ops = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(W)]
nchunks = N // m

# stage 1: rowsort
f1 = jax.jit(lambda *o: ss._rowsort(list(o), m, num_keys))
timed("rowsort m=4096 4op", f1, *ops)
sorted1 = sync(f1(*ops))

# stage 2: splitters + bounds
def f2(*o):
    sw1, sp1 = ss._round1_splitters(list(o), num_keys, m, K)
    sw1 = [jnp.broadcast_to(w[None, :], (nchunks, K - 1)) for w in sw1]
    sp1 = jnp.broadcast_to(sp1[None, :], (nchunks, K - 1))
    vl1 = jnp.full((nchunks,), m, jnp.int32)
    return ss._bucket_ids(list(o), num_keys, m, sw1, sp1, vl1)
f2j = jax.jit(f2)
timed("splitters+bounds", f2j, *sorted1)
bounds1 = sync(f2j(*sorted1))

# stage 3: extract
cap1 = ss._ceil_to(int(1.3 * N / K) + 2 * m, m)
f3 = jax.jit(
    lambda b, *o: extract.bucket_extract(
        [x.reshape(-1, LANES) for x in o], b,
        K=K, cap_rows=cap1 // LANES, chunks_per_bucket=nchunks, nbuckets=1,
    )
)
timed("extract round1", f3, bounds1, *sorted1)
inter1, counts1 = sync(f3(bounds1, *sorted1))

# stage 4: deinterleave
f4 = jax.jit(
    lambda i: [
        o.reshape(-1)
        for o in extract.deinterleave(i, num_ops=W, nregions=K, cap_rows=cap1 // LANES)
    ]
)
timed("deinterleave", f4, inter1)
ops2 = sync(f4(inter1))

# stage 5: rowsort round 2 (bigger volume)
f5 = jax.jit(lambda *o: ss._rowsort(list(o), m, num_keys))
timed(f"rowsort2 ({ops2[0].shape[0]/1e6:.1f}M elems)", f5, *ops2)
sorted2 = sync(f5(*ops2))

# stage 6: round-2 splitters + bounds
cpb = cap1 // m
nchunks2 = K * cpb
def f6(c1, *o):
    sw2, sp2 = ss._round2_splitters(list(o), num_keys, c1, cap1, K)
    sw2 = [jnp.repeat(w, cpb, axis=0) for w in sw2]
    sp2 = jnp.repeat(sp2, cpb, axis=0)
    cib = jnp.tile(jnp.arange(cpb, dtype=jnp.int32), K)
    vl2 = jnp.clip(jnp.repeat(c1, cpb) - cib * m, 0, m)
    sp2_local = sp2 - (cib * m)[:, None]
    return ss._bucket_ids(list(o), num_keys, m, sw2, sp2_local, vl2)
f6j = jax.jit(f6)
timed("splitters2+bounds2", f6j, counts1, *sorted2)
bounds2 = sync(f6j(counts1, *sorted2))

# stage 7: extract round 2
cap2 = ss._ceil_to(int(1.3 * 1.3 * N / (K * K)) + 2048, 1024)
f7 = jax.jit(
    lambda b, *o: extract.bucket_extract(
        [x.reshape(-1, LANES) for x in o], b,
        K=K, cap_rows=cap2 // LANES, chunks_per_bucket=cpb, nbuckets=K,
    )
)
timed("extract round2", f7, bounds2, *sorted2)
inter2, counts2 = sync(f7(bounds2, *sorted2))

# stage 8: deinterleave + final rowsort + compact
f8 = jax.jit(
    lambda i: [
        o.reshape(-1)
        for o in extract.deinterleave(i, num_ops=W, nregions=K * K, cap_rows=cap2 // LANES)
    ]
)
timed("deinterleave2", f8, inter2)
ops3 = sync(f8(inter2))
f9 = jax.jit(lambda *o: ss._rowsort(list(o), cap2, num_keys))
timed(f"final rowsort m={cap2} ({ops3[0].shape[0]/1e6:.1f}M)", f9, *ops3)
sorted3 = sync(f9(*ops3))
f10 = jax.jit(
    lambda c, *o: extract.compact_regions(
        [x.reshape(-1, LANES) for x in o], c, cap_rows=cap2 // LANES
    )
)
timed("compact", f10, counts2, *sorted3)
print(f"cap1={cap1} cap2={cap2} nchunks={nchunks} nchunks2={nchunks2}")
