"""Amortized timing of pipeline stages (fori_loop in one jit)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, "/root/repo")
from radix_sort_tpu.ops import sample_sort as ss
from radix_sort_tpu.ops import extract

N = 1 << 24
W, num_keys = 4, 2
m, K = 4096, 32  # round-1 profile shapes (DEFAULT_M/K removed)
LANES = 128
ITERS = 4


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf.reshape(-1)[-1:])
    return o


def timed(f, *args, reps=3):
    sync(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


rng = np.random.default_rng(0)
ops = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32)) for _ in range(W)]
nchunks = N // m
floor = timed(jax.jit(lambda x: x[:8] + 1), ops[0])
print(f"floor {floor*1e3:.1f}", flush=True)


def bench(name, step, args):
    def loop(*a):
        def body(i, a):
            out = step(*a)
            return out
        return jax.lax.fori_loop(0, ITERS, body, a)
    t = (timed(jax.jit(loop), *args) - floor) / ITERS
    print(f"{name}: {t*1e3:8.1f} ms", flush=True)


# extract round1 amortized: step returns same-shaped inputs (feed ops back)
cap1 = ss._ceil_to(int(1.3 * N / K) + 2 * m, m)
sorted1 = sync(jax.jit(lambda *o: ss._rowsort(list(o), m, num_keys))(*ops))
bounds1 = sync(
    jax.jit(
        lambda *o: ss._bucket_ids(
            list(o), num_keys, m,
            [jnp.broadcast_to(w[None, :], (nchunks, K - 1)) for w in ss._round1_splitters(list(o), num_keys, m, K)[0]],
            jnp.broadcast_to(ss._round1_splitters(list(o), num_keys, m, K)[1][None, :], (nchunks, K - 1)),
            jnp.full((nchunks,), m, jnp.int32),
        )
    )(*sorted1)
)


def ex1(b, *o):
    inter, cnt = extract.bucket_extract(
        [x.reshape(-1, LANES) for x in o], b,
        K=K, cap_rows=cap1 // LANES, chunks_per_bucket=nchunks, nbuckets=1,
    )
    return (b, o[0] ^ cnt[0].astype(jnp.uint32), *o[1:])


bench("extract r1      ", ex1, (bounds1, *sorted1))

# deinterleave amortized
inter1, counts1 = sync(
    jax.jit(
        lambda b, *o: extract.bucket_extract(
            [x.reshape(-1, LANES) for x in o], b,
            K=K, cap_rows=cap1 // LANES, chunks_per_bucket=nchunks, nbuckets=1,
        )
    )(bounds1, *sorted1)
)


def dei(i):
    outs = extract.deinterleave(i, num_ops=W, nregions=K, cap_rows=cap1 // LANES)
    return (i ^ outs[0][0, 0],)


bench("deinterleave r1 ", dei, (inter1,))

# bucket_ids amortized
def bids(*o):
    sw, sp = ss._round1_splitters(list(o), num_keys, m, K)
    sw = [jnp.broadcast_to(w[None, :], (nchunks, K - 1)) for w in sw]
    sp = jnp.broadcast_to(sp[None, :], (nchunks, K - 1))
    b = ss._bucket_ids(list(o), num_keys, m, sw, sp, jnp.full((nchunks,), m, jnp.int32))
    return (o[0] ^ b[0, 0].astype(jnp.uint32), *o[1:])


bench("splitters+bounds", bids, tuple(sorted1))

# final rowsort amortized at cap2 volume
cap2 = ss._ceil_to(int(1.3 * 1.3 * N / (K * K)) + 2048, 1024)
vol = K * K * cap2
big = [jnp.asarray(rng.integers(0, 2**32, vol, dtype=np.uint32)) for _ in range(W)]
bench(
    f"final rowsort {vol/1e6:.0f}M m={cap2}",
    lambda *o: tuple(ss._rowsort(list(o), cap2, num_keys)),
    tuple(big),
)

# compact amortized
counts2 = jnp.full((K * K,), int(N / (K * K)), jnp.int32)


def comp(c, *o):
    i, tot = extract.compact_regions(
        [x.reshape(-1, LANES) for x in o], c, cap_rows=cap2 // LANES
    )
    return (c, o[0] ^ tot[0].astype(jnp.uint32), *o[1:])


bench("compact         ", comp, (counts2, *big))
