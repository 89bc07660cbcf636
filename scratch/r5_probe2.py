"""Round-5 probe 2: where the block sweep's non-gather ~0.45s goes.

Times the sweep's orchestration pieces as standalone jits at the hit0
scale (D = 298M positions, ND = 4.65M blocks): liveness bit-packing,
the busiest-first block ordering (argsort vs counting-order), histogram,
and the per-chunk slot decode."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

LOG = open("/root/repo/scratch/r5_probe2.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

log(f"== r5_probe2 start {time.strftime('%F %T')} ==")
B, P = 1 << 22, 71
D = B * P
ND = -(-D // 64)

key = jax.random.PRNGKey(0)
live = jax.random.uniform(key, (D,)) < 0.06  # hit0 live fraction
jax.block_until_ready(live)

def _force(out):
    # scalar fetch forces completion (block_until_ready is unreliable on
    # this backend, see bench.py)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return int(np.asarray(leaf).ravel()[-1])

def timed(fn, *args, label="", reps=3):
    jitted = jax.jit(fn)
    out = jitted(*args); _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args); _force(out)
        ts.append(time.perf_counter() - t0)
    log(f"{label}: {sorted(ts)[len(ts)//2]*1000:.0f} ms")
    return out

# 1) liveness packing into 64-bit blocks + counts
def pack(lv):
    D64 = -(-D // 64) * 64
    if D64 != D:
        lv = jnp.concatenate([lv, jnp.zeros((D64 - D,), bool)])
    bits = lv.reshape(-1, 64)
    sh = jnp.arange(32, dtype=jnp.uint32)
    wlo = jnp.sum(bits[:, :32].astype(jnp.uint32) << sh, axis=1, dtype=jnp.uint32)
    whi = jnp.sum(bits[:, 32:].astype(jnp.uint32) << sh, axis=1, dtype=jnp.uint32)
    cnt = (lax.population_count(wlo) + lax.population_count(whi)).astype(jnp.int32)
    return wlo, whi, cnt

wlo, whi, cnt = timed(pack, live, label="pack 298M live -> 4.65M blocks")
jax.block_until_ready(cnt)

# 2) argsort (what the sweep does today)
timed(lambda c: jnp.argsort(-c), cnt, label="argsort 4.65M int32")

# 3) counting order: same busiest-first permutation via key-composed sort?
#    alternative: single sort_key = (64-cnt)*2^24 + blockid monotonic — same
#    cost class.  Real alternative: cumsum-scatter counting sort.
def counting_order(c):
    key_ = 64 - c  # 0..64, smaller = busier
    hist = jnp.bincount(key_, length=65)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(hist)[:-1].astype(jnp.int32)])
    # rank within bucket: for each block, number of earlier blocks with
    # the same key — 65 masked cumsums (VPU) instead of a sort
    nd = c.shape[0]
    order = jnp.zeros(nd, dtype=jnp.int32)
    within = jnp.zeros(nd, dtype=jnp.int32)
    for kk in range(65):
        m = (key_ == kk)
        within = jnp.where(m, jnp.cumsum(m.astype(jnp.int32)) - 1, within)
    posn = starts[key_] + within
    return jnp.zeros(nd, jnp.int32).at[posn].set(jnp.arange(nd, dtype=jnp.int32))

timed(counting_order, cnt, label="counting order (65 cumsums + scatter)")

# 4) histogram + offsets (already cheap?)
def hist_offsets(c):
    hist = jnp.bincount(c, length=65)
    level_counts = (c.shape[0] - jnp.cumsum(hist)[:64]).astype(jnp.int32)
    return jnp.cumsum(level_counts).astype(jnp.int32)

timed(hist_offsets, cnt, label="bincount+offsets")

# 5) chunk decode (broadcast compare against 64-entry tables), 1 chunk of 2M
off1 = hist_offsets(cnt)
lc = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.int32), off1]))
def decode(offsets1, level_counts):
    s = jnp.arange(1 << 21, dtype=jnp.int32)
    off_le = offsets1[None, :] <= s[:, None]
    level = jnp.sum(off_le.astype(jnp.int32), axis=1)
    base = jnp.sum(jnp.where(off_le, level_counts[None, :], 0), axis=1)
    return level, base

timed(decode, off1, lc, label="slot decode 2M x 64 broadcast")
log("== r5_probe2 done ==")
