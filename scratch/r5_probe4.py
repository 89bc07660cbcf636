"""Round-5 probe 4: is the pack cost the reshape/layout, the bool read,
or the reduction?  Also: lane-major 3-word packing from the [B, P] mask."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

LOG = open("/root/repo/scratch/r5_probe4.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

log(f"== r5_probe4 start {time.strftime('%F %T')} ==")
B, P = 1 << 22, 71
D = B * P
D64 = -(-D // 64) * 64
key = jax.random.PRNGKey(0)
live_flat = jax.random.uniform(key, (D64,)) < 0.06
live_2d = jax.random.uniform(key, (B, P)) < 0.06
live_blocks = jnp.reshape(live_flat, (-1, 64))  # pre-shaped
jax.block_until_ready((live_flat, live_2d, live_blocks))

def _force(out):
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

timed(lambda lv: jnp.sum(lv, dtype=jnp.int32), live_flat, label="sum(bool 298M)")
timed(lambda lv: jnp.reshape(lv, (-1, 64)).astype(jnp.uint32)[:, 0], live_flat,
      label="reshape [D]->[ND,64] + col0")

def pack_preshaped(bits):
    sh = jnp.arange(32, dtype=jnp.uint32)
    wlo = jnp.sum(bits[:, :32].astype(jnp.uint32) << sh, axis=1, dtype=jnp.uint32)
    whi = jnp.sum(bits[:, 32:].astype(jnp.uint32) << sh, axis=1, dtype=jnp.uint32)
    return wlo, whi

timed(pack_preshaped, live_blocks, label="pack from pre-shaped [ND,64]")

# lane-major: 3 uint32 words per lane straight from [B, P] (no flat reshape)
def pack_lane3(m):
    words = []
    for w in range(3):
        j0 = w * 32
        width = min(32, P - j0)
        cols = m[:, j0 : j0 + width].astype(jnp.uint32)
        sh = jnp.arange(width, dtype=jnp.uint32)
        words.append(jnp.sum(cols << sh, axis=1, dtype=jnp.uint32))
    cnt = sum(lax.population_count(w) for w in words).astype(jnp.int32)
    return words[0], words[1], words[2], cnt

timed(pack_lane3, live_2d, label="lane-major 3-word pack from [B,P]")

# transpose-sum formulation: [ND, 64] -> weight via matmul over transposed?
def pack_dot(bits):
    w = (jnp.arange(32, dtype=jnp.uint32) * 0 + 1) << jnp.arange(32, dtype=jnp.uint32)
    lo = bits[:, :32].astype(jnp.uint32) * w[None, :]
    hi = bits[:, 32:].astype(jnp.uint32) * w[None, :]
    return jnp.sum(lo, axis=1, dtype=jnp.uint32), jnp.sum(hi, axis=1, dtype=jnp.uint32)

timed(pack_dot, live_blocks, label="pack mult+reduce pre-shaped")
log("== r5_probe4 done ==")

# col-major blocks: 64 LANES at one position; reduce over the sublane axis
log("-- part 2: col-major pack --")
def pack_colmajor(m):
    G = m.shape[0] // 64
    g = m.reshape(G, 64, P).astype(jnp.uint32)
    sh = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    wlo = jnp.sum(g[:, :32] << sh, axis=1, dtype=jnp.uint32)  # [G, P]
    whi = jnp.sum(g[:, 32:] << sh, axis=1, dtype=jnp.uint32)
    cnt = (lax.population_count(wlo) + lax.population_count(whi)).astype(jnp.int32)
    return wlo, whi, cnt

wl, wh, cn = timed(pack_colmajor, live_2d, label="col-major pack [B,P]->[B/64,P]")
# correctness: block (g, pos) bit j == live_2d[64g+j, pos]
m_host = np.asarray(live_2d)
wl_h = np.asarray(wl); g0, p0 = 123, 37
expect = sum(int(m_host[64*g0+j, p0]) << j for j in range(32))
log(f"  col-major correctness: {int(wl_h[g0, p0]) == expect}")
# argsort inside a bigger fused computation (closer to program reality)
def sort_and_use(c):
    o = jnp.argsort(-c.ravel())
    return o[:100].sum() + o[-1]
timed(sort_and_use, cn, label="argsort 4.65M (col-major cnt) fused use")
