"""Round-4 probe 6: micro-costs inside the global patch branch.

  M1  full-width classification exactly as patch_global does it
  M2  same WITHOUT the bitmap gather (VPU-only baseline)
  M3  packed-words 3-word gather (w3_at) at 2M lanes, 9 reps
  M4  seed row + tbl row gathers at 2M lanes, 9 reps
  M5  the _block_sweep chunk VPU decode (off_le compares) alone
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, _pidx_vwin
import bench as benchmod

LOG = open("/root/repo/scratch/r4_probe6.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
B = n_reads
P = read_len - k + 1
L = read_len
genome = benchmod.make_corpus_codes()
log(f"== r4_probe6 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
p = turbo.precalc_k
codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
ansbuf = jnp.full((B, P), -1, jnp.int32)
unres = jnp.ones((B, P), bool)
jax.block_until_ready(codes)

def timeit(fn, *args, tag="", reps=3):
    t0 = time.perf_counter()
    out = jax.tree.map(lambda x: np.asarray(x).sum(), fn(*args))
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.tree.map(lambda x: np.asarray(x).sum(), fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts)//2]
    log(f"{tag}: {med*1000:.0f} ms (warm {warm:.0f}s)")
    return out, med

def classify(codes, unresolved, a, with_bitmap):
    rows = codes.astype(jnp.int32)
    pidx, vwin = _pidx_vwin(turbo, rows, P)
    Pe = (P + 1) // 2
    cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
    m = pidx[:, ::2] + cpair * jnp.int32(4**p)
    if with_bitmap:
        w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
        b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
    else:
        b = (m & jnp.int32(3)).astype(jnp.uint32)  # VPU stand-in
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    alive = unresolved & seed_live & vwin
    new = jnp.where(unresolved & ~alive, jnp.int32(-1), a)
    new = jnp.where(alive, jnp.int32(-2), new)
    return jnp.sum(new), jnp.sum(alive.astype(jnp.int32))

m1 = jax.jit(lambda c, u, a: classify(c, u, a, True))
m2 = jax.jit(lambda c, u, a: classify(c, u, a, False))
_, t1 = timeit(m1, codes, unres, ansbuf, tag="M1 full-width classify (bitmap)")
_, t2 = timeit(m2, codes, unres, ansbuf, tag="M2 classify minus bitmap gather")

# M3: 3-word gathers from a 150MB packed array at 2M lanes
NW = 9
packed_f = jax.random.randint(jax.random.PRNGKey(0), (B * NW,), 0, 2**31 - 1, jnp.int32)
sel = jax.random.randint(jax.random.PRNGKey(1), (1 << 21,), 0, B * P - 1, jnp.int32)
span = jnp.arange(3, dtype=jnp.int32)

@jax.jit
def m3(packed_f, sel):
    def body(i, acc):
        fp = (sel + i * 7) % (B * P)
        lane = fp // P
        pos = fp % P
        wi = lane * NW + (pos >> 4)
        ww = packed_f[wi[:, None] + span[None, :]]
        return acc + jnp.sum(ww)
    return lax.fori_loop(0, 9, body, jnp.int32(0))
_, t3 = timeit(m3, packed_f, sel, tag="M3 3-word row gathers 9x2M from 150MB")

@jax.jit
def m4(turbo, sel):
    def body(i, acc):
        fp = (sel + i * 7) % (4**13)
        seed = turbo.precalc[fp]
        col = jnp.clip(seed[:, 0], 0) % turbo.n_nodes
        row = turbo.tbl_row_sub(col, fp & 63)
        return acc + jnp.sum(seed) + jnp.sum(row)
    return lax.fori_loop(0, 9, body, jnp.int32(0))
_, t4 = timeit(m4, turbo, sel, tag="M4 seed+tbl row gathers 9x2M")

@jax.jit
def m5(sel):
    offsets1 = jnp.cumsum(jnp.arange(64, dtype=jnp.int32) * 1000)
    def body(i, acc):
        s = (sel + i) % (B * P)
        off_le = offsets1[None, :] <= s[:, None]
        level = jnp.sum(off_le.astype(jnp.int32), axis=1)
        return acc + jnp.sum(level)
    return lax.fori_loop(0, 9, body, jnp.int32(0))
_, t5 = timeit(m5, sel, tag="M5 slot decode VPU 9x2M")

log(f"summary M1={t1*1000:.0f} M2={t2*1000:.0f} M3={t3*1000:.0f} M4={t4*1000:.0f} M5={t5*1000:.0f}")
log("== r4_probe6 done ==")
