"""Round-4 probe 9: bisect the +0.9s classify anomaly (V2 vs runD)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, _pidx_vwin
import bench as benchmod

LOG = open("/root/repo/scratch/r4_probe9.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
B, L = n_reads, read_len
P = L - k + 1
genome = benchmod.make_corpus_codes()
log(f"== r4_probe9 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
p = turbo.precalc_k
codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
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

def core(codes):
    rows = codes.astype(jnp.int32)
    pidx, vwin = _pidx_vwin(turbo, rows, P)
    Pe = (P + 1) // 2
    cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
    m = pidx[:, ::2] + cpair * jnp.int32(4**p)
    w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
    b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    return seed_live, vwin

@jax.jit
def v3(codes, unresolved):
    seed_live, vwin = core(codes)
    alive = unresolved & seed_live & vwin
    return jnp.sum(alive.astype(jnp.int32))

@jax.jit
def v4(codes):
    seed_live, vwin = core(codes)
    alive = seed_live & vwin
    return jnp.sum(alive.astype(jnp.int32)), jnp.sum(vwin.astype(jnp.int32))

@jax.jit
def v5(codes):
    seed_live, vwin = core(codes)
    alive = seed_live & vwin
    return jnp.sum(alive.astype(jnp.int32))

timeit(v5, codes, tag="V5 = runD exactly (control)")
timeit(v3, codes, unres, tag="V3 + unresolved operand, one output")
timeit(v4, codes, tag="V4 two outputs, no unresolved")
log("== r4_probe9 done ==")
