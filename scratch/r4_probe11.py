"""Round-4 probe 11: does lax.cond-wrapping dilute gather performance?"""
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

LOG = open("/root/repo/scratch/r4_probe11.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
B, L = n_reads, read_len
P = L - k + 1
genome = benchmod.make_corpus_codes()
log(f"== r4_probe11 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
p = turbo.precalc_k
codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
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

def classify(turbo_, codes):
    rows = codes.astype(jnp.int32)
    pidx, vwin = _pidx_vwin(turbo_, rows, P)
    Pe = (P + 1) // 2
    cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
    m = pidx[:, ::2] + cpair * jnp.int32(4**p)
    w = turbo_.seed_bits[jnp.clip(m >> 4, 0)]
    b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    alive = seed_live & vwin
    return jnp.sum(alive.astype(jnp.int32))

@jax.jit
def in_cond(turbo_, codes):
    n = jnp.sum(codes[:, 0].astype(jnp.int32))  # data-dependent predicate
    return lax.cond(n >= 0, lambda _: classify(turbo_, codes),
                    lambda _: jnp.int32(0), 0)

@jax.jit
def in_fori(turbo_, codes):
    def body(i, acc):
        return acc + classify(turbo_, codes)
    return lax.fori_loop(0, 1, body, jnp.int32(0))

timeit(in_cond, turbo, codes, tag="classify inside lax.cond (args)")
timeit(in_fori, turbo, codes, tag="classify inside 1-trip fori (args)")
log("== r4_probe11 done ==")
