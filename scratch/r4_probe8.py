"""Round-4 probe 8: why does classify cost +0.9s over its gather floor
when it writes [B,P] results (M1=2382) vs reducing (D=1469)?

  V0  M1 as-is (stack/reshape interleave + where writes)
  V1  pair-form: pad ans/un/vwin to [B, Pe, 2] and stay elementwise
  V2  M1 math but sum-reduced (no writes) — isolates write vs layout
"""
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

LOG = open("/root/repo/scratch/r4_probe8.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
B, L = n_reads, read_len
P = L - k + 1
genome = benchmod.make_corpus_codes()
log(f"== r4_probe8 start {time.strftime('%F %T')} ==")
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

def common(codes):
    rows = codes.astype(jnp.int32)
    pidx, vwin = _pidx_vwin(turbo, rows, P)
    Pe = (P + 1) // 2
    cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
    m = pidx[:, ::2] + cpair * jnp.int32(4**p)
    w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
    b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
    return b, vwin, Pe

@jax.jit
def v0(codes, unresolved, a):
    b, vwin, Pe = common(codes)
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    alive = unresolved & seed_live & vwin
    new = jnp.where(unresolved & ~alive, jnp.int32(-1), a)
    new = jnp.where(alive, jnp.int32(-2), new)
    return jnp.sum(new), jnp.sum(alive.astype(jnp.int32))

@jax.jit
def v1(codes, unresolved, a):
    b, vwin, Pe = common(codes)
    pad = 2 * Pe - P

    def pairs(x, fill):
        xp = jnp.concatenate([x, jnp.full((B, pad), fill, x.dtype)], axis=1)
        return xp.reshape(B, Pe, 2)

    un2 = pairs(unresolved, False)
    vw2 = pairs(vwin, False)
    a2 = pairs(a, jnp.int32(-1))
    bit = jnp.stack([(b & 1) == 1, ((b >> 1) & 1) == 1], axis=-1)
    alive2 = un2 & bit & vw2
    new2 = jnp.where(un2 & ~alive2, jnp.int32(-1), a2)
    new2 = jnp.where(alive2, jnp.int32(-2), new2)
    new = new2.reshape(B, 2 * Pe)[:, :P]
    return jnp.sum(new), jnp.sum(alive2.astype(jnp.int32))

@jax.jit
def v2(codes, unresolved, a):
    b, vwin, Pe = common(codes)
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    alive = unresolved & seed_live & vwin
    return jnp.sum(alive.astype(jnp.int32)), jnp.sum(vwin.astype(jnp.int32))

_, t0_ = timeit(v0, codes, unres, ansbuf, tag="V0 stack+reshape + writes")
_, t1_ = timeit(v1, codes, unres, ansbuf, tag="V1 pair-form elementwise")
_, t2_ = timeit(v2, codes, unres, ansbuf, tag="V2 same math, reduce only")
log(f"summary V0={t0_*1000:.0f} V1={t1_*1000:.0f} V2={t2_*1000:.0f}")
log("== r4_probe8 done ==")
