"""Round-4 probe 1: where do the 6.9 s of turbo3_hit0 go?

Phases timed separately on the real TPU (4 Mbp index, k=30, p=13,
arity-3 table, 4M all-random reads == the turbo3_hit0 bench regime):

  A. full current turbo_streaming_search         (expect ~6.9 s)
  B. pos0 only: seed gather + full-width walk + slow loop
  C. pos0 + chain scan (no patch)                (chain = C - B)
  D. full-width bitmap classify: pidx VPU + pair-bit gather [B, Pe]
  E. pooled-restart prototype: global compaction of ~6% live positions,
     window row-gather + seed gather + one arity-step, survivors counted

All data generated on device (tunnel uploads ~300 KB/s; never ship big
arrays).  Results appended to scratch/r4_probe1.log.
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
from sbwt_tpu.ops.turbo import (
    build_turbo, turbo_streaming_search, _walk_rem, _pidx_vwin, _pack_rem,
    _lf_from_seeds, _step, _clamp_pow2,
)
from sbwt_tpu.ops.search import compact_indices

import bench as benchmod

LOG = open("/root/repo/scratch/r4_probe1.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r4_probe1 start {time.strftime('%F %T')} ==")
t0 = time.perf_counter()
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
log(f"built index+turbo in {time.perf_counter()-t0:.1f}s")

codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
jax.block_until_ready(codes)
B, L = codes.shape
P = L - k + 1
n_q = B * P
index = sb.device_index

def _force(out):
    # block_until_ready is unreliable on the axon backend: fetch scalars
    return jax.tree.map(lambda x: np.asarray(x).sum(), out)

def timeit(fn, *args, tag="", reps=3):
    t0 = time.perf_counter()
    out = _force(fn(*args))
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts)//2]
    log(f"{tag}: median {med*1000:.0f} ms (reps {['%.0f'%(t*1000) for t in ts]}, warm {warm:.0f}s) "
        f"-> {n_q/med/1e6:.1f}M q/s-equiv")
    return out, med

# ---- A: full current engine -------------------------------------------------
@jax.jit
def runA(turbo, index, codes, lengths):
    out = turbo_streaming_search(turbo, index, codes, lengths)
    return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int32))

(_, hits), tA = timeit(runA, turbo, index, codes, lengths, tag="A full turbo_streaming hit0")

# ---- B: pos0 only -----------------------------------------------------------
@jax.jit
def runB(turbo, index, codes):
    from sbwt_tpu.ops.turbo import fast_search
    ans0, slow = fast_search(turbo, codes[:, :k])
    return jnp.sum(ans0), jnp.sum(slow.astype(jnp.int32))

(_, nslow0), tB = timeit(runB, turbo, index, codes, tag="B pos0 fast_search full-width")
log(f"   pos0 non-singleton lanes: {int(nslow0)} / {B}")

# ---- C: pos0 + chain scan (no patch) ---------------------------------------
@jax.jit
def runC(turbo, index, codes):
    from sbwt_tpu.ops.turbo import fast_search
    A_ = turbo.arity
    ans0, _ = fast_search(turbo, codes[:, :k])
    n_steps = -(-(P - 1) // A_)
    ext = jnp.concatenate(
        [codes[:, k:], jnp.full((B, n_steps * A_ - (P - 1)), -1, codes.dtype)], axis=1)
    xs = ext.T.reshape(n_steps, A_, B)
    def step(col, cs_step):
        cs = [cs_step[i].astype(jnp.int32) for i in range(A_)]
        outs = _step(turbo, col, cs, [c >= 0 for c in cs])
        return outs[A_ - 1], jnp.stack(outs)
    _, outs = lax.scan(step, ans0, xs)
    return jnp.sum(outs)

_, tC = timeit(runC, turbo, index, codes, tag="C pos0 + chain (all-dead lanes)")
log(f"   chain-only cost approx {1000*(tC-tB):.0f} ms")

# ---- C2: same chain but on hit-heavy codes (for comparison) ----------------
codes_hit = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=0.02)
jax.block_until_ready(codes_hit)
_, tC2 = timeit(runC, turbo, index, codes_hit, tag="C2 pos0 + chain (alive lanes, hit98 codes)")

# ---- D: full-width bitmap classify -----------------------------------------
p = turbo.precalc_k
@jax.jit
def runD(turbo, codes):
    rows = codes.astype(jnp.int32)
    pidx, vwin = _pidx_vwin(turbo, rows, P)
    Pe = (P + 1) // 2
    cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
    m = pidx[:, ::2] + cpair * jnp.int32(4**p)
    w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
    b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    alive = seed_live & vwin
    return jnp.sum(alive.astype(jnp.int32))

(nlive,), tD = timeit(lambda t, c: (runD(t, c),), turbo, codes, tag="D full-width bitmap classify")
log(f"   live positions: {int(nlive)} / {n_q} = {int(nlive)/n_q:.3f}")

# ---- E: pooled restart resolution prototype --------------------------------
# Global compaction of live positions + window gather + seed gather + one
# inline arity-step; survivors counted (would continue pooled as today).
@jax.jit
def runE(turbo, index, codes):
    rows_all = codes  # int8 [B, L]
    rowsi = rows_all.astype(jnp.int32)
    pidx, vwin = _pidx_vwin(turbo, rowsi, P)
    Pe = (P + 1) // 2
    cpair = (jnp.clip(rowsi[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
    m = pidx[:, ::2] + cpair * jnp.int32(4**p)
    w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
    b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
    live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
    seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
    alive = seed_live & vwin  # [B, P]
    work, cnt = compact_indices(alive)
    CH = 1 << 22
    pidx_f = pidx.ravel()
    codes_f = rows_all.ravel()
    rem = k - p
    A_ = turbo.arity
    warange = jnp.arange(rem, dtype=jnp.int32)

    def body(i, acc):
        sel = lax.dynamic_slice(work, (i * CH,), (CH,))
        selc = jnp.clip(sel, 0, B * P - 1)
        lane = selc // P
        pos = selc % P
        base = lane * L + pos + p
        win = codes_f[jnp.clip(base[:, None] + warange[None, :], 0, B * L - 1)].astype(jnp.int32)
        seed = turbo.precalc[pidx_f[selc]]
        l0, r0 = seed[:, 0], seed[:, 1]
        singleton = l0 == r0
        cs = [jnp.clip(win[:, min(j, rem - 1)], 0) & 3 for j in range(A_)]
        tv = jnp.ones_like(selc, dtype=bool)
        outs = _step(turbo, jnp.where(singleton & (sel < B * P), l0, -1), cs, [tv] * A_)
        col = outs[min(A_, rem) - 1]
        surv = (col >= 0) & (sel < B * P)
        return acc + jnp.sum(surv.astype(jnp.int32))

    n_tr = (cnt + CH - 1) // CH
    acc = lax.fori_loop(0, n_tr, body, jnp.int32(0))
    return acc, cnt

(surv, cnt), tE = timeit(runE, turbo, index, codes, tag="E bitmap + pooled seed/walk (global)")
log(f"   live {int(cnt)}, first-step survivors {int(surv)}")

log(f"summary: A={tA:.2f}s B={tB:.2f}s C={tC:.2f}s C2={tC2:.2f}s D={tD:.2f}s E={tE:.2f}s")
log("== r4_probe1 done ==")
