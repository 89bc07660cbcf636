"""Round-4 probe 2: primitives for the redesigned (pooled) patch pass.

With the sampler fixed (permutation prefix), hit0 is truly all-random.
Measures on the real TPU, 4 Mbp index / arity-3 turbo / 4M reads:

  R0  current engine on TRUE hit0 codes (baseline to beat)
  R1  row scatter: ans.at[lanes].set(rows) for 2M [71]-rows into [4M,71]
  R2  scalar scatter: 18M int32 into a 298M flat answer array
  R3  packed-window row gather: [18M, 3] uint32 words from [4M, 7]
  R4  precalc row gather: 18M from the 537 MB table
  R5  turbo tbl row gather: 18M from the 4 GB table
  R6  compact_indices over a 298M mask
  R7  compacted chain: code row gather [1M, L] + scan + row scatter
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
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search, _step
from sbwt_tpu.ops.search import compact_indices

import bench as benchmod

LOG = open("/root/repo/scratch/r4_probe2.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r4_probe2 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
B, L = codes.shape
P = L - k + 1
n_q = B * P
index = sb.device_index
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))

def _force(out):
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
    log(f"{tag}: median {med*1000:.0f} ms (reps {['%.0f'%(t*1000) for t in ts]}, warm {warm:.0f}s)")
    return out, med

# ---- R0: current engine, honest hit0 ---------------------------------------
@jax.jit
def run0(turbo, index, codes, lengths):
    out = turbo_streaming_search(turbo, index, codes, lengths)
    return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int32))

(chk, hits), t0_ = timeit(run0, turbo, index, codes, lengths, tag="R0 current engine TRUE hit0")
log(f"   hits {int(hits)} / {n_q} = {int(hits)/n_q:.4f}; {n_q/t0_/1e6:.1f}M q/s")

# ---- R1: row scatter --------------------------------------------------------
n_sc = 1 << 21
key = jax.random.PRNGKey(0)
lanes = jax.random.permutation(key, B)[:n_sc].astype(jnp.int32)
rows_val = jnp.ones((n_sc, P), dtype=jnp.int32)
ansbuf = jnp.zeros((B, P), dtype=jnp.int32)
@jax.jit
def r1(a, lanes, rows):
    return jnp.sum(a.at[lanes].set(rows, mode="drop"))
_, t1 = timeit(r1, ansbuf, lanes, rows_val, tag=f"R1 row scatter {n_sc} x[{P}]")
log(f"   {n_sc/t1/1e6:.1f}M rows/s, {n_sc*P/t1/1e6:.1f}M elems/s")

# ---- R2: scalar scatter -----------------------------------------------------
n_fs = 18 << 20
flat = jnp.zeros(B * P, dtype=jnp.int32)
sel = jax.random.permutation(key, B * P)[:n_fs].astype(jnp.int32)
@jax.jit
def r2(a, sel):
    return jnp.sum(a.at[sel].set(-1, mode="drop"))
_, t2 = timeit(r2, flat, sel, tag=f"R2 scalar scatter {n_fs/1e6:.0f}M into {B*P/1e6:.0f}M")
log(f"   {n_fs/t2/1e6:.1f}M elems/s")

# ---- R3: packed-window row gather ------------------------------------------
NW = 7
packed = jax.random.randint(key, (B, NW), 0, 2**31 - 1, dtype=jnp.int32)
lane_of = (sel // P).astype(jnp.int32)
@jax.jit
def r3(packed, lane_of):
    w = packed[lane_of[:, None], jnp.arange(3)[None, :]]  # [n_fs, 3]
    return jnp.sum(w)
_, t3 = timeit(r3, packed, lane_of, tag=f"R3 packed-window [3]-row gather {n_fs/1e6:.0f}M from 112MB")
log(f"   {n_fs/t3/1e6:.1f}M rows/s")

# ---- R3b: same via dynamic-slice-style flat row gather ---------------------
packed_f = packed.reshape(-1)
@jax.jit
def r3b(packed_f, lane_of):
    base = lane_of * NW
    w = packed_f[base[:, None] + jnp.arange(3)[None, :]]
    return jnp.sum(w)
_, t3b = timeit(r3b, packed_f, lane_of, tag="R3b same, flat base+offset gather")
log(f"   {n_fs/t3b/1e6:.1f}M rows/s")

# ---- R4: precalc row gather -------------------------------------------------
pidx = jax.random.randint(key, (n_fs,), 0, 4**13, dtype=jnp.int32)
@jax.jit
def r4(precalc, pidx):
    return jnp.sum(precalc[pidx])
_, t4 = timeit(r4, turbo.precalc, pidx, tag=f"R4 precalc [2]-row gather {n_fs/1e6:.0f}M from 537MB")
log(f"   {n_fs/t4/1e6:.1f}M rows/s")

# ---- R5: turbo tbl row gather ----------------------------------------------
cols = jax.random.randint(key, (n_fs,), 0, turbo.n_nodes, dtype=jnp.int32)
subs = jax.random.randint(key, (n_fs,), 0, 64, dtype=jnp.int32)
@jax.jit
def r5(turbo, cols, subs):
    return jnp.sum(turbo.tbl_row_sub(cols, subs))
_, t5 = timeit(r5, turbo, cols, subs, tag=f"R5 tbl [4]-row gather {n_fs/1e6:.0f}M from 4GB")
log(f"   {n_fs/t5/1e6:.1f}M rows/s")

# ---- R6: compact over 298M --------------------------------------------------
mask = jax.random.bernoulli(key, 0.06, (B * P,))
@jax.jit
def r6(mask):
    work, cnt = compact_indices(mask)
    return jnp.sum(work[:1024]), cnt
_, t6 = timeit(r6, mask, tag="R6 compact_indices over 298M (6% set)")

# ---- R7: compacted chain ----------------------------------------------------
n_al = 1 << 20
al_lanes = jax.random.permutation(key, B)[:n_al].astype(jnp.int32)
a0 = jax.random.randint(key, (n_al,), 0, turbo.n_nodes, dtype=jnp.int32)
A_ = turbo.arity
n_steps = -(-(P - 1) // A_)
@jax.jit
def r7(turbo, codes, al_lanes, a0):
    rows = codes[al_lanes]  # [n_al, L] int8 row gather
    ext = jnp.concatenate(
        [rows[:, k:], jnp.full((n_al, n_steps * A_ - (P - 1)), -1, rows.dtype)], axis=1)
    xs = ext.T.reshape(n_steps, A_, n_al)
    def step(col, cs_step):
        cs = [cs_step[i].astype(jnp.int32) for i in range(A_)]
        outs = _step(turbo, col, cs, [c >= 0 for c in cs])
        return outs[A_ - 1], jnp.stack(outs)
    _, outs = lax.scan(step, a0, xs)
    return jnp.sum(outs)
_, t7 = timeit(r7, turbo, codes, al_lanes, a0, tag=f"R7 compacted chain {n_al/1e6:.1f}M lanes x{n_steps} steps")
log(f"   {n_al*(P-1)/t7/1e6:.1f}M chain answers/s")

log(f"summary R0={t0_:.2f} R1={t1*1000:.0f}ms R2={t2*1000:.0f}ms R3={t3*1000:.0f}ms "
    f"R3b={t3b*1000:.0f}ms R4={t4*1000:.0f}ms R5={t5*1000:.0f}ms R6={t6*1000:.0f}ms R7={t7*1000:.0f}ms")
log("== r4_probe2 done ==")
