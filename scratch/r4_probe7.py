"""Round-4 probe 7: (a) environment-drift check — rerun probe1's exact
full-width bitmap classify program (cached compile) and compare with its
02:46 measurement of 1469 ms; (b) w3 word-gather variants."""
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

LOG = open("/root/repo/scratch/r4_probe7.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
B, L = n_reads, read_len
P = L - k + 1
genome = benchmod.make_corpus_codes()
log(f"== r4_probe7 start {time.strftime('%F %T')} ==")
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
    return out, med

# ---- A: probe1's runD verbatim ----------------------------------------------
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

_, tD = timeit(lambda t, c: (runD(t, c),), turbo, codes, tag="A probe1-D rerun (was 1469 ms at 02:46)")

# ---- B: bare bitmap gather --------------------------------------------------
key = jax.random.PRNGKey(0)
m_idx = jax.random.randint(key, (B, (P + 1) // 2), 0, 4**(p + 1) // 16, jnp.int32)

@jax.jit
def bare(turbo, m_idx):
    return jnp.sum(turbo.seed_bits[m_idx])

_, tB = timeit(bare, turbo, m_idx, tag=f"B bare bitmap gather [{B}x{(P+1)//2}]")
log(f"   rate {B*((P+1)//2)/tB/1e6:.1f}M gathers/s")

# ---- C: w3 word fetch variants at 2M lanes, 9 reps --------------------------
NW = 9
packed_f = jax.random.randint(key, (B * NW,), 0, 2**31 - 1, jnp.int32)
packed2d = packed_f.reshape(B, NW)
sel = jax.random.randint(jax.random.PRNGKey(1), (1 << 21,), 0, B * P - 1, jnp.int32)

@jax.jit
def c_scalar3(packed_f, sel):
    def body(i, acc):
        fp = (sel + i * 7) % (B * P)
        lane = fp // P
        wi = lane * NW + ((fp % P) >> 4)
        return acc + jnp.sum(packed_f[wi]) + jnp.sum(packed_f[wi + 1]) + jnp.sum(packed_f[wi + 2])
    return lax.fori_loop(0, 9, body, jnp.int32(0))
_, tC1 = timeit(c_scalar3, packed_f, sel, tag="C1 3 separate scalar gathers 9x2M")

@jax.jit
def c_fullrow(packed2d, sel):
    def body(i, acc):
        fp = (sel + i * 7) % (B * P)
        lane = fp // P
        row = packed2d[lane]  # whole [NW] row, one gather
        return acc + jnp.sum(row)
    return lax.fori_loop(0, 9, body, jnp.int32(0))
_, tC2 = timeit(c_fullrow, packed2d, sel, tag="C2 whole 9-word lane-row gather 9x2M")

log(f"summary D={tD*1000:.0f} B={tB*1000:.0f} C1={tC1*1000:.0f} C2={tC2*1000:.0f}")
log("== r4_probe7 done ==")
