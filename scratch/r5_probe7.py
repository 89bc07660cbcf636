"""Round-5 probe 7: wide (int64) turbo tier anatomy at hit98/hit0.

widet1_hit98 = 46.4M (target >= 50M), widet1_hit0 = 29.4M.  Where does
the wide engine pay vs the narrow arity-1 tier (108.3M/65.8M)?  Stage
deltas + a raw [n, 8]-row gather rate measurement (is a 32 B row gather
slower than the narrow 16 B row?)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search
import bench as benchmod
from functools import partial

LOG = open("/root/repo/scratch/r5_probe7.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r5_probe7 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
di = sb.device_index
from sbwt_tpu.models.wide import from_packed_rows_wide

W_ = di.n_words
words = np.ascontiguousarray(np.asarray(di.rank_tbl)[:, 0]).view(np.uint32).reshape(4, W_)
sgs_w = np.ascontiguousarray(np.asarray(di.sgs_tbl)[:, 0]).view(np.uint32)
wide_ix = from_packed_rows_wide(
    words, di.n_nodes, sgs_w, k=k, n_kmers=di.n_kmers,
    precalc_k=di.precalc_k, precalc_table=np.asarray(di.precalc),
)
wturbo = build_turbo(wide_ix, arity=1)
jax.block_until_ready(wturbo.tbl)
P = read_len - k + 1
n_q = n_reads * P
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))

# raw row-gather rate: [n, 8] int32 rows vs [n, 4]
n = di.n_nodes
key = jax.random.PRNGKey(1)
idx = jax.random.randint(key, (1 << 23,), 0, n, dtype=jnp.int32)
tbl8 = wturbo.tbl
tbl4 = tbl8[:, :4]
jax.block_until_ready((idx, tbl4))

def chain_rows(tbl, idx, steps=8):
    def body(i, c):
        r = tbl[jnp.clip(c, 0)]
        s = r[:, 0] ^ r[:, 1] ^ r[:, -1]
        return jnp.clip(jnp.abs(s) % n, 0)
    return jax.lax.fori_loop(0, steps, body, idx).sum()

for lbl, t in (("row16 [n,4]", tbl4), ("row32 [n,8]", tbl8)):
    f = jax.jit(chain_rows, static_argnames=())
    s = f(t, idx); int(s)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); s = f(t, idx); int(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    log(f"dependent {lbl} gathers: {8 * idx.shape[0] / med / 1e6:.1f}M rows/s ({med*1000:.0f} ms)")

@partial(jax.jit, static_argnames=("stages", "hint"))
def run(turbo, index, codes, lengths, stages, hint):
    out = turbo_streaming_search(
        turbo, index, codes, lengths, _debug_stages=stages, regime_hint=hint
    )
    return jnp.sum(out)

for name, frac, hint in (("hit98", 0.02, "hit"), ("hit0", 1.0, "miss")):
    codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=frac)
    jax.block_until_ready(codes)
    prev = 0.0
    for stages in (1, 3, 4):
        t0 = time.perf_counter()
        s = run(wturbo, wide_ix, codes, lengths, stages, hint)
        int(s)
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            s = run(wturbo, wide_ix, codes, lengths, stages, hint)
            int(s)
            ts.append(time.perf_counter() - t0)
        med = min(ts)
        log(f"wide {name} stages={stages}: {med*1000:.0f} ms "
            f"({n_q/med/1e6:.1f}M q/s, warm {warm:.0f}s, delta {1000*(med-prev):.0f})")
        prev = med
    del codes
log("== r5_probe7 done ==")
