"""Round-5 probe 8: re-measure after take0>=3, split wide rows, pend
win2 reuse, win2 domain gating.

Cells: turbo3 hit0 4M (full), turbo1 hit50/hit0 8M, wide hit98/hit0 4M."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax

if "--wide" in sys.argv:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search
import bench as benchmod
from functools import partial

LOG = open("/root/repo/scratch/r5_probe8.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
genome = benchmod.make_corpus_codes()
P = read_len - k + 1
sb = SBWT.build([genome], k, precalc_k=13)

@partial(jax.jit, static_argnames=("hint",))
def run(turbo, index, codes, lengths, hint):
    out = turbo_streaming_search(turbo, index, codes, lengths, regime_hint=hint)
    return jnp.sum(out)

def measure(turbo, index, n_reads, frac, hint, label, seed=2):
    n_q = n_reads * P
    lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
    codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=seed, random_fraction=frac)
    jax.block_until_ready(codes)
    t0 = time.perf_counter()
    s = run(turbo, index, codes, lengths, hint)
    int(s)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s = run(turbo, index, codes, lengths, hint)
        int(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    log(f"{label}: {med*1000:.0f} ms ({n_q/med/1e6:.1f}M q/s, warm {warm:.0f}s)")
    del codes

if "--wide" in sys.argv:
    log(f"== r5_probe8 wide start {time.strftime('%F %T')} ==")
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
    measure(wturbo, wide_ix, 1 << 22, 0.02, "hit", "wide hit98 4M")
    measure(wturbo, wide_ix, 1 << 22, 1.0, "miss", "wide hit0 4M")
    log("== r5_probe8 wide done ==")
else:
    log(f"== r5_probe8 start {time.strftime('%F %T')} ==")
    t3 = build_turbo(sb.device_index, arity=3)
    jax.block_until_ready(t3.tbl)
    measure(t3, sb.device_index, 1 << 22, 1.0, "miss", "turbo3 hit0 4M")
    measure(t3, sb.device_index, 1 << 22, 0.5, "mid", "turbo3 hit50 4M")
    del t3
    t1 = build_turbo(sb.device_index, arity=1)
    jax.block_until_ready(t1.tbl)
    measure(t1, sb.device_index, 1 << 23, 0.5, "mid", "turbo1 hit50 8M")
    measure(t1, sb.device_index, 1 << 23, 1.0, "miss", "turbo1 hit0 8M")
    measure(t1, sb.device_index, 1 << 23, 0.02, "hit", "turbo1 hit98 8M")
    log("== r5_probe8 done ==")
