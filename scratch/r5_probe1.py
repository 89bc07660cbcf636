"""Round-5 probe 1: HINTED stage anatomy at hit0 + sweep chunk-cap sweep.

Round 4 closed at 76.1M q/s TRUE hit0 vs the §4d floor of ~119M; the
unhinted stage deltas were chain 0.26 / classification ~2.4 / sweep ~1.7-2.0
/ pend ~0.5 s.  This probe measures the same deltas under regime_hint='miss'
(the bench path) and sweeps _SWEEP_CHUNK_CAP 2^21 -> 2^23 for the resolver
occupancy question, plus times the adaptive auto engine steady state."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sbwt_tpu.models.sbwt import SBWT
import sbwt_tpu.ops.turbo as turbo_mod
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search
import bench as benchmod
from functools import partial

LOG = open("/root/repo/scratch/r5_probe1.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r5_probe1 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
index = sb.device_index
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
P = read_len - k + 1
n_q = n_reads * P

codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
jax.block_until_ready(codes)

def timed(fn, label, reps=3):
    t0 = time.perf_counter()
    s = fn()
    jax.block_until_ready(s)
    int(np.asarray(s).ravel()[0])
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = fn()
        int(np.asarray(s).ravel()[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    log(f"{label}: {med*1000:.0f} ms ({n_q/med/1e6:.1f}M q/s, warm {warm:.0f}s)")
    return med

# 1) hinted stage anatomy
prev = 0.0
for stages in (1, 2, 3, 4):
    @partial(jax.jit, static_argnames=("stages",))
    def run(turbo, index, codes, lengths, stages):
        out = turbo_streaming_search(
            turbo, index, codes, lengths, _debug_stages=stages, regime_hint="miss"
        )
        return jnp.sum(out)
    med = timed(lambda: run(turbo, index, codes, lengths, stages), f"hinted-miss stages={stages}")
    log(f"   delta {1000*(med-prev):.0f} ms")
    prev = med

# 2) sweep chunk cap
for cap_log2 in (22, 23):
    turbo_mod._SWEEP_CHUNK_CAP = 1 << cap_log2
    def _mk():
        @jax.jit
        def run_c(turbo, index, codes, lengths):
            out = turbo_streaming_search(
                turbo, index, codes, lengths, regime_hint="miss"
            )
            return jnp.sum(out)
        return run_c
    run_c = _mk()
    timed(lambda: run_c(turbo, index, codes, lengths), f"full hinted-miss cap=2^{cap_log2}")
turbo_mod._SWEEP_CHUNK_CAP = 1 << 21

# 3) adaptive auto engine steady state (the *_auto cell's inner loop)
from sbwt_tpu.ops.turbo import AdaptiveTurboEngine
eng = AdaptiveTurboEngine(turbo, index)
def auto_run():
    s, h = eng.search_reduced(codes, lengths)
    return s
timed(auto_run, "auto engine steady-state (miss)", reps=4)
log(f"   engine hint after: {eng.hint}")
log("== r5_probe1 done ==")
