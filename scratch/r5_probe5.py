"""Round-5 probe 5: hinted hit0 after the pend lane-compaction, at 4M and
8M reads; stage anatomy deltas."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search
import bench as benchmod
from functools import partial

LOG = open("/root/repo/scratch/r5_probe5.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
genome = benchmod.make_corpus_codes()
log(f"== r5_probe5 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
index = sb.device_index

@partial(jax.jit, static_argnames=("stages",))
def run(turbo, index, codes, lengths, stages):
    out = turbo_streaming_search(
        turbo, index, codes, lengths, _debug_stages=stages, regime_hint="miss"
    )
    return jnp.sum(out)

for n_reads in (1 << 22,):
    P = read_len - k + 1
    n_q = n_reads * P
    lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
    codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=1.0)
    jax.block_until_ready(codes)
    prev = 0.0
    stage_list = (3, 4) if n_reads == 1 << 22 else (4,)
    for stages in stage_list:
        t0 = time.perf_counter()
        s = run(turbo, index, codes, lengths, stages)
        int(s)
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = run(turbo, index, codes, lengths, stages)
            int(s)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[1]
        log(f"reads=2^{n_reads.bit_length()-1} stages={stages}: {med*1000:.0f} ms "
            f"({n_q/med/1e6:.1f}M q/s, warm {warm:.0f}s)")
    del codes
log("== r5_probe5 done ==")
