"""Round-5 probe 6: arity-1 (turbo1) stage anatomy at hit50 vs hit0.

Round-4 inversion: turbo1_hit50 = 57.7M < turbo1_hit0 = 65.8M (8M reads)
while turbo3 orders the other way.  Stage deltas under the bench hints
('mid' for hit50, 'miss' for hit0) locate where the mid regime pays."""
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

LOG = open("/root/repo/scratch/r5_probe6.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 23
genome = benchmod.make_corpus_codes()
log(f"== r5_probe6 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=1)
jax.block_until_ready(turbo.tbl)
index = sb.device_index
P = read_len - k + 1
n_q = n_reads * P
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))

@partial(jax.jit, static_argnames=("stages", "hint"))
def run(turbo, index, codes, lengths, stages, hint):
    out = turbo_streaming_search(
        turbo, index, codes, lengths, _debug_stages=stages, regime_hint=hint
    )
    return jnp.sum(out)

for name, frac, hint in (("hit50", 0.5, "mid"), ("hit0", 1.0, "miss"),
                         ("hit50-as-miss", 0.5, "miss")):
    codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=frac)
    jax.block_until_ready(codes)
    prev = 0.0
    for stages in (1, 3, 4):
        t0 = time.perf_counter()
        s = run(turbo, index, codes, lengths, stages, hint)
        int(s)
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            s = run(turbo, index, codes, lengths, stages, hint)
            int(s)
            ts.append(time.perf_counter() - t0)
        med = min(ts)
        log(f"{name} hint={hint} stages={stages}: {med*1000:.0f} ms "
            f"({n_q/med/1e6:.1f}M q/s, warm {warm:.0f}s, delta {1000*(med-prev):.0f})")
        prev = med
    del codes
log("== r5_probe6 done ==")
