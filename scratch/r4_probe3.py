"""Round-4 probe 3: the regime-adaptive engine on real TPU, turbo-3,
hit98 / hit50 / hit0 with the honest (permutation) sampler.  One jit
program serves all three regimes (the conds are data-dependent), so one
compile covers the sweep."""
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

LOG = open("/root/repo/scratch/r4_probe3.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r4_probe3 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
index = sb.device_index
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
P = read_len - k + 1
n_q = n_reads * P

@jax.jit
def run(turbo, index, codes, lengths):
    out = turbo_streaming_search(turbo, index, codes, lengths)
    return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int32))

for name, frac in [("hit98", 0.02), ("hit50", 0.5), ("hit0", 1.0)]:
    codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=frac)
    t0 = time.perf_counter()
    s, h = run(turbo, index, codes, lengths)
    s, h = int(s), int(h)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        s, _ = run(turbo, index, codes, lengths)
        int(s)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[1]
    log(f"{name}: hit={h/n_q:.3f} median {med*1000:.0f} ms -> {n_q/med/1e6:.1f}M q/s "
        f"(reps {['%.0f'%(t*1000) for t in ts]}, warm {warm:.0f}s)")
    del codes

log("== r4_probe3 done ==")
