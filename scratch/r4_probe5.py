"""Round-4 probe 5: stage anatomy of the sweep-v2 engine at hit0/hit50.

_debug_stages: 1 = pos0+chain, 2 = +bitmap classification trips,
3 = +block sweep, 4 = full (+pend pass)."""
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

LOG = open("/root/repo/scratch/r4_probe5.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r4_probe5 start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
index = sb.device_index
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
P = read_len - k + 1
n_q = n_reads * P

@partial(jax.jit, static_argnames=("stages",))
def run(turbo, index, codes, lengths, stages):
    out = turbo_streaming_search(turbo, index, codes, lengths, _debug_stages=stages)
    return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int32))

for name, frac in [("hit0", 1.0), ("hit50", 0.5), ("hit98", 0.02)]:
    codes = benchmod.sample_read_codes_device(genome, n_reads, read_len, seed=2, random_fraction=frac)
    jax.block_until_ready(codes)
    prev = 0.0
    for stages in (1, 2, 3, 4):
        t0 = time.perf_counter()
        s, h = run(turbo, index, codes, lengths, stages)
        int(s)
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, _ = run(turbo, index, codes, lengths, stages)
            int(s)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[1]
        log(f"{name} stages={stages}: {med*1000:.0f} ms (delta {1000*(med-prev):.0f} ms, warm {warm:.0f}s)")
        prev = med
    del codes

log("== r4_probe5 done ==")
