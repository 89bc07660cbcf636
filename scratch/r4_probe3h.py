"""Round-4: hinted regime measurement (the bench configuration) —
turbo3 with regime_hint matching each batch."""
import sys, time
from functools import partial
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

LOG = open("/root/repo/scratch/r4_probe3h.log", "a")
def log(msg):
    print(msg, flush=True)
    LOG.write(msg + "\n"); LOG.flush()

k, read_len = 30, 100
n_reads = 1 << 22
genome = benchmod.make_corpus_codes()
log(f"== r4_probe3h start {time.strftime('%F %T')} ==")
sb = SBWT.build([genome], k, precalc_k=13)
turbo = build_turbo(sb.device_index, arity=3)
jax.block_until_ready(turbo.tbl)
index = sb.device_index
lengths = jnp.asarray(np.full(n_reads, read_len, dtype=np.int32))
P = read_len - k + 1
n_q = n_reads * P

for name, frac, hint in [("hit98", 0.02, "hit"), ("hit50", 0.5, "mid"), ("hit0", 1.0, "miss")]:
    @partial(jax.jit, static_argnames=())
    def run(turbo, index, codes, lengths, _h=hint):
        out = turbo_streaming_search(turbo, index, codes, lengths, regime_hint=_h)
        return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int32))

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
    log(f"{name} hint={hint}: hit={h/n_q:.3f} median {med*1000:.0f} ms -> {n_q/med/1e6:.1f}M q/s "
        f"(warm {warm:.0f}s)")
    del codes

log("== r4_probe3h done ==")
