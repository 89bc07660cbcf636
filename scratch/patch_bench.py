"""Isolate restart-patch cost: clean batch (no dirty lanes) vs 2% dirty,
plus slow-fallback on/off via a monkeypatched chunk count."""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import sys

sys.path.insert(0, "/root/repo")

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops import turbo as T

from bench import make_corpus_codes, sample_read_codes

k = 30
read_len = 100
n_reads = 1 << 20
genome = make_corpus_codes()
t0 = time.perf_counter()
sbwt = SBWT.build([genome], k, precalc_k=12)
print(f"built in {time.perf_counter()-t0:.1f}s", flush=True)
turbo = T.build_turbo(sbwt.device_index)
jax.block_until_ready(turbo.pair_tbl)
index = sbwt.device_index

lengths = np.full(n_reads, read_len, dtype=np.int32)
lengths_d = jnp.asarray(lengths)
B = n_reads
P = read_len - k + 1


def timeit(name, fn, *a, reps=3, n_items=None):
    out = fn(*a)
    acc = int(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
        acc += int(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    rate = f", {n_items/dt/1e6:7.1f}M/s" if n_items else ""
    print(f"{name:42s} {dt*1e3:8.1f} ms{rate}  (acc {acc & 0xffff})", flush=True)
    return dt


f_full = lambda tb, ix, c: T.turbo_streaming_jit(tb, ix, c, lengths_d)

# clean batch: no random reads (1 lane replaced to keep code path identical)
rng = np.random.default_rng(1)
starts = rng.integers(0, len(genome) - read_len, size=n_reads)
clean = genome[starts[:, None] + np.arange(read_len)]
codes_clean = jnp.asarray(clean)
timeit("FULL, clean (0 dirty lanes)", f_full, turbo, index, codes_clean, n_items=B * P)

# 2% dirty (the bench workload)
codes2 = jnp.asarray(sample_read_codes(genome, n_reads, read_len))
timeit("FULL, 2pct dirty", f_full, turbo, index, codes2, n_items=B * P)

# 10% dirty: how does patch scale
codes10 = sample_read_codes(genome, n_reads, read_len)
rows = rng.integers(0, n_reads, size=n_reads // 10)
codes10[rows] = rng.integers(0, 4, size=(len(rows), read_len), dtype=np.int8)
codes10 = jnp.asarray(codes10)
timeit("FULL, 10pct dirty", f_full, turbo, index, codes10, n_items=B * P)
