"""Lane-scaling experiment: headline bench at configurable n_reads.

Usage: python scratch/bench_lanes.py <log2_reads> [reps]
Same workload as bench.py; reports answers/s at that lane count.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    log2_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import make_corpus_codes, sample_read_codes
    from sbwt_tpu.models.sbwt import SBWT
    from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_jit
    from sbwt_tpu.utils.logging import write_log

    k = 30
    read_len = 100
    n_reads = 1 << log2_reads
    genome_codes = make_corpus_codes()
    t0 = time.perf_counter()
    sbwt = SBWT.build([genome_codes], k, precalc_k=13)
    write_log(f"built in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    turbo = build_turbo(sbwt.device_index, arity=3)
    jax.block_until_ready(turbo.tbl)
    write_log(f"turbo built in {time.perf_counter()-t0:.1f}s")

    codes = sample_read_codes(genome_codes, n_reads, read_len)
    lengths = np.full(n_reads, read_len, dtype=np.int32)
    codes_d = jnp.asarray(codes)
    lengths_d = jnp.asarray(lengths)
    qpb = n_reads * (read_len - k + 1)

    out = turbo_streaming_jit(turbo, sbwt.device_index, codes_d, lengths_d)
    hit = float(jnp.mean((out >= 0).astype(jnp.float32)))
    write_log(f"{n_reads} reads, {qpb} q/batch, hit {hit:.3f}")

    t0 = time.perf_counter()
    acc = 0
    for _ in range(reps):
        out = turbo_streaming_jit(turbo, sbwt.device_index, codes_d, lengths_d)
        acc += int(jnp.sum(out))
    dt = time.perf_counter() - t0
    qps = qpb * reps / dt
    print(json.dumps({"n_reads_log2": log2_reads, "qps": round(qps), "s_per_batch": dt / reps}))


if __name__ == "__main__":
    main()
