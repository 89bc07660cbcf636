"""Phase-level timing of the committed turbo_streaming_search at bench shapes.

All device arrays are passed as jit ARGUMENTS (closures would ship them
as constants in the axon remote-compile request -> HTTP 413)."""
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
from sbwt_tpu.ops.turbo import build_turbo, fast_search, turbo_streaming_jit, _pair_step
from sbwt_tpu.ops.search import compact_indices

from bench import make_corpus_codes, sample_read_codes

k = 30
read_len = 100
n_reads = 1 << 20
genome = make_corpus_codes()
print("building...", flush=True)
t0 = time.perf_counter()
sbwt = SBWT.build([genome], k, precalc_k=12)
print(f"built in {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
turbo = build_turbo(sbwt.device_index)
jax.block_until_ready(turbo.pair_tbl)
print(f"turbo in {time.perf_counter()-t0:.1f}s", flush=True)
index = sbwt.device_index

codes = sample_read_codes(genome, n_reads, read_len)
lengths = np.full(n_reads, read_len, dtype=np.int32)
codes_d = jnp.asarray(codes)
lengths_d = jnp.asarray(lengths)
B, L = codes.shape
P = L - k + 1


def timeit(name, fn, *a, reps=3, n_items=None):
    out = fn(*a)
    acc = int(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
        acc += int(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    dt = (time.perf_counter() - t0) / reps
    rate = f", {n_items/dt/1e6:7.1f}M/s" if n_items else ""
    print(f"{name:36s} {dt*1e3:8.1f} ms{rate}  (acc {acc & 0xffff})", flush=True)
    return dt


f_fs = jax.jit(lambda tb, c: fast_search(tb, c[:, :k])[0])
timeit("pos0 fast_search (1M lanes)", f_fs, turbo, codes_d, n_items=B)


def chain_only(tb, codes):
    codes = codes.astype(jnp.int32)
    ans0, _ = fast_search(tb, codes[:, :k])
    n_pairs = (P - 1 + 1) // 2
    ext = jnp.concatenate([codes, jnp.full((B, 2), -1, jnp.int32)], axis=1)
    c1s = jnp.stack([ext[:, k + 2 * j] for j in range(n_pairs)])
    c2s = jnp.stack([ext[:, k + 2 * j + 1] for j in range(n_pairs)])

    def step(col, cs):
        c1, c2 = cs
        n1, n2 = _pair_step(tb, col, c1, c2, c1 >= 0, c2 >= 0)
        return n2, jnp.stack([n1, n2])

    _, outs = jax.lax.scan(step, ans0, (c1s, c2s))
    return outs


f_chain = jax.jit(chain_only)
timeit("fast_search + chain (70 pos)", f_chain, turbo, codes_d, n_items=B * P)


def detect_compact(tb, codes):
    """chain + dirty detection + lane compaction, NO patching."""
    codes = codes.astype(jnp.int32)
    outs = chain_only(tb, codes)
    rest = outs.transpose(2, 0, 1).reshape(B, -1)[:, : P - 1]
    ans0 = outs[0, 0]
    ans = jnp.concatenate([ans0[:, None], rest], axis=1)
    unresolved = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), ans[:, :-1] == -1], axis=1
    )
    dirty = jnp.any(unresolved, axis=1)
    lanes_work, n_dirty = compact_indices(dirty)
    return jnp.sum(lanes_work) + n_dirty


f_dc = jax.jit(detect_compact)
timeit("chain + detect + lane compaction", f_dc, turbo, codes_d, n_items=B * P)

f_full = lambda tb, ix, c: turbo_streaming_jit(tb, ix, c, lengths_d)
timeit("FULL turbo_streaming", f_full, turbo, index, codes_d, n_items=B * P)
