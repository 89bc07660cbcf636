import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, fast_search, _pair_step
from sbwt_tpu.ops.search import compact_indices

rng = np.random.default_rng(20260817)
genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=4_000_000).tobytes().decode()
k, read_len, n_reads = 30, 100, 262144
print("building...", flush=True)
sb = SBWT.build([genome], k, precalc_k=12)
turbo = build_turbo(sb.device_index)
jax.block_until_ready(turbo.pair_tbl)
print("built", flush=True)

from sbwt_tpu.utils.dna import encode_query
def mk_codes(seed):
    r = np.random.default_rng(seed)
    starts = r.integers(0, len(genome) - read_len, size=n_reads)
    reads = [genome[s:s+read_len] for s in starts]
    for i in r.integers(0, n_reads, size=n_reads // 50):
        reads[int(i)] = "".join(r.choice(list("ACGT"), size=read_len))
    return jnp.asarray(np.stack([encode_query(s) for s in reads]).astype(np.int8))

codes_list = [mk_codes(i) for i in range(3)]
B, L = codes_list[0].shape
P = L - k + 1
total = B * P

def timeit(f, argsets, tag, answers_per_call=None):
    s = int(jnp.asarray(f(*argsets[0])).sum())  # warmup incl fetch
    t0 = time.perf_counter()
    reps = 3
    acc = 0
    for i in range(reps):
        acc += int(jnp.asarray(f(*argsets[i % len(argsets)])).sum())
    dt = (time.perf_counter() - t0) / reps
    extra = f", {answers_per_call/dt/1e6:.1f}M/s" if answers_per_call else ""
    print(f"{tag}: {dt*1e3:7.1f} ms{extra}  (acc {acc & 0xffff})", flush=True)

f1 = jax.jit(lambda t, c: fast_search(t, c[:, :k])[0])
timeit(f1, [(turbo, c) for c in codes_list], "pos0 fast_search", answers_per_call=B)

def chain(t, c, ):
    a0 = jnp.zeros(B, jnp.int32)
    n_pairs = (P - 1 + 1) // 2
    ext = jnp.concatenate([c.astype(jnp.int32), jnp.full((B, 2), -1, jnp.int32)], axis=1)
    c1s = jnp.stack([ext[:, k + 2*j] for j in range(n_pairs)])
    c2s = jnp.stack([ext[:, k + 2*j+1] for j in range(n_pairs)])
    def step(col, cs):
        c1, c2 = cs
        n1, n2 = _pair_step(t, col, c1, c2, c1 >= 0, c2 >= 0)
        return n2, n1 + n2
    _, outs = lax.scan(step, a0, (c1s, c2s))
    return outs
f2 = jax.jit(chain)
timeit(f2, [(turbo, c) for c in codes_list], "chain 35 pair steps", answers_per_call=B*(P-1))

masks = [jnp.zeros(total, dtype=bool).at[jnp.asarray(np.random.default_rng(i).integers(0, total, 400000))].set(True) for i in range(3)]
f3 = jax.jit(lambda m: jnp.nonzero(m, size=total, fill_value=total)[0][:100])
timeit(f3, [(m,) for m in masks], "jnp.nonzero(18.6M)")
f3b = jax.jit(lambda m: compact_indices(m)[0][:100])
timeit(f3b, [(m,) for m in masks], "compact_indices(18.6M)")

codes_flat = codes_list[0].astype(jnp.int32).ravel()
karange = jnp.arange(k, dtype=jnp.int32)
sels = [jnp.asarray(np.random.default_rng(i).integers(0, total, size=32768, dtype=np.int32)) for i in range(3)]
def patch_chunk(t, cf, sel):
    lane = sel // P
    pos = sel % P
    base = lane * L + pos
    win = cf[jnp.clip(base[:, None] + karange[None, :], 0, B * L - 1)]
    return fast_search(t, win)[0]
f4 = jax.jit(patch_chunk)
timeit(f4, [(turbo, codes_flat, s) for s in sels], "patch chunk 32768", answers_per_call=32768)

from sbwt_tpu.ops.turbo import turbo_streaming_search
f5 = jax.jit(turbo_streaming_search)
lengths = jnp.full(B, read_len, dtype=jnp.int32)
timeit(f5, [(turbo, sb.device_index, c, lengths) for c in codes_list], "FULL turbo_streaming", answers_per_call=total)
