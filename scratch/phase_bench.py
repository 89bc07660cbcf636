import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, fast_search, _pair_step
from sbwt_tpu.ops.search import search_batch

rng = np.random.default_rng(20260817)
genome = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=4_000_000).tobytes().decode()
k, read_len, n_reads = 30, 100, 262144
print("building...", flush=True)
sb = SBWT.build([genome], k, precalc_k=12)
turbo = build_turbo(sb.device_index)
jax.block_until_ready(turbo.pair_tbl)
print("built", flush=True)

starts = rng.integers(0, len(genome) - read_len, size=n_reads)
reads = [genome[s:s+read_len] for s in starts]
n_rand = n_reads // 50
for i in rng.integers(0, n_reads, size=n_rand):
    reads[int(i)] = "".join(rng.choice(list("ACGT"), size=read_len))
from sbwt_tpu.utils.dna import encode_query
codes = jnp.asarray(np.stack([encode_query(s) for s in reads]).astype(np.int8))
B, L = codes.shape
P = L - k + 1
total = B * P

def timeit(f, *args, reps=3, tag=""):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:.1f} ms", flush=True)
    return out

# phase 1: pos-0 fast search over all lanes
f1 = jax.jit(lambda t, c: fast_search(t, c[:, :k]))
ans0 = timeit(f1, turbo, codes, tag="pos0 fast_search (262k lanes)")

# phase 2: chain only
def chain(t, c, a0):
    n_pairs = (P - 1 + 1) // 2
    ext = jnp.concatenate([c.astype(jnp.int32), jnp.full((B, 2), -1, jnp.int32)], axis=1)
    c1s = jnp.stack([ext[:, k + 2*j] for j in range(n_pairs)])
    c2s = jnp.stack([ext[:, k + 2*j+1] for j in range(n_pairs)])
    def step(col, cs):
        c1, c2 = cs
        n1, n2 = _pair_step(t, col, c1, c2, c1 >= 0, c2 >= 0)
        return n2, jnp.stack([n1, n2])
    _, outs = lax.scan(step, a0, (c1s, c2s))
    return outs
f2 = jax.jit(chain)
timeit(f2, turbo, codes, ans0[0], tag="chain 35 pair steps")

# phase 3: nonzero cost over total
f3 = jax.jit(lambda m: jnp.nonzero(m, size=total, fill_value=total)[0])
mask = jnp.zeros(total, dtype=bool).at[jnp.arange(0, total, 50)].set(True)
timeit(f3, mask, tag=f"nonzero(size={total})")

# phase 4: one patch chunk: window gather + fast search (32768)
codes_flat = codes.astype(jnp.int32).ravel()
karange = jnp.arange(k, dtype=jnp.int32)
sel = jnp.asarray(rng.integers(0, total, size=32768, dtype=np.int32))
def patch_chunk(t, cf, sel):
    lane = sel // P
    pos = sel % P
    base = lane * L + pos
    win = cf[jnp.clip(base[:, None] + karange[None, :], 0, B * L - 1)]
    return fast_search(t, win)
f4 = jax.jit(patch_chunk)
timeit(f4, turbo, codes_flat, sel, tag="patch chunk 32768 (window gather + fast search)")

# phase 5: scatter cost
f5 = jax.jit(lambda a, s, v: a.at[s].set(v, mode="drop"))
af = jnp.zeros(total, dtype=jnp.int32)
timeit(f5, af, sel, jnp.zeros(32768, jnp.int32), tag="scatter 32768 into 18.6M")
