import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

def timeit(f, argsets, tag, per_call):
    int(jnp.asarray(f(*argsets[0])).sum())
    t0 = time.perf_counter(); reps = 3; acc = 0
    for i in range(reps):
        acc += int(jnp.asarray(f(*argsets[i % len(argsets)])).sum())
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag}: {dt*1e3:8.1f} ms, {per_call/dt/1e6:7.1f}M gathers/s", flush=True)

N = 4_000_000
STEPS = 16
key = jax.random.PRNGKey(0)
pair = jax.random.randint(key, (N * 16, 2), 0, N, dtype=jnp.int32)   # 512MB
small = jax.random.randint(key, (N * 4,), 0, N, dtype=jnp.int32)     # 64MB
jax.block_until_ready((pair, small))

for B in [262144, 1048576]:
    idxs = [jax.random.randint(jax.random.PRNGKey(i+1), (B,), 0, N, dtype=jnp.int32) for i in range(3)]
    def chain_pair(tbl, i0):
        def step(j, col):
            row = tbl[(col << 4) + (j & 15)]
            return row[..., 1] % N
        return lax.fori_loop(0, STEPS, step, i0)
    f = jax.jit(chain_pair)
    timeit(f, [(pair, i) for i in idxs], f"pair 512MB  B={B:7d}", B * STEPS)

    def chain_small(tbl, i0):
        def step(j, col):
            return tbl[(col << 2) + (j & 3)] % N
        return lax.fori_loop(0, STEPS, step, i0)
    f = jax.jit(chain_small)
    timeit(f, [(small, i) for i in idxs], f"small 64MB  B={B:7d}", B * STEPS)
