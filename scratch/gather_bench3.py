import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 4_600_000
print("creating table on device...", flush=True)
t0 = time.perf_counter()
key = jax.random.PRNGKey(0)
pair = jax.random.randint(key, (16 * N, 2), 0, N, dtype=jnp.int32)
jax.block_until_ready(pair)
print(f"table ready in {time.perf_counter()-t0:.1f}s", flush=True)

def timeit(f, *args, iters=5):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

STEPS = 16
for B in [262144]:
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, N, dtype=jnp.int32)
    def f(idx0):
        def step(i, col):
            row = pair[(col << 4) + (i & 15)]
            return row[..., 1] % N
        return lax.fori_loop(0, STEPS, step, idx0)
    fj = jax.jit(f)
    dt = timeit(fj, idx0)
    g = B * STEPS / dt
    print(f"B={B:7d} pair590MB: {dt*1e3:7.2f} ms, {g/1e6:7.1f}M gathers/s -> {2*g/1e6:.0f}M answers/s", flush=True)
