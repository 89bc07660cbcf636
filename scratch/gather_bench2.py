import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 4_600_000
rng = np.random.default_rng(0)

def timeit(f, *args, iters=5):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

STEPS = 16
for B in [65536, 262144]:
    idx0 = jnp.asarray(rng.integers(0, N, size=B, dtype=np.int32))
    for name, shape, width in [("flat4B", (N,), 1), ("row16B", (N, 4), 4)]:
        tbl = jnp.asarray(rng.integers(0, N, size=shape, dtype=np.int32))
        def f(idx0, tbl=tbl, width=width):
            def step(i, idx):
                if width == 1:
                    return tbl[idx]
                return tbl[idx][..., 0]
            return lax.fori_loop(0, STEPS, step, idx0)
        fj = jax.jit(f)
        dt = timeit(fj, idx0)
        g = B * STEPS / dt
        print(f"B={B:7d} {name}: {dt*1e3:7.2f} ms, {g/1e6:7.1f}M gathers/s", flush=True)
