import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

def run(M, B=262144, STEPS=8):
    mk = jax.jit(lambda: (jnp.arange(2 * M, dtype=jnp.int32) * 1103515245 % M).reshape(M, 2))
    tbl = mk(); jax.block_until_ready(tbl)
    def f(tbl, idx0):
        def step(i, col):
            return tbl[col][..., 1]
        return lax.fori_loop(0, STEPS, step, idx0)
    fj = jax.jit(f)
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (B,), 0, M, dtype=jnp.int32) for i in range(6)]
    jax.block_until_ready(idxs)
    np.asarray(fj(tbl, idxs[5]))  # warmup + full sync
    for i in range(5):
        t0 = time.perf_counter()
        out = np.asarray(fj(tbl, idxs[i]))
        dt = time.perf_counter()-t0
        print(f"  M={M/1e6:5.1f}M call{i}: {dt*1e3:8.2f} ms, {B*STEPS/dt/1e6:8.1f}M gathers/s, sum {out.sum()}", flush=True)

run(18_400_000)
run(73_600_000)
