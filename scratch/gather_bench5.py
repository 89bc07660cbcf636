import time
import jax
import jax.numpy as jnp
from jax import lax

M, B, STEPS = 73_600_000, 262144, 8
tbl = jax.random.randint(jax.random.PRNGKey(0), (M, 2), 0, M, dtype=jnp.int32)
jax.block_until_ready(tbl)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, M, dtype=jnp.int32)
def f(idx0):
    def step(i, col):
        return tbl[col][..., 1]
    return lax.fori_loop(0, STEPS, step, idx0)
fj = jax.jit(f)
t0 = time.perf_counter()
jax.block_until_ready(fj(idx0))
print(f"first call {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); iters = 3
for _ in range(iters):
    r = fj(idx0)
jax.block_until_ready(r)
dt = (time.perf_counter()-t0)/iters
print(f"{dt*1e3:.2f} ms, {B*STEPS/dt/1e6:.1f}M gathers/s -> {2*B*STEPS/dt/1e6:.0f}M answers/s", flush=True)
