import time
import jax
import jax.numpy as jnp
from jax import lax

M, B, STEPS = 73_600_000, 262144, 8
t0 = time.perf_counter()
mk = jax.jit(lambda: (jnp.arange(2 * M, dtype=jnp.int32) * 1103515245 % M).reshape(M, 2))
tbl = mk(); jax.block_until_ready(tbl)
print(f"table built {time.perf_counter()-t0:.1f}s", flush=True)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, M, dtype=jnp.int32)
jax.block_until_ready(idx0)
print("idx ready", flush=True)
def f(idx0):
    def step(i, col):
        return tbl[col][..., 1]
    return lax.fori_loop(0, STEPS, step, idx0)
fj = jax.jit(f)
t0 = time.perf_counter()
lowered = fj.lower(idx0)
print(f"lowered {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
compiled = lowered.compile()
print(f"compiled {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
jax.block_until_ready(compiled(idx0))
print(f"first run {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter(); iters = 3
for _ in range(iters):
    r = compiled(idx0)
jax.block_until_ready(r)
dt = (time.perf_counter()-t0)/iters
print(f"{dt*1e3:.2f} ms, {B*STEPS/dt/1e6:.1f}M gathers/s", flush=True)
