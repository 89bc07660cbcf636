"""(a) transpose cost of the chain output, (b) gather rate on a 4GB
triple-sized table, (c) column-stack cost of c1s/c2s."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

B = 1 << 20
NP_ = 35


def timeit(name, fn, *a, reps=3):
    out = fn(*a)
    acc = int(jnp.sum(out)) if out is not None else 0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
        acc += int(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:8.2f} ms (acc {acc & 0xffff})", flush=True)


# (a) transpose [NP,2,B] -> [B, 2*NP]
x = jax.random.randint(jax.random.PRNGKey(0), (NP_, 2, B), 0, 1000, dtype=jnp.int32)
f_t = jax.jit(lambda x: x.transpose(2, 0, 1).reshape(B, 2 * NP_))
timeit("transpose [35,2,1M] -> [1M,70]", f_t, x)

# (c) column stack: ext[:, k+2j] slices
codes = jax.random.randint(jax.random.PRNGKey(1), (B, 102), 0, 4, dtype=jnp.int32)
def colstack(codes):
    c1s = jnp.stack([codes[:, 30 + 2 * j] for j in range(NP_)])
    c2s = jnp.stack([codes[:, 31 + 2 * j] for j in range(NP_)])
    return c1s + c2s
timeit("column stack 2x[35,1M] from [1M,102]", jax.jit(colstack), codes)

# transpose first then slice rows (contiguous)
def colstack_t(codes):
    ct = codes.T  # [102, B]
    return ct[30:100] # rows
timeit("transpose codes + row slice", jax.jit(colstack_t), codes)

# (b) gather rate on 4GB table of int32[4] rows
M4 = 256_000_000
mk = jax.jit(lambda: (jnp.arange(M4, dtype=jnp.int32) * 1103515245 % M4)[:, None] * jnp.ones((1, 4), jnp.int32))
try:
    tbl = mk()
    jax.block_until_ready(tbl)

    def chase(tbl, idx0):
        def step(i, col):
            return tbl[col][..., 1]
        return jnp.sum(lax.fori_loop(0, 8, step, idx0))

    fj = jax.jit(chase)
    for logb in (20, 22):
        Bx = 1 << logb
        idx = jax.random.randint(jax.random.PRNGKey(2), (Bx,), 0, M4, dtype=jnp.int32)
        int(fj(tbl, idx))
        t0 = time.perf_counter()
        s = int(fj(tbl, idx))
        dt = time.perf_counter() - t0
        print(f"4GB tbl B={Bx/1e6:.2f}M: {dt*1e3:8.2f} ms, {Bx*8/dt/1e6:7.1f}M gathers/s", flush=True)
    del tbl
except Exception as e:
    print("4GB table failed:", e, flush=True)

# (b2) same chase on 16B rows vs 8B rows at 512MB, for row-size effect
M5 = 32_000_000
mk5 = jax.jit(lambda: (jnp.arange(M5, dtype=jnp.int32) * 1103515245 % M5)[:, None] * jnp.ones((1, 4), jnp.int32))
tbl5 = mk5()
jax.block_until_ready(tbl5)
def chase5(tbl, idx0):
    def step(i, col):
        return tbl[col][..., 1]
    return jnp.sum(lax.fori_loop(0, 8, step, idx0))
fj5 = jax.jit(chase5)
idx = jax.random.randint(jax.random.PRNGKey(3), (1 << 20,), 0, M5, dtype=jnp.int32)
int(fj5(tbl5, idx))
t0 = time.perf_counter()
s = int(fj5(tbl5, idx))
dt = time.perf_counter() - t0
print(f"512MB 16B-row B=1M: {dt*1e3:8.2f} ms, {(1<<20)*8/dt/1e6:7.1f}M gathers/s", flush=True)
