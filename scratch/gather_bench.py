"""Microbenchmark: random-gather strategies for the LF-step hot loop.

Compares (on the real chip):
  1. XLA gather from HBM table [N,2] int32 (current engine design)
  2. XLA gather with wide fused rows [N,8] (1 gather per chain step)
  3. Pallas kernel with the table resident in VMEM
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = 500_000  # words (~4M columns / 8 per char... actually per-char table rows)
B = 65536    # lanes
STEPS = 64   # chained dependent gathers (like LF steps)

rng = np.random.default_rng(0)
tbl2 = jnp.asarray(rng.integers(0, 2**31 - 1, size=(4 * N, 2), dtype=np.int32))
tbl8 = jnp.asarray(rng.integers(0, 2**31 - 1, size=(4 * N, 8), dtype=np.int32))
idx0 = jnp.asarray(rng.integers(0, N, size=B, dtype=np.int32))


def mk_chain(tbl, width):
    def f(idx0):
        def step(i, idx):
            row = tbl[idx]
            # fold the row into a new pseudo-random index (dependent chain)
            s = row[..., 0]
            for j in range(1, width):
                s = s ^ row[..., j]
            return (s & 0x7FFFFFFF) % (4 * N)
        return lax.fori_loop(0, STEPS, step, idx0)
    return jax.jit(f)


def timeit(f, *args, iters=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return dt


for name, tbl, w in [("narrow[N,2]", tbl2, 2), ("wide[N,8]", tbl8, 8)]:
    f = mk_chain(tbl, w)
    dt = timeit(f, idx0)
    g = B * STEPS / dt
    print(f"XLA HBM gather {name}: {dt*1e3:.2f} ms, {g/1e6:.1f}M gathers/s")

# Pallas VMEM variant
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_chain(tbl, idx0):
    def kernel(tbl_ref, idx_ref, out_ref):
        def step(i, idx):
            row = tbl_ref[idx]  # [B, 2] gather from VMEM
            s = row[..., 0] ^ row[..., 1]
            return (s & 0x7FFFFFFF) % (4 * N)
        out_ref[:] = lax.fori_loop(0, STEPS, step, idx_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx0)


try:
    f = jax.jit(pallas_chain)
    dt = timeit(f, tbl2, idx0)
    g = B * STEPS / dt
    print(f"Pallas VMEM gather [N,2]: {dt*1e3:.2f} ms, {g/1e6:.1f}M gathers/s")
except Exception as e:
    print(f"Pallas VMEM gather failed: {type(e).__name__}: {str(e)[:500]}")
