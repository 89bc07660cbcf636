"""Dependent-gather rate vs batch size on a pair-table-sized array.

Determines whether the turbo chain is latency-bound at B=1M (rate still
climbing with B) or throughput-saturated. 8 dependent steps, timed with a
device-side checksum fetch."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

M = 64_000_000  # 4M cols * 16 = pair-table rows; 512 MB


def main():
    mk = jax.jit(
        lambda: (jnp.arange(2 * M, dtype=jnp.int32) * 1103515245 % M).reshape(M, 2)
    )
    tbl = mk()
    jax.block_until_ready(tbl)

    def f(tbl, idx0):
        def step(i, col):
            return tbl[col][..., 1]
        return jnp.sum(lax.fori_loop(0, 8, step, idx0), dtype=jnp.int64)

    fj = jax.jit(f)
    for logb in (18, 20, 21, 22, 23):
        B = 1 << logb
        idxs = [
            jax.random.randint(jax.random.PRNGKey(i), (B,), 0, M, dtype=jnp.int32)
            for i in range(4)
        ]
        jax.block_until_ready(idxs)
        int(fj(tbl, idxs[0]))  # warmup
        best = 1e9
        for i in range(4):
            t0 = time.perf_counter()
            s = int(fj(tbl, idxs[i]))
            dt = time.perf_counter() - t0
            best = min(best, dt)
        print(
            f"B={B/1e6:5.2f}M: best {best*1e3:8.2f} ms, "
            f"{B*8/best/1e6:8.1f}M gathers/s (sum {s & 0xffff})",
            flush=True,
        )


main()
