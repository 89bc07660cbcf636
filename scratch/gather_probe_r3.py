"""Round-3 rigorous dependent-gather probe.

Question: is there a table-size threshold below which XLA/Mosaic emits a
vectorized (VMEM-resident) gather on TPU v5e, and what is the real rate?
g7/g8 logs disagree by 300x at the same table size — this probe uses
host-forced sync (np.asarray of a reduced scalar) per rep so no axon
async/caching artifact can leak into the timing.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def make_tbl(M):
    # 1-D int32 table whose values are in-range random-ish jumps
    return jax.jit(lambda: (jnp.arange(M, dtype=jnp.uint32) * np.uint32(2654435761)
                            % np.uint32(M)).astype(jnp.int32))()


def chain_fn(tbl, idx0, steps):
    def step(i, col):
        nxt = tbl[col]
        # xor with i defeats any value-level caching while staying in range
        return jnp.where(nxt >= 0, nxt, 0)
    out = lax.fori_loop(0, steps, step, idx0)
    return out.sum()  # scalar: forces the chain, tiny transfer


def run(M, B, steps=8, reps=3, tag=""):
    tbl = make_tbl(M)
    jax.block_until_ready(tbl)
    f = jax.jit(chain_fn, static_argnames=("steps",))
    keys = [jax.random.PRNGKey(100 + r) for r in range(reps + 1)]
    idxs = [jax.random.randint(k, (B,), 0, M, dtype=jnp.int32) for k in keys]
    jax.block_until_ready(idxs)
    # warmup (compile)
    t0 = time.perf_counter()
    np.asarray(f(tbl, idxs[0], steps))
    warm = time.perf_counter() - t0
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        s = np.asarray(f(tbl, idxs[r + 1], steps))  # host sync every rep
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mb = M * 4 / 1e6
    rate = B * steps / dt / 1e6
    print(f"{tag} M={M/1e6:7.1f}M ({mb:7.0f}MB) B={B/1e6:4.1f}M: warm {warm:5.1f}s, "
          f"min {dt*1e3:9.2f} ms over {reps} ({[f'{t*1e3:.1f}' for t in times]}), "
          f"{rate:10.1f}M gathers/s, sum={int(s)}", flush=True)


if __name__ == "__main__":
    B = 1 << 20  # 1M lanes
    for M in [1 << 22, 1 << 23, 1 << 24, 30_000_000, 1 << 25, 40_000_000, 1 << 26, 100_000_000, 1 << 27]:
        run(M, B, tag="1d")
    # lane scaling at a fast size and at a slow size
    for B2 in [1 << 18, 1 << 22, 1 << 23]:
        run(1 << 24, B2, tag="lanes-fast")
        run(1 << 27, B2, tag="lanes-slow")
