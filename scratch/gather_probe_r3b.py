"""Round-3 probe b: lanes x table-size frontier at high lane counts."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def make_tbl(M):
    return jax.jit(lambda: (jnp.arange(M, dtype=jnp.uint32) * np.uint32(2654435761)
                            % np.uint32(M)).astype(jnp.int32))()


def chain_fn(tbl, idx0, steps):
    def step(i, col):
        nxt = tbl[col]
        return jnp.where(nxt >= 0, nxt, 0)
    out = lax.fori_loop(0, steps, step, idx0)
    return out.sum()


def run(M, B, steps=8, reps=3, tag=""):
    tbl = make_tbl(M)
    jax.block_until_ready(tbl)
    f = jax.jit(chain_fn, static_argnames=("steps",))
    keys = [jax.random.PRNGKey(100 + r) for r in range(reps + 1)]
    idxs = [jax.random.randint(k, (B,), 0, M, dtype=jnp.int32) for k in keys]
    jax.block_until_ready(idxs)
    t0 = time.perf_counter()
    np.asarray(f(tbl, idxs[0], steps))
    warm = time.perf_counter() - t0
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        s = np.asarray(f(tbl, idxs[r + 1], steps))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{tag} M={M/1e6:7.1f}M ({M*4/1e6:7.0f}MB) B={B/1e6:5.1f}M steps={steps}: "
          f"warm {warm:5.1f}s, min {dt*1e3:9.2f} ms, "
          f"{B*steps/dt/1e6:8.1f}M gathers/s, sum={int(s)}", flush=True)


if __name__ == "__main__":
    for B in [1 << 23, 1 << 24, 1 << 25]:
        for M in [1 << 24, 1 << 25, 1 << 26]:
            run(M, B)
    # steps sensitivity at the sweet spot
    run(1 << 24, 1 << 24, steps=32)
    run(1 << 24, 1 << 25, steps=32)
