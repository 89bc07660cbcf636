"""Gather rate for small tables (seed-bitmap candidate) at patch-pass
lane counts: 2MB / 8.4MB / 32MB / 537MB, flat independent gathers
(not chains — the patch's seed lookups are independent)."""
import time
import numpy as np
import jax
import jax.numpy as jnp


def run(M, B, reps=3, tag=""):
    tbl = jax.jit(lambda: (jnp.arange(M, dtype=jnp.uint32) * np.uint32(2654435761)
                           % np.uint32(M)).astype(jnp.int32))()
    jax.block_until_ready(tbl)

    def f(tbl, idx):
        # two dependent rounds so latency still matters, mostly independent
        v = tbl[idx]
        return tbl[v].sum()

    fj = jax.jit(f)
    idxs = [jax.random.randint(jax.random.PRNGKey(r), (B,), 0, M, dtype=jnp.int32)
            for r in range(reps + 1)]
    jax.block_until_ready(idxs)
    np.asarray(fj(tbl, idxs[0]))
    ts = []
    for r in range(reps):
        t0 = time.perf_counter()
        np.asarray(fj(tbl, idxs[r + 1]))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{tag} M={M/1e6:7.2f}M ({M*4/1e6:7.1f}MB) B={B/1e6:5.1f}M: "
          f"{2*B/dt/1e6:8.1f}M gathers/s", flush=True)


if __name__ == "__main__":
    for B in [1 << 22, 1 << 24]:
        for M in [1 << 19, 1 << 21, 1 << 23, 1 << 27]:
            run(M, B)
