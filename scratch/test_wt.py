import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
from sbwt_tpu.ops.wavelet import WaveletTree

rng = np.random.default_rng(7)
for sigma in [1, 2, 3, 4, 5, 8]:
    for n in [0, 1, 100, 5000]:
        syms = rng.integers(0, sigma, size=n)
        for kind in ["plain", "rrr", "mef"]:
            wt = WaveletTree.build(syms, sigma, kind)
            # exhaustive rank check
            pos = np.arange(n + 1, dtype=np.int32)
            for s in range(sigma):
                ref = np.concatenate([[0], np.cumsum(syms == s)])
                got = np.asarray(wt.rank(jnp.full(n + 1, s, dtype=jnp.int32), jnp.asarray(pos)))
                assert np.array_equal(got, ref), f"sigma={sigma} n={n} kind={kind} sym={s}"
            # mixed-symbol lanes
            if n:
                ss = rng.integers(0, sigma, size=64).astype(np.int32)
                pp = rng.integers(0, n + 1, size=64).astype(np.int32)
                got = np.asarray(wt.rank(jnp.asarray(ss), jnp.asarray(pp)))
                ref = np.array([int((syms[:p] == s).sum()) for s, p in zip(ss, pp)])
                assert np.array_equal(got, ref), f"mixed sigma={sigma} n={n} kind={kind}"
            assert np.array_equal(wt.to_symbols(), syms), f"decode sigma={sigma} n={n} kind={kind}"
            wt2 = WaveletTree.from_payload(wt.payload(), kind)
            assert np.array_equal(wt2.to_symbols(), syms), f"payload sigma={sigma} n={n} kind={kind}"
            if n:
                got = np.asarray(wt2.rank(jnp.asarray(ss), jnp.asarray(pp)))
                assert np.array_equal(got, ref), f"payload rank sigma={sigma} kind={kind}"
print("all WT tests pass")
