import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
from sbwt_tpu.ops.bv import PlainBV, RRRBV, MEFBV

rng = np.random.default_rng(42)
for n in [0, 1, 31, 32, 33, 1000, 5000, 40000]:
    for dens in [0.0, 0.05, 0.3, 0.9, 1.0]:
        bools = rng.random(n) < dens
        ref = np.concatenate([[0], np.cumsum(bools)]).astype(np.int64)
        pos = np.arange(n + 1, dtype=np.int32)
        for cls in [PlainBV, RRRBV, MEFBV]:
            bv = cls.build(bools)
            got = np.asarray(bv.rank(jnp.asarray(pos)))
            assert np.array_equal(got, ref), f"{cls.__name__} rank n={n} dens={dens}\n{got[:50]}\n{ref[:50]}"
            if n:
                gb = np.asarray(bv.get(jnp.asarray(pos[:-1])))
                assert np.array_equal(gb.astype(bool), bools), f"{cls.__name__} get n={n} dens={dens}"
            assert np.array_equal(bv.to_bools(), bools), f"{cls.__name__} to_bools n={n} dens={dens}"
            p = bv.payload()
            bv2 = cls.from_payload(p)
            got2 = np.asarray(bv2.rank(jnp.asarray(pos)))
            assert np.array_equal(got2, ref), f"{cls.__name__} payload n={n}"
print("all BV tests pass")
# size sanity on sparse input
bools = rng.random(100000) < 0.03
print("plain", PlainBV.build(bools).size_in_bytes(), "rrr", RRRBV.build(bools).size_in_bytes(), "mef", MEFBV.build(bools).size_in_bytes())
