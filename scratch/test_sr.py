import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
from sbwt_tpu.models.subsetrank import VARIANT_STRUCTS, build_struct, struct_from_payload

rng = np.random.default_rng(3)
for n in [1, 5, 333, 4000]:
    # realistic SBWT-like matrix: mostly unary columns, some empty/multi
    bits = np.zeros((4, n), dtype=bool)
    kind = rng.integers(0, 10, size=n)
    for i in range(n):
        if kind[i] < 6:
            bits[rng.integers(0, 4), i] = True
        elif kind[i] < 8:
            pass  # empty
        else:
            m = rng.integers(2, 5)
            bits[rng.choice(4, size=m, replace=False), i] = True
    ref_rank = np.zeros((4, n + 1), dtype=np.int64)
    for c in range(4):
        ref_rank[c, 1:] = np.cumsum(bits[c])
    pos = np.arange(n + 1, dtype=np.int32)
    for variant in VARIANT_STRUCTS:
        st = build_struct(variant, bits)
        for c in range(4):
            got = np.asarray(st.rank(jnp.full(n + 1, c, dtype=jnp.int32), jnp.asarray(pos)))
            assert np.array_equal(got, ref_rank[c]), f"{variant} rank c={c} n={n}\n{got[:30]}\n{ref_rank[c][:30]}"
        # mixed lanes
        cc = rng.integers(0, 4, size=128).astype(np.int32)
        pp = rng.integers(0, n + 1, size=128).astype(np.int32)
        got = np.asarray(st.rank(jnp.asarray(cc), jnp.asarray(pp)))
        ref = ref_rank[cc, pp]
        assert np.array_equal(got, ref), f"{variant} mixed n={n}"
        # contains
        cb = np.asarray(st.contains(jnp.asarray(cc), jnp.asarray(np.minimum(pp, n - 1))))
        refb = bits[cc, np.minimum(pp, n - 1)]
        assert np.array_equal(cb.astype(bool), refb), f"{variant} contains n={n}"
        # to_bits + payload roundtrip
        assert np.array_equal(st.to_bits(), bits), f"{variant} to_bits n={n}"
        st2 = struct_from_payload(variant, st.payload())
        assert np.array_equal(st2.to_bits(), bits), f"{variant} payload n={n}"
        got = np.asarray(st2.rank(jnp.asarray(cc), jnp.asarray(pp)))
        assert np.array_equal(got, ref), f"{variant} payload rank n={n}"
    print(f"n={n}: all {len(VARIANT_STRUCTS)} variants pass")
# size comparison
print({v: build_struct(v, bits).size_in_bytes() for v in VARIANT_STRUCTS})
