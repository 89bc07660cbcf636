"""Repro of ADVICE high finding: patch_global w3_at only covers k<=33."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.search import streaming_search_jit
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_search

rng = np.random.default_rng(5)
g = "".join(rng.choice(list("ACGT"), size=6000))
k, p = 36, 8
sb = SBWT.build([g], k, precalc_k=p)
turbo = build_turbo(sb.device_index, arity=3)
B, L = 4096, 60
codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
from sbwt_tpu.utils.dna import encode_query
enc = encode_query(g)
# chimeric reads: random prefix then a genomic suffix -> the restart at
# the boundary must resolve a REAL k-mer via a full-window walk
for i in range(0, B, 3):
    cut = int(rng.integers(1, L - k))
    s = enc[(i * 7) % 5000 : (i * 7) % 5000 + (L - cut)]
    codes[i, cut : cut + len(s)] = s
lengths = np.full(B, L, dtype=np.int32)

got = np.asarray(
    jax.jit(turbo_streaming_search, static_argnames=("regime_hint",))(
        turbo, sb.device_index, jnp.asarray(codes), jnp.asarray(lengths),
        regime_hint="miss",
    )
)
ref = np.asarray(
    streaming_search_jit(sb.device_index, jnp.asarray(codes), jnp.asarray(lengths))
)
diff = (got != ref).sum()
print("k:", k, "p:", p, "differences:", int(diff), "/", got.size)
