import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from sbwt_tpu.models.sbwt import SBWT, VARIANT_NAMES
from sbwt_tpu.io.serialize import save
rng = np.random.default_rng(5)
seqs = ["".join(rng.choice(list("ACGT"), size=2000)) for _ in range(3)]
sb = SBWT.build(seqs, 14)
print("row densities:", sb.bits.mean(axis=1))
for v in VARIANT_NAMES:
    sz = save(f"/tmp/{v}.sbwt", sb.to_variant(v), "native")
    print(f"{v:16s} {sz:7d} bytes  {sz*8/sb.number_of_kmers():.2f} bits/kmer")
print("HBM sizes:")
for v in VARIANT_NAMES:
    print(f"{v:16s} {sb.to_variant(v).structure_size_in_bytes():7d}")
