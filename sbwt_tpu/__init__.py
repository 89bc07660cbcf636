"""sbwt-tpu: a TPU-native SBWT k-mer index framework.

A from-scratch JAX/XLA implementation of the Spectral Burrows-Wheeler
Transform k-mer membership index, with the capabilities of the reference
C++ implementation (algbio/SBWT): construction from FASTA/FASTQ,
per-k-mer and streaming membership queries, variants, serialization
(including the reference's on-disk format), and a CLI — re-designed as
batched lockstep device programs instead of scalar rank loops.
"""

from .models.sbwt import SBWT, VARIANT_NAMES  # noqa: F401

__version__ = "0.1.0"
