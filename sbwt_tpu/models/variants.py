"""Device index for the non-plain-matrix variants.

`GenericIndex` wraps any subset-rank structure (models/subsetrank.py) with
the streaming-support table, C array, and precalc table, and implements
the engine-facing interface of ops/search.py (`rank_c`, `extend_rank`,
`sg_start`) — so every query engine (search, streaming, partial, forward)
runs unchanged on all 10 variants (the reference achieves the same with
the `SBWT<subset_rank_t>` template, SBWT.hh:31-46).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import bitvector as bv
from .matrix import FusedRowEngineMixin
from .subsetrank import build_struct, struct_from_payload


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["struct", "sgs_tbl", "C", "precalc"],
    meta_fields=["n_nodes", "n_kmers", "k", "precalc_k", "has_streaming", "variant"],
)
@dataclass(frozen=True)
class GenericIndex(FusedRowEngineMixin):
    """Variant index: any subset-rank structure + shared SBWT state.

    Inherits sg_start from the fused-row mixin (the streaming-support
    layout is identical across variants); rank_c/extend_rank delegate to
    the structure."""

    struct: object  # a subsetrank structure pytree
    sgs_tbl: jax.Array  # int32 [n_words, 2] as in MatrixIndex
    C: jax.Array  # int32 [4]
    precalc: jax.Array  # int32 [max(1, 4^p), 2]
    n_nodes: int
    n_kmers: int
    k: int
    precalc_k: int
    has_streaming: bool
    variant: str

    def rank_c(self, c, pos):
        return self.struct.rank(c, pos)

    def extend_rank(self, c, pos):
        # the LF extension pair (rank at pos and pos+1, SBWT.hh:423-437):
        # structures with a rank_pair answer both from one decode chain
        # (matrix/split/subset-wt — halves the gather count per LF step);
        # concat falls back to two ranks (its set-start select makes the
        # +1 argument non-adjacent in the symbol stream)
        rp = getattr(self.struct, "rank_pair", None)
        if rp is not None:
            r1, r2 = rp(c, pos)
        else:
            r1 = self.struct.rank(c, pos)
            r2 = self.struct.rank(c, pos + 1)
        return r1, r2 - r1

    def sgs_row(self, w):
        return self.sgs_tbl[w]


def build_generic_index(
    variant: str,
    bits: np.ndarray,
    suffix_group_starts: np.ndarray,
    k: int,
    n_kmers: int,
    precalc_k: int = 0,
    precalc_table: np.ndarray | None = None,
    struct=None,
) -> GenericIndex:
    n = bits.shape[1]
    if struct is None:
        struct = build_struct(variant, bits)

    has_streaming = suffix_group_starts is not None and len(suffix_group_starts) > 0
    if has_streaming:
        s_tbl = bv.rank_table_host(suffix_group_starts)
        sgs_words = s_tbl[:, 0]
        sgs_tbl = np.empty((len(sgs_words), 2), dtype=np.int32)
        sgs_tbl[:, 0] = sgs_words
        sgs_tbl[0, 1] = 0
        sgs_tbl[1:, 1] = sgs_words[:-1]
    else:
        sgs_tbl = np.zeros((1, 2), dtype=np.int32)

    counts = bits.sum(axis=1, dtype=np.int64)
    C = np.empty(4, dtype=np.int32)
    C[0] = 1
    C[1] = C[0] + counts[0]
    C[2] = C[1] + counts[1]
    C[3] = C[2] + counts[2]

    index = GenericIndex(
        struct=struct,
        sgs_tbl=jnp.asarray(sgs_tbl),
        C=jnp.asarray(C),
        precalc=jnp.zeros((1, 2), dtype=jnp.int32),
        n_nodes=n,
        n_kmers=int(n_kmers),
        k=int(k),
        precalc_k=0,
        has_streaming=bool(has_streaming),
        variant=variant,
    )
    if precalc_table is not None:
        index = dataclasses.replace(
            index,
            precalc=jnp.asarray(precalc_table, dtype=jnp.int32),
            precalc_k=precalc_k,
        )
    elif precalc_k > 0:
        index = generic_with_precalc(index, precalc_k)
    return index


def generic_with_precalc(index: GenericIndex, precalc_k: int) -> GenericIndex:
    """Precompute intervals of all 4^p strings (SBWT.hh:617-645) by running
    the generic LF engine over the variant's own rank structure."""
    from ..ops.search import update_interval_batch

    p = int(precalc_k)
    if p == 0:
        return dataclasses.replace(
            index, precalc=jnp.zeros((1, 2), dtype=jnp.int32), precalc_k=0
        )
    if p > 12:
        raise ValueError("precalc_k > 12 not supported (table would exceed 128 MiB)")
    if p > index.k:
        raise ValueError(f"precalc_k {p} > k {index.k}")
    base = dataclasses.replace(
        index, precalc=jnp.zeros((1, 2), dtype=jnp.int32), precalc_k=0
    )
    n_entries = 4**p
    ids = np.arange(n_entries, dtype=np.int64)
    codes = np.empty((n_entries, p), dtype=np.int32)
    for i in range(p):
        codes[:, i] = (ids >> (2 * i)) & 3
    l0 = jnp.zeros(n_entries, dtype=jnp.int32)
    r0 = jnp.full(n_entries, index.n_nodes - 1, dtype=jnp.int32)
    l, r, alive = jax.jit(update_interval_batch)(base, jnp.asarray(codes), l0, r0)
    tbl = jnp.stack([jnp.where(alive, l, -1), jnp.where(alive, r, -1)], axis=1).astype(
        jnp.int32
    )
    return dataclasses.replace(index, precalc=tbl, precalc_k=p)
