"""Turbo query engine: de Bruijn successor tables of arity 1, 2 or 3.

The exact-output fast path for the reference's headline workload
(`sbwt search` streaming over reads, src/CLI/sbwt_search.cpp:46-65),
trading HBM for gather count — the TPU query bottleneck is dependent
random gathers, so answers-per-gather is the whole game:

* Arity 2/3: ``tbl`` int32 [n*4^A, A(+pad)]: entry
  col*4^A + c_1*4^(A-1) + ... + c_A holds the successor columns after
  applying 1..A out-edges from col's suffix group (SBWT.hh:566-577),
  with -1 propagation baked in.  One 8-byte (A=2) or 16-byte (A=3)
  gather advances a read A k-mer positions: 1/A gathers/answer on the
  streaming chain, vs 2 rank gathers/answer for the LF engine.
  HBM cost: 128 B/column (A=2) or 1 KiB/column (A=3).

* Arity 1 ("uni" tier): ``tbl`` int32 [n, 4]: ROW per column holding its
  4 successors; the chain gathers one 16-byte row per step and selects
  by the read character on the VPU.  1 gather/answer — but measured row
  gathers run ~1.4x faster than scalar gathers (153M vs 111M rows/s at
  4M lanes from a <=128 MB table, scratch/uni_proto.py), so the chain
  still sustains >150M answers/s while costing only 16 B/column — the
  tier that holds the >=100M q/s target on indexes where the arity-2/3
  tables cannot fit (pangenome scale: 1G columns = 16 GB).

* First k-mers and post-mismatch restarts use the **singleton seed**
  path: with precalc_k >= log4(n) the precalc interval of a k-mer's
  first p characters is almost always empty (answer -1) or a singleton
  column.  A singleton search state at < k processed characters is
  always a whole suffix group (k-mers sharing a (k-1)-suffix agree on
  any shorter suffix), so the remaining k-p characters can be walked
  with the same successor table — the LF interval machinery
  (SBWT.hh:423-437) is only needed for the rare non-singleton seeds,
  which fall back to interval LF steps (ops/search.py semantics).

Output is bit-identical to SBWT::streaming_search / search (the
contract of SBWT.hh:231), verified differentially in tests.

Cost model (k=30, p=12, 100bp reads, A=3): ~31 gathers per 71 answers
= 0.44 gathers/answer -> >100M answers/s/chip at the measured
~90M dependent gathers/s.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Transient marker for restart positions whose precalc seed is a
# non-singleton interval: the patch pass writes it in place of an answer
# and a pooled second-stage LF pass replaces every occurrence before
# turbo_streaming_search returns (real answers are always >= -1).
SLOW_SENTINEL = -2
# Transient encoding for singleton walks that survive their first inline
# arity-step: value v = WALK_CONT - col (always <= -3, injective in the
# intermediate column col >= 0).  On random inputs ~98% of live restart
# walks die within the first step, so the remaining rem-A characters are
# walked only for the tiny survivor set, pooled across all patch trips.
WALK_CONT = -3
# Block-sweep resolver chunk width cap (lanes per trip).  Dependent-gather
# throughput climbs with occupancy to ~8M lanes (docs/DESIGN.md §1), so
# miss-heavy sweeps with tens of millions of live positions want wide
# trips; the cap bounds the per-trip transients ([Wc, 3] windows, seed
# rows, step rows — ~60 B/lane).
_SWEEP_CHUNK_CAP = 1 << 21


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tbl", "precalc", "C", "seed_bits"],
    meta_fields=["n_nodes", "k", "precalc_k", "arity"],
)
@dataclass(frozen=True)
class TurboIndex:
    tbl: jax.Array  # int32 [n*4^A, row] (row = 2 for A=2, 4 for A=3); [n, 4] for A=1
    precalc: jax.Array  # int32 [4^p, 2] (shared with the base index)
    C: jax.Array  # int32 [4]
    n_nodes: int
    k: int
    precalc_k: int
    arity: int = 2
    # Seed-liveness PAIR table: 2-bit entries indexed by (p+1)-mer m
    # (16 entries per uint32 word).  bit0 = precalc interval of the low
    # p-mer (m mod 4^p) non-empty; bit1 = same for the shifted p-mer
    # (m >> 2).  Because consecutive read positions' p-mers are exactly
    # that shift pair, ONE gather from this table kills/keeps TWO restart
    # positions (~94% of random positions die here at p=13, never touching
    # the 537 MB precalc table).  4^(p+1)/4 bytes = 67 MB at p=13 — still
    # inside the <=128 MB fast-gather tier (docs/DESIGN.md §4a).
    seed_bits: jax.Array | None = None

    @property
    def pair_tbl(self):  # backwards-compatible alias (arity-2 table)
        return self.tbl

    def tbl_row(self, idx):
        """Row(s) of the successor table by flat row index (arity-1 path:
        idx is the column itself, always < n < 2^31).  The tensor-parallel
        view (parallel/sharded.py TPTurboView) overrides this with a
        masked local gather + psum over the model axis."""
        return self.tbl[idx]

    pos_dtype = jnp.int32

    def succ_from_row(self, row, c, alive):
        """Successor selected from an arity-1 row by char c (VPU select)."""
        s01 = jnp.where(c == 0, row[..., 0], row[..., 1])
        s23 = jnp.where(c == 2, row[..., 2], row[..., 3])
        s = jnp.where(c <= 1, s01, s23)
        return jnp.where(alive, s, -1)

    def tbl_row_sub(self, col, sub):
        """Row of the arity>=2 table for (column, packed chars sub).

        Kept as a separate (col, sub) pair so the tensor-parallel view can
        rebase col to its shard BEFORE forming the flat index — the global
        col * 4^arity + sub overflows int32 past n = 2^31 / 4^arity, but a
        per-shard (col - base) * 4^arity + sub stays valid as long as one
        SHARD holds < 2^31 / 4^arity columns (the reference has no such
        ceiling because it is int64 throughout, SBWT.hh:44-46; here the
        narrow engine's whole point is 4-byte lanes)."""
        return self.tbl[col * jnp.int32(4**self.arity) + sub]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tbl", "tbl_hi", "precalc", "C", "seed_bits"],
    meta_fields=["n_nodes", "k", "precalc_k", "arity"],
)
@dataclass(frozen=True)
class WideTurboIndex:
    """Arity-1 successor-row tier for the int64 (wide) engine
    (models/wide.py, n >= 2^31 columns — the reference is int64
    throughout and flat in n, SBWT.hh:44-46).

    Successor columns are int64 stored as TWO [n, 4] int32 row tables
    (lo words and hi words).  On a single chip (n < 2^31, always true
    for an in-HBM table) every hi word is identically 0 (live) or -1
    (dead), so the chain gathers ONLY the lo table — one 16-byte row
    per answer at the narrow tier's rate; the hi table is touched only
    by the n >= 2^31 pair path kept for sharded views.  The round-4
    interleaved [n, 8] row measured 52.5M rows/s vs 153.3M for 16-byte
    rows, and even a lo+hi double gather only 51.7M pairs/s
    (scratch/r5_probe7/9.log) — 32-byte rows fall off the single-
    transaction gather path.  Still 32 B/column total: a 2^31-column
    table needs 68.7 GB, so single-chip wide-turbo serves the sub-2^31
    range the wide engine can be forced onto, and past that the table
    must be row-sharded over a mesh (parallel/sharded.py; per-shard
    rebasing keeps shard-local int32 viable to 2^31 columns per
    shard)."""

    tbl: jax.Array  # int32 [n, 4] successor lo words (char-major)
    tbl_hi: jax.Array  # int32 [n, 4] successor hi words
    precalc: jax.Array  # int64 [4^p, 2]
    C: jax.Array  # int64 [4]
    n_nodes: int
    k: int
    precalc_k: int
    arity: int = 1
    seed_bits: jax.Array | None = None

    pos_dtype = jnp.int64

    def tbl_row(self, idx):
        if self.n_nodes < 2**31:
            # Any single-chip table physically has < 2^31 rows, so every
            # successor's hi word is identically 0 (live) or -1 (dead) —
            # the lo word alone decides, and the chain costs ONE 16-byte
            # row gather like the narrow tier (the paired lo+hi double
            # gather measured 51.7M rows/s vs 142M for one,
            # scratch/r5_probe9.log).  s64 gather indices are fine
            # (142.4 vs 152.9M rows/s) but the cast is free anyway.
            return self.tbl[idx.astype(jnp.int32)]
        # n >= 2^31 (only reachable through sharded views that rebase
        # per-shard; kept for completeness): full (lo, hi) pair rows
        return self.tbl[idx], self.tbl_hi[idx]

    def succ_from_row(self, row, c, alive):
        if self.n_nodes < 2**31:
            rlo = row
            lo01 = jnp.where(c == 0, rlo[..., 0], rlo[..., 1])
            lo23 = jnp.where(c == 2, rlo[..., 2], rlo[..., 3])
            # valid cols are non-negative int32; dead is exactly -1 —
            # sign-extension reproduces the int64 value
            s = jnp.where(c <= 1, lo01, lo23).astype(jnp.int64)
            return jnp.where(alive, s, jnp.int64(-1))
        rlo, rhi = row
        lo01 = jnp.where(c == 0, rlo[..., 0], rlo[..., 1])
        hi01 = jnp.where(c == 0, rhi[..., 0], rhi[..., 1])
        lo23 = jnp.where(c == 2, rlo[..., 2], rlo[..., 3])
        hi23 = jnp.where(c == 2, rhi[..., 2], rhi[..., 3])
        lo = jnp.where(c <= 1, lo01, lo23).astype(jnp.uint32).astype(jnp.int64)
        hi = jnp.where(c <= 1, hi01, hi23).astype(jnp.int64)
        s = (hi << 32) | lo  # -1 round-trips: hi = -1, lo = 0xFFFFFFFF
        return jnp.where(alive, s, jnp.int64(-1))


def build_turbo_wide(index, chunk: int = 1 << 22) -> WideTurboIndex:
    """Arity-1 successor table for a wide (int64) index, built in column
    chunks so transients stay bounded."""
    if not index.has_streaming:
        raise ValueError("turbo engine requires streaming support (suffix group marks)")
    n = index.n_nodes
    chunk = min(chunk, max(1024, n))

    def _chunk(index, start, m):
        cols = start + jnp.arange(m, dtype=jnp.int64)
        s = index.sg_start(jnp.minimum(cols, n - 1))
        los, his = [], []
        for c in range(4):
            cc = jnp.full((m,), c, dtype=jnp.int32)
            r1, bit = index.extend_rank(cc, s)
            succ = jnp.where(bit == 1, index.C[c] + r1, jnp.int64(-1))
            los.append(lax.bitcast_convert_type(
                (succ & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32
            ))
            his.append((succ >> 32).astype(jnp.int32))
        return jnp.stack(los, axis=-1), jnp.stack(his, axis=-1)  # [m, 4] x2

    # one jitted fori_loop fill: the carry aliases in place, so peak HBM
    # is the final tables + one chunk part (an eager per-chunk
    # dynamic_update_slice copies the whole table every chunk)
    @partial(jax.jit, static_argnames=("n_chunks", "m"))
    def _fill(index, n_chunks, m):
        tbl = jnp.zeros((n_chunks * m, 4), dtype=jnp.int32)
        tbl_hi = jnp.zeros((n_chunks * m, 4), dtype=jnp.int32)

        def body(i, carry):
            tbl, tbl_hi = carry
            lo, hi = _chunk(index, i.astype(jnp.int64) * m, m)
            return (
                lax.dynamic_update_slice(tbl, lo, (i * m, 0)),
                lax.dynamic_update_slice(tbl_hi, hi, (i * m, 0)),
            )

        return lax.fori_loop(0, n_chunks, body, (tbl, tbl_hi))

    n_pad = -(-n // chunk) * chunk
    tbl, tbl_hi = _fill(index, n_pad // chunk, chunk)
    seed_bits = (
        _pack_seed_pair_bits(index.precalc[:, 0] >= 0)
        if 0 < index.precalc_k <= 14
        else None
    )
    return WideTurboIndex(
        tbl=tbl,
        tbl_hi=tbl_hi,
        precalc=index.precalc,
        C=index.C,
        n_nodes=n,
        k=index.k,
        precalc_k=index.precalc_k,
        seed_bits=seed_bits,
    )


def _pack_2bit_u32(v):
    """uint32 [n] with values 0..3 -> packed uint32 [ceil(n/16)] words
    (entry i at bits [2*(i%16), 2*(i%16)+1] of word i//16), on device."""
    n = v.shape[0]
    pad = (-n) % 16
    v = jnp.pad(v, (0, pad))
    w = v.reshape(-1, 16) << (2 * jnp.arange(16, dtype=jnp.uint32))
    return w.sum(axis=1, dtype=jnp.uint32)


@jax.jit
def _pack_seed_pair_bits(live):
    """Pair-liveness table from live bool [4^p]: packed 2-bit entries over
    all (p+1)-mers m = pidx + c_last * 4^p (chars least-significant-first,
    matching _pidx_vwin): bit0 = live[m mod 4^p], bit1 = live[m >> 2].

    Built in 4 chunks over the top character so transients stay ~O(4^p)."""
    q = live.shape[0]  # 4^p
    if q < 16 or q % 16:
        l = jnp.arange(4 * q, dtype=jnp.int32)
        v = live[l & (q - 1)].astype(jnp.uint32) | (
            live[l >> 2].astype(jnp.uint32) << 1
        )
        return _pack_2bit_u32(v)
    parts = []
    for h in range(4):
        b0 = live.astype(jnp.uint32)
        # (h*4^p + l) >> 2 = h*4^(p-1) + (l >> 2): the h-th quarter of
        # `live`, each entry repeated 4x
        b1 = jnp.repeat(live[h * (q // 4) : (h + 1) * (q // 4)], 4).astype(jnp.uint32)
        parts.append(_pack_2bit_u32(b0 | (b1 << 1)))
    return jnp.concatenate(parts)


def _succ1(index):
    """succ[c, col] = successor of col's suffix group via edge c, or -1."""
    n = index.n_nodes
    cols = jnp.arange(n, dtype=jnp.int32)
    s = index.sg_start(cols)
    outs = []
    for c in range(4):
        cc = jnp.full((n,), c, dtype=jnp.int32)
        r1, bit = index.extend_rank(cc, s)
        outs.append(jnp.where(bit == 1, index.C[c] + r1, -1))
    return jnp.stack(outs)  # [4, n]


_succ1_jit = jax.jit(_succ1)


@partial(jax.jit, static_argnames=("chunk",))
def _pair_chunk(succ, start, chunk):
    """pair rows for columns [start, start+chunk): [chunk*16, 2] int32."""
    n1 = lax.dynamic_slice(succ, (0, start), (4, chunk))  # [c1, m]
    n2 = jnp.take(succ, jnp.clip(n1, 0), axis=1)  # [c2, c1, m]
    n2 = jnp.where(n1[None] >= 0, n2, -1)
    n1_b = jnp.broadcast_to(n1[None], (4, 4, chunk))  # [c2, c1, m]
    pair = jnp.stack([n1_b, n2], axis=-1)  # [c2, c1, m, 2]
    return pair.transpose(2, 1, 0, 3).reshape(chunk * 16, 2)


@partial(jax.jit, static_argnames=("chunk",))
def _triple_chunk(succ, start, chunk):
    """triple rows for columns [start, start+chunk): [chunk*64, 4] int32.

    Row layout (s1, s2, s3, 0) at index col*64 + c1*16 + c2*4 + c3; the
    pad keeps rows 16-byte aligned for single-transaction gathers."""
    n1 = lax.dynamic_slice(succ, (0, start), (4, chunk))  # [c1, m]
    n2 = jnp.take(succ, jnp.clip(n1, 0), axis=1)  # [c2, c1, m]
    n2 = jnp.where(n1[None] >= 0, n2, -1)
    n3 = jnp.take(succ, jnp.clip(n2, 0), axis=1)  # [c3, c2, c1, m]
    n3 = jnp.where(n2[None] >= 0, n3, -1)
    m = chunk
    n1_b = jnp.broadcast_to(n1[None, None], (4, 4, 4, m))  # [c3, c2, c1, m]
    n2_b = jnp.broadcast_to(n2[None], (4, 4, 4, m))
    pad = jnp.zeros((4, 4, 4, m), dtype=jnp.int32)
    quad = jnp.stack([n1_b, n2_b, n3, pad], axis=-1)  # [c3, c2, c1, m, 4]
    # -> [m, c1, c2, c3, 4]
    return quad.transpose(3, 2, 1, 0, 4).reshape(m * 64, 4)


@partial(jax.jit, static_argnames=("n_chunks", "chunk", "arity"))
def _build_tbl_jit(succ_p, n_chunks, chunk, arity):
    """Chunked table build into a preallocated buffer: the fori_loop
    carry aliases in place, so peak HBM is the final table plus ONE
    chunk part (a concatenate of all parts would transiently double
    the multi-GB arity-3 table)."""
    fn = _pair_chunk.__wrapped__ if arity == 2 else _triple_chunk.__wrapped__
    rows_per_col = 4**arity
    width = 2 if arity == 2 else 4
    tbl = jnp.zeros((n_chunks * chunk * rows_per_col, width), dtype=jnp.int32)

    def body(i, tbl):
        part = fn(succ_p, i * chunk, chunk)
        return lax.dynamic_update_slice(tbl, part, (i * chunk * rows_per_col, 0))

    return lax.fori_loop(0, n_chunks, body, tbl)


def _build_tbl(index, arity: int, chunk: int):
    succ = _succ1_jit(index)  # [4, n] int32
    n = succ.shape[1]
    n_pad = max(chunk, -(-n // chunk) * chunk)
    succ_p = jnp.pad(succ, ((0, 0), (0, n_pad - n)))
    # The table keeps its pad rows (<= chunk columns' worth): they are
    # never gathered (every index is col*4^A + ... with col < n), and
    # slicing them off would transiently double the multi-GB buffer.
    return _build_tbl_jit(succ_p, n_pad // chunk, chunk, arity)


def check_turbo_index_range(n_nodes: int, arity: int, what: str = "turbo table"):
    """Raise unless every flat row index col * 4^arity + sub of an
    arity>=2 successor table fits int32.  The ceiling is n = 2^27 columns
    at arity 2 and 2^25 at arity 3; past it use arity 1 (indexed by the
    bare column, good to 2^31) or the tensor-parallel sharded build
    (parallel/sharded.py build_turbo_sharded), whose per-SHARD rebased
    indexing only requires one shard's columns to fit."""
    if arity >= 2 and n_nodes * (4**arity) >= 2**31:
        raise ValueError(
            f"{what}: n_nodes={n_nodes} * 4^{arity} exceeds int32 row indexing "
            f"(limit {2**31 // 4**arity} columns at arity {arity}); use arity 1 "
            "or the TP-sharded table build (build_turbo_sharded)"
        )


def build_turbo(index, arity: int = 2) -> TurboIndex:
    """Build the successor table from a device index — ANY variant that
    implements the engine interface (models/matrix.py MatrixIndex or
    models/variants.py GenericIndex over any of the 10 subset-rank
    structures).  The successor table is variant-INDEPENDENT once built:
    a compressed on-disk variant (rrr/mef/...) queries at turbo speed
    after this one-time build, which is strictly better than the
    reference's small-index-slow-query trade (sbwt_search.cpp:204-253
    runs all variants through the same LF loop).

    arity 1: 16 B HBM per column ([n, 4] successor rows).  arity 2:
    128 B per column.  arity 3: 1 KiB per column, ~1.5x fewer chain
    gathers — for indexes where HBM allows."""
    if not index.has_streaming:
        raise ValueError("turbo engine requires streaming support (suffix group marks)")
    if index.precalc_k <= 0:
        # the singleton-seed fast path is the whole engine; without a
        # precalc table every position would take the exact-LF fallback
        raise ValueError("turbo engine requires a precalc table (precalc_k > 0)")
    if arity not in (1, 2, 3):
        raise ValueError("turbo arity must be 1, 2 or 3")
    if getattr(index, "pos_dtype", jnp.int32) == jnp.int64:
        # wide (int64) engine: only the arity-1 pair-row tier exists
        # (arity 2/3 tables would be 256 B / 2 KiB per column)
        return build_turbo_wide(index)
    check_turbo_index_range(index.n_nodes, arity)
    if arity == 1:
        tbl = jnp.transpose(_succ1_jit(index))  # [n, 4] int32 rows
    else:
        chunk = 1 << 20 if arity == 2 else 1 << 18
        tbl = _build_tbl(index, arity, chunk)
    # p <= 14 keeps the (p+1)-mer pair index inside int32 (4^15 = 2^30)
    seed_bits = (
        _pack_seed_pair_bits(index.precalc[:, 0] >= 0)
        if 0 < index.precalc_k <= 14
        else None
    )
    return TurboIndex(
        tbl=tbl,
        precalc=index.precalc,
        C=index.C,
        n_nodes=index.n_nodes,
        k=index.k,
        precalc_k=index.precalc_k,
        arity=arity,
        seed_bits=seed_bits,
    )


# ---------------------------------------------------------------------------
# one multi-successor step
# ---------------------------------------------------------------------------


def _step(turbo, col, cs, vs):
    """Advance col by chars cs (length-arity list); vs are char-valid
    masks.  Returns the list of successor columns after 1..arity chars.
    Dead lanes (col < 0) stay dead; -1 propagates."""
    A = turbo.arity
    if A == 1:
        # successor-row layout: one row gather + VPU select by char
        # (narrow [n, 4] int32; wide [n, 8] (lo, hi) int32 pairs)
        row = turbo.tbl_row(jnp.clip(col, 0))
        c = cs[0] & 3
        return [turbo.succ_from_row(row, c, (col >= 0) & vs[0])]
    sub = jnp.zeros_like(col)
    for c in cs:
        sub = sub * 4 + (c & 3)
    row = turbo.tbl_row_sub(jnp.clip(col, 0), sub)
    outs = []
    prev_ok = col >= 0
    for i in range(A):
        o = jnp.where(prev_ok & vs[i], row[..., i], -1)
        outs.append(o)
        prev_ok = o >= 0
    return outs


def _pair_step(turbo, col, c1, c2, v1, v2):
    """Backwards-compatible arity-2 step; returns (after c1, after c1c2)."""
    o = _step(turbo, col, [c1, c2], [v1, v2])
    return o[0], o[1]


# ---------------------------------------------------------------------------
# fast singleton search
# ---------------------------------------------------------------------------


def _walk_rem(turbo, col, char_fn, rem):
    """Walk `rem` characters from singleton columns using arity-A steps.
    char_fn(j) must return the j-th remaining char array (values 0..3,
    already validated)."""
    A = turbo.arity
    tv = jnp.ones_like(col, dtype=bool)
    j = 0
    while j < rem:
        take = min(A, rem - j)
        cs = [char_fn(j + i) if i < take else char_fn(rem - 1) for i in range(A)]
        vs = [tv] * A
        outs = _step(turbo, col, cs, vs)
        col = outs[take - 1]
        j += take
    return col


def fast_search(turbo: TurboIndex, codes):
    """Singleton-seed search of full k-mers: codes int32 [..., k].

    Returns (ans, needs_slow): ans is the colex rank / -1, valid where
    needs_slow is False; needs_slow lanes (non-singleton seed) must be
    answered by the exact LF engine.  Search semantics: only codes 0..3
    are valid characters (SBWT.hh:426-427 rejects lowercase here)."""
    k, p = turbo.k, turbo.precalc_k
    codes = codes.astype(jnp.int32)
    valid = jnp.all((codes >= 0) & (codes < 4), axis=-1)
    cc = jnp.clip(codes, 0) & 3
    weights = jnp.asarray(4 ** np.arange(p, dtype=np.int64), dtype=jnp.int32)
    pidx = jnp.sum(cc[..., :p] * weights, axis=-1)
    seed = turbo.precalc[pidx]
    l, r = seed[..., 0], seed[..., 1]
    dead = (l < 0) | ~valid
    singleton = l == r
    needs_slow = ~dead & ~singleton
    col = jnp.where(dead, -1, l)
    col = _walk_rem(turbo, col, lambda j: cc[..., p + j], k - p)
    ans = jnp.where(needs_slow, -1, col)
    return ans, needs_slow


# ---------------------------------------------------------------------------
# streaming search
# ---------------------------------------------------------------------------


def _pidx_vwin(turbo, rows, P):
    """Precalc table indices and window validity for every k-mer position
    of the code rows [C, L] — pure VPU math, no gathers.

    Returns (pidx, vwin): int32 [C, P] and all-chars-valid mask."""
    k, p = turbo.k, turbo.precalc_k
    C_, L = rows.shape
    ok = (rows >= 0) & (rows < 4)
    okc = jnp.cumsum(ok.astype(jnp.int32), axis=1)
    okc = jnp.concatenate([jnp.zeros((C_, 1), jnp.int32), okc], axis=1)
    vwin = (okc[:, k:] - okc[:, :-k]) == k  # [C, P]
    cc = jnp.clip(rows, 0) & 3
    weights = jnp.asarray(4 ** np.arange(p, dtype=np.int64), dtype=jnp.int32)
    pidx = jnp.zeros((C_, P), dtype=jnp.int32)
    for j in range(p):
        pidx = pidx + cc[:, j : j + P] * weights[j]
    return pidx, vwin


def _seed_all_positions(turbo, rows, P):
    """Precalc seeds and window validity for every k-mer position of the
    given code rows [C, L] (VPU math + one seed gather per position).

    Returns (l, r, vwin): seed intervals [C, P] and all-chars-valid mask."""
    pidx, vwin = _pidx_vwin(turbo, rows, P)
    seed = turbo.precalc[pidx]  # [C, P, 2]
    return seed[..., 0], seed[..., 1], vwin


def _pack_rem(rows, P, k, p):
    """Pack the k-p remaining window chars of every position into two
    uint32 words [C, P] (lo: chars 0..15, hi: chars 16..31): char j of
    position i at bits [2j, 2j+1] of its word.  Lets the patch fallback
    fetch a whole window with one fused gather.  Requires k - p <= 32.
    (uint32 pairs, not uint64: JAX truncates 64-bit ints without x64.)"""
    cc = (jnp.clip(rows, 0) & 3).astype(jnp.uint32)
    shape = rows.shape[:-1] + (P,)
    lo = jnp.zeros(shape, dtype=jnp.uint32)
    hi = jnp.zeros(shape, dtype=jnp.uint32)
    for j in range(k - p):
        w = cc[..., p + j : p + j + P]
        if j < 16:
            lo = lo | (w << np.uint32(2 * j))
        else:
            hi = hi | (w << np.uint32(2 * (j - 16)))
    return jnp.stack([lo, hi], axis=-1)  # [..., P, 2]


def _lf_from_seeds(index, l0, r0, pw, rem):
    """Exact LF fallback from non-singleton seed intervals: `rem` LF steps
    with chars unpacked from pw ([..., 2] uint32, 2 bits/char).  Equals
    search(window) because the seed interval IS the window's first-p
    interval (SBWT.hh:423-437)."""
    from .search import lf_step

    alive = l0 >= 0
    l = jnp.where(alive, l0, 0)
    r = jnp.where(alive, r0, 0)
    for j in range(rem):
        w = pw[..., 0] if j < 16 else pw[..., 1]
        c = ((w >> np.uint32(2 * (j % 16))) & np.uint32(3)).astype(jnp.int32)
        l, r, alive = lf_step(index, l, r, c, alive)
    return jnp.where(alive, l, -1)


def _dispatch(pred, branch_true, branch_false, x, hint_true):
    """Regime dispatch: static when the caller knows the regime, lax.cond
    otherwise.

    lax.cond compiles the gathers inside its branches ~1.6x slower on
    this backend (2372 vs 1464 ms for the same full-width bitmap
    classification, scratch/r4_probe11.log).  A 0/1-trip fori pair was
    tried instead and is WORSE: XLA hoists the unchosen branch's
    loop-invariant work (the whole classification) out of the 0-trip
    loop, executing it unconditionally (r4_probe5e).  So the auto path
    accepts the cond penalty, and hot benchmarked paths pass a static
    regime_hint that removes the data-dependent branch entirely."""
    if hint_true is True:
        return branch_true(x)
    if hint_true is False:
        return branch_false(x)
    return lax.cond(pred, branch_true, branch_false, x)


def _clamp_pow2(x, lo, hi):
    """Largest power of two <= max(x, lo), capped at hi (static python)."""
    v = max(lo, min(x, hi))
    return 1 << (int(v).bit_length() - 1)


def turbo_streaming_search(
    turbo: TurboIndex,
    index,
    codes,
    lengths=None,
    chunk_lanes=None,
    chunk_slow=None,
    sync_axes=None,
    _debug_stages=4,
    regime_hint=None,
):
    """Exact streaming search via the successor table.

    codes int [B, L] (pad with -1), lengths optional int [B].  Returns
    int32 [B, P], P = L - k + 1, equal to per-k-mer search at every
    position.  `index` is the base device index, used only for the rare
    exact-LF fallback lanes (non-singleton precalc seeds).

    Every phase is REGIME-ADAPTIVE (round 4): the position-0 walk, the
    extension chain and the seed-bitmap classification each pick between
    a full-width lockstep program (right when most lanes participate —
    the hit-heavy regime) and a compacted count-adaptive program (right
    when few do — the miss-heavy regime) with a `lax.cond` on the actual
    counts; both branches compile once, one executes.  The reference's
    cost per answer DROPS on misses (a restart usually dies at the
    precalc seed, SBWT.hh:557-559); this structure gives the TPU engine
    the same property instead of paying full-width chain gathers on
    all-dead lanes.

    Restart resolution is POOLED GLOBALLY (not per lane-chunk): the
    classification stages only mark live restart positions with a
    transient sentinel, and single wide passes over the whole batch
    resolve them — narrow per-trip fallback loops at low gather
    occupancy were the round-3 miss-regime floor.
    """
    from .search import compact_indices, search_batch

    def _sync(c):
        # under shard_map with a model-sharded table every gather is a
        # psum; all devices must run every collective the same number of
        # times, so dynamic trip counts (and the cond predicates) are
        # maximized over the mesh
        return lax.pmax(c, sync_axes) if sync_axes else c


    B, L = codes.shape
    k, p = turbo.k, turbo.precalc_k
    A = turbo.arity
    P = L - k + 1
    rem = k - p
    use_pw = 0 < rem <= 32
    dt = getattr(turbo, "pos_dtype", jnp.int32)  # int64 for the wide tier
    # codes stay in their input dtype (int8 from the readers) end-to-end;
    # per-step slices are cast on the fly — at multi-million-read batches
    # an up-front int32 copy of the whole batch costs GBs of HBM.

    # ---- position 0: singleton-seed search on every lane ---------------
    # (inlined fast_search so the seed intervals are available for the
    # packed-window LF fallback below)
    cc0 = codes[:, :k].astype(jnp.int32)
    valid0 = jnp.all((cc0 >= 0) & (cc0 < 4), axis=-1)
    cc0 = jnp.clip(cc0, 0) & 3
    weights = jnp.asarray(4 ** np.arange(p, dtype=np.int64), dtype=jnp.int32)
    pidx0 = jnp.sum(cc0[:, :p] * weights, axis=-1)
    seed0 = turbo.precalc[pidx0]
    l0s, r0s = seed0[:, 0], seed0[:, 1]
    dead0 = (l0s < 0) | ~valid0
    slow0 = ~dead0 & (l0s != r0s)

    # exact fallback for non-singleton seeds at position 0 (must resolve
    # before the chain can start); count-adaptive chunks
    work0, n_slow0 = compact_indices(slow0)
    c0 = _clamp_pow2(B // 8, 8192, 1 << 18) if chunk_slow is None else chunk_slow
    c0 = min(c0, B)

    # position-0 walk: full-width lockstep while most lanes are live
    # (maximum gather occupancy), compacted trips when the batch is
    # miss-heavy and ~94% of lanes died at the seed
    walkable0 = ~dead0 & ~slow0
    # counts for the cond predicates come from cheap VPU reductions; the
    # compacted work lists (a [B]-sized scatter each) are built only
    # inside the branch that needs them
    n_walk0 = _sync(jnp.sum(walkable0.astype(jnp.int32)))

    def walk0_full(_):
        col0 = jnp.where(dead0, -1, l0s)
        return _walk_rem(turbo, col0, lambda j: cc0[:, p + j], rem)

    def walk0_compact(_):
        w0_list, _n = compact_indices(walkable0)
        Cw = min(_clamp_pow2(B // 16, 8192, 1 << 19), B)

        def body(i, col0):
            lanes = lax.dynamic_slice(w0_list, (i * Cw,), (Cw,))  # sentinel B
            safe = jnp.clip(lanes, 0, B - 1)
            win = cc0[safe]  # [Cw, k] row gather
            col = _walk_rem(
                turbo,
                jnp.where(lanes < B, l0s[safe], -1),
                lambda j: win[:, p + j],
                rem,
            )
            return col0.at[lanes].set(col, mode="drop")

        n_t = _sync((n_walk0 + Cw - 1) // Cw)
        # init derived from a varying operand: a fresh constant is
        # replicated under shard_map -> carry/cond type mismatch
        return lax.fori_loop(0, n_t, body, jnp.full_like(l0s, -1).astype(dt))

    if rem > 0:
        col0 = _dispatch(
            n_walk0 * 2 > B, walk0_full, walk0_compact,
            jnp.full_like(l0s, -1).astype(dt),
            None if regime_hint is None else regime_hint == "hit",
        )
    else:
        col0 = jnp.where(dead0, -1, l0s)
    ans0 = jnp.where(slow0, -1, col0)

    if use_pw:
        pw0 = _pack_rem(cc0, 1, k, p).reshape(B, 2)

        def body0(i, a0):
            sel = lax.dynamic_slice(work0, (i * c0,), (c0,))
            selc = jnp.clip(sel, 0, B - 1)
            res = _lf_from_seeds(index, l0s[selc], r0s[selc], pw0[selc], rem)
            return a0.at[sel].set(res, mode="drop")

    else:

        def body0(i, a0):
            sel = lax.dynamic_slice(work0, (i * c0,), (c0,))
            win = codes[jnp.clip(sel, 0, B - 1), :k].astype(jnp.int32)
            res = search_batch(index, win)
            return a0.at[sel].set(res, mode="drop")

    n0 = _sync((n_slow0 + c0 - 1) // c0)
    ans0 = lax.fori_loop(0, n0, body0, ans0)

    # ---- chain: A positions per gather ---------------------------------
    # Full-width scan while most lanes are alive at position 0; compacted
    # per-lane chunks otherwise — a dead lane's chain answers are all -1
    # by construction (dead stays dead), so at hit rate ~0 the full-width
    # scan would burn (P-1)/A gathers per lane proving nothing.  Row
    # scatters of [C, P] chain results run at GB/s (not the scalar-
    # scatter rate), measured scratch/r4_probe2.py R1.
    if P > 1:
        n_steps = -(-(P - 1) // A)
        pad_cols = n_steps * A - (P - 1)

        def chain_step(col, cs_step):
            cs = [cs_step[i].astype(jnp.int32) for i in range(A)]
            # extend semantics: lowercase codes 4..7 valid (SBWT.hh:565-566)
            outs = _step(turbo, col, cs, [c >= 0 for c in cs])
            return outs[A - 1], jnp.stack(outs)

        n_alive0 = _sync(jnp.sum((ans0 >= 0).astype(jnp.int32)))

        def chain_full(_):
            ext = jnp.concatenate(
                [codes[:, k:], jnp.full((B, pad_cols), -1, codes.dtype)], axis=1
            )  # [B, n_steps*A]
            xs = ext.T.reshape(n_steps, A, B)  # per-step chars, lanes minor
            _, outs = lax.scan(chain_step, ans0, xs)  # [n_steps, A, B]
            rest = outs.reshape(n_steps * A, B)[: P - 1].T  # [B, P-1]
            return jnp.concatenate([ans0[:, None], rest], axis=1)

        def chain_compact(_):
            alive0_list, _n = compact_indices(ans0 >= 0)
            Cc = min(_clamp_pow2(B // 4, 8192, 1 << 20), B)

            def body(i, a):
                lanes = lax.dynamic_slice(alive0_list, (i * Cc,), (Cc,))
                safe = jnp.clip(lanes, 0, B - 1)
                rows = codes[safe]  # [Cc, L] row gather
                ext = jnp.concatenate(
                    [rows[:, k:], jnp.full((Cc, pad_cols), -1, rows.dtype)], axis=1
                )
                xs = ext.T.reshape(n_steps, A, Cc)
                a0 = jnp.where(lanes < B, ans0[safe], -1)
                _, outs = lax.scan(chain_step, a0, xs)
                rest = outs.reshape(n_steps * A, Cc)[: P - 1].T
                full_rows = jnp.concatenate([a0[:, None], rest], axis=1)
                return a.at[lanes].set(full_rows, mode="drop")

            n_t = _sync((n_alive0 + Cc - 1) // Cc)
            init = jnp.concatenate(
                [ans0[:, None],
                 jnp.broadcast_to(ans0[:, None] * 0 - 1, (B, P - 1)).astype(dt)],
                axis=1,
            )
            return lax.fori_loop(0, n_t, body, init)

        ans = _dispatch(
            n_alive0 * 2 > B, chain_full, chain_compact,
            jnp.broadcast_to(ans0[:, None], (B, P)).astype(dt),
            None if regime_hint is None else regime_hint == "hit",
        )
    else:
        ans = ans0[:, None]

    # ---- restarts: positions whose predecessor is -1 -------------------
    # Patching is per DIRTY LANE (a read with any restart), not per flat
    # position: compaction runs over B lanes instead of B*P positions, and
    # all per-position math comes from the lane's own row (sliding slices).
    unresolved = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), ans[:, :-1] == -1], axis=1
    )
    if lengths is not None:
        pos_ok = jnp.arange(P)[None, :] <= (lengths[:, None] - k)
        unresolved = unresolved & pos_ok

    dirty = jnp.any(unresolved, axis=1)  # [B]
    lanes_work, n_dirty = compact_indices(dirty)
    n_dirty = _sync(n_dirty)
    # Chars walked inline per live restart before pooling survivors: at
    # least 3 regardless of arity — each char kills ~3/4 of random
    # walkers, so 3 chars leave ~1.6% for the pend stage.  At arity 1
    # min(A, rem) = 1 left 25% of walkable restarts for the pend pass,
    # whose LOCKSTEP rem2-char walk then dominated the whole mid/miss
    # regime (turbo1_hit50 pend delta: 2245 ms vs ~150 ms expected,
    # scratch/r5_probe6.log) — the round-4 turbo1 regime inversion.
    take0 = min(max(A, 3), rem) if rem > 0 else 0
    rem2 = rem - take0  # chars left for the pooled continue-walk stage
    Cn = _clamp_pow2(B // 16, 8192, 1 << 19) if chunk_lanes is None else min(chunk_lanes, B)
    Cn = min(Cn, B)
    # expected live fractions (docs/DESIGN.md: p >= 13 keeps non-singleton
    # seeds ~0.2% and live singletons ~6% of random-read positions) size
    # the fallback chunks: small enough that the pad is cheap, big enough
    # that one trip normally suffices
    cs_ = _clamp_pow2(Cn * P // 64, 8192, 1 << 16) if chunk_slow is None else chunk_slow
    cs_ = min(cs_, Cn * P)
    Ww = min(_clamp_pow2(Cn * P // 16, 8192, 1 << 18), Cn * P)  # walk-chunk width
    Lw = min(_clamp_pow2(Cn * P // 8, 8192, 1 << 19), Cn * P)  # live-chunk width

    def lane_body(i, a):
        lanes = lax.dynamic_slice(lanes_work, (i * Cn,), (Cn,))  # sentinel B
        safe = jnp.clip(lanes, 0, B - 1)
        rows = codes[safe].astype(jnp.int32)  # [Cn, L] row gather
        un = unresolved[safe] & (lanes[:, None] < B)  # [Cn, P]
        l0, r0, vwin = _seed_all_positions(turbo, rows, P)
        dead = (l0 < 0) | ~vwin
        singleton = l0 == r0
        needs_slow = ~dead & ~singleton & un
        walkable = ~dead & singleton & un

        # dead unresolved positions answer -1 outright; walk/slow scatter
        # their results on top
        new_rows = jnp.where(un & ~needs_slow & ~walkable, -1, a[safe])
        l0f, r0f = l0.ravel(), r0.ravel()

        if use_pw:
            # compacted walking: only live-singleton positions issue
            # gathers (most positions of a random read are dead at the
            # seed), with window chars from one packed fused row
            pw = _pack_rem(rows, P, k, p).reshape(Cn * P, 2)
            ww_list, wc = compact_indices(walkable)

            def walk_body(t, nr):
                sel = lax.dynamic_slice(ww_list, (t * Ww,), (Ww,))
                selc = jnp.clip(sel, 0, Cn * P - 1)
                pws = pw[selc]

                def char_fn(j):
                    w = pws[..., 0] if j < 16 else pws[..., 1]
                    return ((w >> np.uint32(2 * (j % 16))) & np.uint32(3)).astype(
                        jnp.int32
                    )

                col = _walk_rem(turbo, l0f[selc], char_fn, rem)
                return nr.ravel().at[sel].set(col, mode="drop").reshape(Cn, P)

            n_wt = _sync((wc + Ww - 1) // Ww)
            new_rows = lax.fori_loop(0, n_wt, walk_body, new_rows)

            # exact LF fallback for non-singleton seeds (rare)
            sw, sc = compact_indices(needs_slow)

            def slow_body(t, nr):
                sel = lax.dynamic_slice(sw, (t * cs_,), (cs_,))
                selc = jnp.clip(sel, 0, Cn * P - 1)
                res = _lf_from_seeds(index, l0f[selc], r0f[selc], pw[selc], rem)
                return nr.ravel().at[sel].set(res, mode="drop").reshape(Cn, P)

            n_st = _sync((sc + cs_ - 1) // cs_)
            new_rows = lax.fori_loop(0, n_st, slow_body, new_rows)
        else:
            # wide windows (k - p > 32): lockstep masked walk + full
            # re-search fallback
            col = jnp.where(walkable, l0, -1)
            col = _walk_rem(
                turbo, col, lambda j: jnp.clip(rows[:, p + j : p + j + P], 0) & 3, rem
            )
            new_rows = jnp.where(walkable, col, new_rows)
            sw, sc = compact_indices(needs_slow)
            rows_flat = rows.ravel()
            karange = jnp.arange(k, dtype=jnp.int32)

            def slow_body(t, nr):
                sel = lax.dynamic_slice(sw, (t * cs_,), (cs_,))
                lane_of = jnp.clip(sel, 0, Cn * P - 1) // P
                pos_of = jnp.clip(sel, 0, Cn * P - 1) % P
                base = lane_of * L + pos_of
                win = rows_flat[jnp.clip(base[:, None] + karange[None, :], 0, Cn * L - 1)]
                res = search_batch(index, win)
                return nr.ravel().at[sel].set(res, mode="drop").reshape(Cn, P)

            n_st = _sync((sc + cs_ - 1) // cs_)
            new_rows = lax.fori_loop(0, n_st, slow_body, new_rows)

        return a.at[lanes].set(new_rows, mode="drop")

    def _nth_set_bit64(mlo, mhi, j):
        """Position (0..63) of the (j+1)-th set bit of the 64-bit mask
        (mlo, mhi) uint32 pair — pure VPU binary search on popcounts."""
        clo = lax.population_count(mlo).astype(jnp.int32)
        hi_side = j >= clo
        m = jnp.where(hi_side, mhi, mlo)
        rem_j = j - jnp.where(hi_side, clo, 0)
        base = jnp.where(hi_side, 32, 0)
        for w in (16, 8, 4, 2, 1):
            low = m & np.uint32((1 << w) - 1)
            c2 = lax.population_count(low).astype(jnp.int32)
            go = rem_j >= c2
            m = jnp.where(go, m >> np.uint32(w), low)
            base = base + jnp.where(go, w, 0)
            rem_j = rem_j - jnp.where(go, c2, 0)
        return base

    def _block_sweep(vals_flat, live_flat, resolve, D_, wc_div=16):
        """Resolve every live position of a flat [D_] trip domain.

        Liveness is packed into 64-position blocks and the blocks are
        SORTED by live count (descending): the blocks still holding a
        j-th live position are then exactly a PREFIX of the sorted order,
        whose length comes from a count histogram known up front.  All
        (level, block) work items flatten into one count-exact sequence
        processed in full-occupancy chunks — no per-position worklist
        (a flat compact_indices over B*P measured 2.8 s/batch,
        scratch/r4_probe4.log), no per-level compactions, and no padded
        per-level trips.  Slot -> (level, block) decoding is pure VPU
        broadcast-compare against the 64-entry offset table: tiny-table
        jnp.searchsorted/take lower to DEPENDENT gathers that pay full
        gather latency per lane (~2.5 s/batch at hit0, r4_probe5).
        Each live position is visited exactly once."""
        D64 = -(-D_ // 64) * 64
        lv = live_flat
        if D64 != D_:
            lv = jnp.concatenate([lv, jnp.zeros((D64 - D_,), bool)])
        bits = lv.reshape(-1, 64)
        sh = jnp.arange(32, dtype=jnp.uint32)
        wlo_b = jnp.sum(bits[:, :32].astype(jnp.uint32) << sh, axis=1, dtype=jnp.uint32)
        whi_b = jnp.sum(bits[:, 32:].astype(jnp.uint32) << sh, axis=1, dtype=jnp.uint32)
        wb2 = lax.bitcast_convert_type(jnp.stack([wlo_b, whi_b], axis=-1), jnp.int32)
        cnt = (
            lax.population_count(wlo_b) + lax.population_count(whi_b)
        ).astype(jnp.int32)
        ND = cnt.shape[0]
        # blocks sorted by live count, busiest first (ties arbitrary)
        order = jnp.argsort(-cnt)
        # level j (the j-th live position of a block) exists for the first
        # level_counts[j] = #blocks with cnt > j sorted blocks
        hist = jnp.bincount(cnt, length=65)
        level_counts = (ND - jnp.cumsum(hist)[:64]).astype(jnp.int32)  # [64]
        offsets1 = jnp.cumsum(level_counts).astype(jnp.int32)  # offsets[1:65]
        total_live = offsets1[63]
        Wc = min(_clamp_pow2(max(D_ // wc_div, 1), 8192, _SWEEP_CHUNK_CAP), D64)

        def chunk(t, vals):
            s = t * Wc + jnp.arange(Wc, dtype=jnp.int32)
            ok = s < total_live
            # slot -> (level, index within level): broadcast compares
            # against the 64-entry tables, no gathers
            off_le = offsets1[None, :] <= s[:, None]  # [Wc, 64]
            level = jnp.sum(off_le.astype(jnp.int32), axis=1)
            base = jnp.sum(
                jnp.where(off_le, level_counts[None, :], 0), axis=1
            )
            levelc = jnp.clip(level, 0, 63)
            idx = s - base
            block = order[jnp.clip(idx, 0, ND - 1)]
            m2 = wb2[block]  # one 8-byte row gather for both mask words
            mlo = lax.bitcast_convert_type(m2[..., 0], jnp.uint32)
            mhi = lax.bitcast_convert_type(m2[..., 1], jnp.uint32)
            pos64 = _nth_set_bit64(mlo, mhi, levelc)
            fp = block * 64 + pos64
            okf = ok & (fp < D_)
            fpc = jnp.clip(fp, 0, D_ - 1)
            res = resolve(fpc, vals[fpc])
            return vals.at[jnp.where(okf, fp, D_)].set(res, mode="drop")

        n_ch = _sync((total_live + Wc - 1) // Wc).astype(jnp.int32)
        return lax.fori_loop(0, n_ch, chunk, vals_flat)

    def _win3_of(rows, pidx):
        """Per-position resolver row [C*P, 3] int32: (pidx, packed rem
        chars lo, hi) — one contiguous 12-byte gather hands a restart
        everything it needs (seed index + walk characters)."""
        pw = _pack_rem(rows, P, k, p)  # [C, P, 2] uint32
        pwi = lax.bitcast_convert_type(pw, jnp.int32)
        return jnp.concatenate([pidx[..., None], pwi], axis=-1).reshape(-1, 3)

    def _w3_chars(w3):
        pw0 = lax.bitcast_convert_type(w3[..., 1], jnp.uint32)
        pw1 = lax.bitcast_convert_type(w3[..., 2], jnp.uint32)

        def char_fn(j):
            wv = pw0 if j < 16 else pw1
            return ((wv >> np.uint32(2 * (j % 16))) & np.uint32(3)).astype(jnp.int32)

        return char_fn

    def _resolve_seed(w3, aval):
        """Seed gather + take0 (>= min(3, rem)) inline walk chars (each
        char kills ~3/4 of random walkers, so ~98% of live restarts
        finish here); survivors take the WALK_CONT encoding,
        non-singleton seeds keep the sentinel — both resolved by the
        pend pass below."""
        seed = turbo.precalc[w3[..., 0]]
        l0, r0 = seed[..., 0], seed[..., 1]
        singleton = l0 == r0
        char_fn = _w3_chars(w3)
        col = jnp.where(singleton & (l0 >= 0), l0, -1)
        col = _walk_rem(turbo, col, char_fn, take0)
        if rem2 > 0:
            col = jnp.where(col >= 0, WALK_CONT - col, -1)
        return jnp.where(singleton, col.astype(dt), dt(SLOW_SENTINEL))

    def bitmap_trip(lanes, a):
        """One dirty-lane trip: seed-bitmap triage (one pair gather per
        TWO positions answers ~94% of random restarts with -1) + the
        intra-trip block sweep resolving the live remainder."""
        Cn_ = lanes.shape[0]
        safe = jnp.clip(lanes, 0, B - 1)
        rows = codes[safe].astype(jnp.int32)  # [Cn_, L] row gather
        un = unresolved[safe] & (lanes[:, None] < B)
        pidx, vwin = _pidx_vwin(turbo, rows, P)
        Pe = (P + 1) // 2
        cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
        m = pidx[:, ::2] + cpair * jnp.int32(4**p)
        w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
        b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
        live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
        seed_live = live_pair.reshape(Cn_, 2 * Pe)[:, :P]
        alive = un & seed_live & vwin
        new_rows = jnp.where(un & ~alive, dt(-1), a[safe])
        if _debug_stages < 3:  # classification only (phase probes)
            return a.at[lanes].set(new_rows, mode="drop")
        win3 = _win3_of(rows, pidx)
        new_flat = _block_sweep(
            new_rows.reshape(-1),
            alive.reshape(-1),
            lambda fpc, aval: _resolve_seed(win3[fpc], aval),
            Cn_ * P,
        )
        return a.at[lanes].set(new_flat.reshape(Cn_, P), mode="drop")

    use_bitmap = use_pw and turbo.seed_bits is not None and 0 < 2 * p <= 32
    if not use_bitmap:
        n_lane_iters = _sync((n_dirty + Cn - 1) // Cn)
        ans = lax.fori_loop(0, n_lane_iters, lane_body, ans)
    elif _debug_stages < 2:
        pass  # chain only (phase probes)
    else:
        def pend_pass(a, w3_global=None):
            """Pend resolution: continue-walks (WALK_CONT) + non-singleton
            exact-LF (SLOW_SENTINEL), shared by both patch branches.

            Survivor counts are tiny (~2% of live restarts; ~0.2% of
            positions have non-singleton seeds at p=13), so pend LANES are
            compacted first and the block sweeps run over the compacted
            lane-chunk domain — sweeping the full [B*P] domain for a few
            hundred K pend positions paid several full-width liveness
            packings (~0.3 s/batch at hit0, scratch/r5_probe1.log).

            w3_global (the miss branch's k<=32 side table accessor) lets
            the resolvers fetch a position's window with one 8-byte row
            gather instead of rebuilding pidx + packed windows per trip."""
            pend = jnp.any(a <= SLOW_SENTINEL, axis=1)
            pl_work, n_pl = compact_indices(pend)
            n_pl = _sync(n_pl)
            # miss-heavy batches pool ~20% of all lanes here (one 1M-lane
            # trip); hit/mid batches have far fewer and a 1M trip would
            # pad the sweep domain 2x — size to the branch's regime
            Cp2 = min(1 << 20 if w3_global is not None else 1 << 19, B)

            def pend_trip(i, a):
                lanes = lax.dynamic_slice(pl_work, (i * Cp2,), (Cp2,))  # sentinel B
                safe = jnp.clip(lanes, 0, B - 1)
                lane_ok = lanes[:, None] < B
                arows = a[safe]
                if w3_global is None:
                    rows = codes[safe].astype(jnp.int32)
                    pidx, _ = _pidx_vwin(turbo, rows, P)
                    win3 = _win3_of(rows, pidx)

                    def w3_of(fpc):
                        return win3[fpc]

                else:

                    def w3_of(fpc):
                        gfp = safe[fpc // P] * P + (fpc % P)
                        return w3_global(gfp)

                D2 = Cp2 * P

                if rem2 > 0:

                    def resolve_walk(w3, aval):
                        char_fn = _w3_chars(w3)
                        col = (WALK_CONT - aval).astype(dt)
                        return _walk_rem(
                            turbo, col, lambda j: char_fn(take0 + j), rem2
                        ).astype(dt)

                    arows = _block_sweep(
                        arows.reshape(-1),
                        ((arows <= WALK_CONT) & lane_ok).reshape(-1),
                        lambda fpc, aval: resolve_walk(w3_of(fpc), aval),
                        D2,
                        wc_div=128,
                    ).reshape(Cp2, P)

                def resolve_slow(w3, aval):
                    seed = turbo.precalc[w3[..., 0]]
                    pwu = jnp.stack(
                        [
                            lax.bitcast_convert_type(w3[..., 1], jnp.uint32),
                            lax.bitcast_convert_type(w3[..., 2], jnp.uint32),
                        ],
                        axis=-1,
                    )
                    return _lf_from_seeds(
                        index, seed[..., 0], seed[..., 1], pwu, rem
                    ).astype(dt)

                arows = _block_sweep(
                    arows.reshape(-1),
                    ((arows == SLOW_SENTINEL) & lane_ok).reshape(-1),
                    lambda fpc, aval: resolve_slow(w3_of(fpc), aval),
                    D2,
                    wc_div=128,
                ).reshape(Cp2, P)
                return a.at[lanes].set(arows, mode="drop")

            n_pt = _sync((n_pl + Cp2 - 1) // Cp2)
            return lax.fori_loop(0, n_pt, pend_trip, a)

        def patch_lanes(a):
            # ---- dirty-lane trips, chunk size cond'd on the dirty count -----
            # hit-heavy batches have a few dirty lanes (small chunks: one
            # barely-padded trip); miss-heavy batches have millions (big
            # chunks amortize per-trip overhead and maximize bitmap-gather
            # occupancy).  Both loops compile, one runs.
            def patch_loop(Cn_):
                def run(a):
                    def body(i, a):
                        lanes = lax.dynamic_slice(lanes_work, (i * Cn_,), (Cn_,))
                        return bitmap_trip(lanes, a)

                    n_t = _sync((n_dirty + Cn_ - 1) // Cn_)
                    return lax.fori_loop(0, n_t, body, a)

                return run

            small = min(1 << 17, B) if chunk_lanes is None else min(chunk_lanes, B)
            big = min(1 << 19, B) if chunk_lanes is None else small
            if small == big:
                a = patch_loop(small)(a)
            else:
                a = _dispatch(
                    n_dirty > (1 << 18), patch_loop(big), patch_loop(small), a,
                    None if regime_hint is None else regime_hint != "hit",
                )

            if _debug_stages < 4:
                return a
            return pend_pass(a)


        def patch_global(a):
            """Miss-heavy branch: nearly every lane is dirty, so classify
            the WHOLE batch full-width (no lane gathers, no row scatters)
            and run ONE global block sweep over [B*P].  Resolvers
            re-derive a position's window (seed index + walk chars) from
            a packed 2-bit code-word array with one fast-zone 3-word
            gather — a global (pidx, chars) side table would be 3.6 GB
            of slow-zone rows."""
            rows = codes.astype(jnp.int32)
            pidx, vwin = _pidx_vwin(turbo, rows, P)
            Pe = (P + 1) // 2
            cpair = (jnp.clip(rows[:, p : p + P : 2], 0) & 3).astype(jnp.int32)
            m = pidx[:, ::2] + cpair * jnp.int32(4**p)
            w = turbo.seed_bits[jnp.clip(m >> 4, 0)]
            b = (w >> (2 * (m & 15)).astype(jnp.uint32)) & jnp.uint32(3)
            live_pair = jnp.stack([(b & 1) == 1, (b >> 1) == 1], axis=-1)
            seed_live = live_pair.reshape(B, 2 * Pe)[:, :P]
            alive = unresolved & seed_live & vwin
            new = jnp.where(unresolved & ~alive, dt(-1), a)
            if _debug_stages < 3:
                return new

            # k <= 32: a position's whole window (p-mer index + rem walk
            # chars = 2k bits) fits ONE 8-byte row, so a [B*P, 2] side
            # table turns the resolver's THREE scalar word gathers
            # (~26.5 ns at the fast-zone rate) into ONE row gather
            # (~14 ns slow-zone) — hit0 sweep: 3364 -> 2941 ms
            # (scratch/r5_probe5.log).  8 B/position caps the domain:
            # past ~350M positions (~200M for the int64 engine, whose
            # answer arrays already double) the table + its transients
            # OOM a 16 GB chip, and the packed-words path below serves.
            # (Round 4 rejected a 12-byte [., 3] variant as 3.6 GB; the
            # 2-word form only exists for k <= 32.)
            win2_cap = 200_000_000 if dt == jnp.int64 else 350_000_000
            if 2 * k <= 64 and B * P <= win2_cap:
                pwv = _pack_rem(rows, P, k, p)  # [B, P, 2] uint32
                sp_ = np.uint32(2 * p)
                inv_ = np.uint32(32) - sp_
                w0f = pidx.astype(jnp.uint32) | (pwv[..., 0] << sp_)
                w1f = (pwv[..., 0] >> inv_) | (pwv[..., 1] << sp_)
                win2_f = lax.bitcast_convert_type(
                    jnp.stack([w0f, w1f], axis=-1), jnp.int32
                ).reshape(-1, 2)

                def w3_at(fp):
                    """(pidx, packed rem lo, hi) from ONE 8-byte row."""
                    row2 = win2_f[fp]
                    w0s = lax.bitcast_convert_type(row2[..., 0], jnp.uint32)
                    w1s = lax.bitcast_convert_type(row2[..., 1], jnp.uint32)
                    pidx_s = (w0s & np.uint32((1 << (2 * p)) - 1)).astype(
                        jnp.int32
                    )
                    pw0 = (w0s >> sp_) | (w1s << inv_)
                    pw1 = w1s >> sp_
                    return jnp.stack(
                        [pidx_s, lax.bitcast_convert_type(pw0, jnp.int32),
                         lax.bitcast_convert_type(pw1, jnp.int32)], axis=-1
                    )

                new_flat = _block_sweep(
                    new.reshape(-1),
                    alive.reshape(-1),
                    lambda fpc, aval: _resolve_seed(w3_at(fpc), aval),
                    B * P,
                )
                new = new_flat.reshape(B, P)
                if _debug_stages < 4:
                    return new
                return pend_pass(new, w3_global=w3_at)

            # packed 2-bit code words per lane.  A window ending at the
            # last position needs words up to (2L-1)//32 <= NWq-1, so no
            # pad is needed unless P-1's base word + 2 would pass the
            # row end; keeping NW minimal keeps the array inside the
            # <=128 MB fast-gather tier (the +2-pad version was 151 MB at
            # 4M lanes — just past the cliff, scratch/r4_probe7.log)
            NWq = (L + 15) // 16
            # a window of k chars starting at bit offset <= 30 within its
            # base word spans ceil((2k + 30) / 32) words: 3 words only
            # cover k <= 33, so longer windows gather a 4th (k <= p + 32
            # <= 46 here, and 4 words cover k <= 49) — without it every
            # window char past offset 31 read as 'A' and miss-heavy
            # batches returned wrong answers for k > 33 (round-4 bug)
            need4 = 2 * k + 30 > 96
            NW = max(NWq, ((P - 1) >> 4) + (4 if need4 else 3))
            wcols = []
            for wq in range(NWq):
                acc = jnp.zeros((B,), jnp.uint32)
                for t in range(16):
                    j = wq * 16 + t
                    if j < L:
                        acc = acc | (
                            (jnp.clip(codes[:, j], 0).astype(jnp.uint32) & 3)
                            << np.uint32(2 * t)
                        )
                wcols.append(acc)
            wcols += [jnp.zeros((B,), jnp.uint32)] * (NW - NWq)
            packed_f = lax.bitcast_convert_type(
                jnp.stack(wcols, axis=1), jnp.int32
            ).reshape(-1)

            def w3_at(fp):
                """(pidx, packed rem lo, hi) of flat position fp: three
                scalar word gathers + VPU funnel shifts (a base+span
                [., 3] gather lowers to a ~4x slower per-element path,
                scratch/r4_probe7.log C1 vs probe6 M3)."""
                lane = fp // P
                pos = fp % P
                wi = lane * NW + (pos >> 4)
                w0 = lax.bitcast_convert_type(packed_f[wi], jnp.uint32)
                w1 = lax.bitcast_convert_type(packed_f[wi + 1], jnp.uint32)
                w2 = lax.bitcast_convert_type(packed_f[wi + 2], jnp.uint32)
                off = (2 * (pos & 15)).astype(jnp.uint32)
                inv = np.uint32(32) - off
                nz = off > 0
                wlo = (w0 >> off) | jnp.where(nz, w1 << inv, np.uint32(0))
                whi = (w1 >> off) | jnp.where(nz, w2 << inv, np.uint32(0))
                if need4:  # window chars 32..47 (k > 33 only; see NW above)
                    w3_ = lax.bitcast_convert_type(packed_f[wi + 3], jnp.uint32)
                    wx = (w2 >> off) | jnp.where(nz, w3_ << inv, np.uint32(0))
                else:
                    wx = jnp.zeros_like(whi)
                pidx_s = (wlo & np.uint32((1 << (2 * p)) - 1)).astype(jnp.int32)
                if 2 * p == 32:
                    pw0, pw1 = whi, wx
                else:
                    sp_ = np.uint32(2 * p)
                    pw0 = (wlo >> sp_) | (whi << (np.uint32(32) - sp_))
                    pw1 = (whi >> sp_) | (wx << (np.uint32(32) - sp_))
                return jnp.stack(
                    [pidx_s, lax.bitcast_convert_type(pw0, jnp.int32),
                     lax.bitcast_convert_type(pw1, jnp.int32)], axis=-1
                )

            new_flat = _block_sweep(
                new.reshape(-1),
                alive.reshape(-1),
                lambda fpc, aval: _resolve_seed(w3_at(fpc), aval),
                B * P,
            )
            new = new_flat.reshape(B, P)
            if _debug_stages < 4:
                return new
            # pend: shared lane-compacted pass (a global sweep paid
            # full-[B*P] liveness packings for a few hundred K positions)
            return pend_pass(new)

        # global full-width branch when (nearly) everything is dirty —
        # wrong-species screening is exactly this workload
        ans = _dispatch(
            n_dirty * 4 > 3 * B, patch_global, patch_lanes, ans,
            None if regime_hint is None else regime_hint == "miss",
        )


    if lengths is not None:
        pos_ok = jnp.arange(P)[None, :] <= (lengths[:, None] - k)
        ans = jnp.where(pos_ok, ans, -1)
    return ans


turbo_streaming_jit = jax.jit(turbo_streaming_search)
fast_search_jit = jax.jit(fast_search)


# ---------------------------------------------------------------------------
# production auto dispatch: adaptive hinting
# ---------------------------------------------------------------------------


def regime_hint_from_hit_fraction(frac: float) -> str:
    """Static regime hint from a measured hit fraction.

    Thresholds mirror the engine's own lax.cond predicates
    (turbo_streaming_search): the full-width walk/chain programs win when
    most lanes stay alive (> ~50%), and the global full-width patch wins
    when > ~75% of lanes are dirty."""
    if frac >= 0.55:
        return "hit"
    if frac <= 0.2:
        return "miss"
    return "mid"


@partial(jax.jit, static_argnames=("regime_hint",))
def _turbo_with_stats(turbo, index, codes, lengths, regime_hint):
    out = turbo_streaming_search(turbo, index, codes, lengths, regime_hint=regime_hint)
    return out, jnp.sum((out >= 0).astype(jnp.int32))


@partial(jax.jit, static_argnames=("regime_hint",))
def _turbo_reduced_stats(turbo, index, codes, lengths, regime_hint):
    """Benchmark form: the answer matrix reduces to (checksum, hits) on
    device so it never persists across reps (bench.py's contract)."""
    out = turbo_streaming_search(turbo, index, codes, lengths, regime_hint=regime_hint)
    return jnp.sum(out), jnp.sum((out >= 0).astype(jnp.int32))


class AdaptiveTurboEngine:
    """Hint-free production dispatch that runs at hinted speed.

    The reference's query loop needs no workload declaration — misses are
    simply the cheap case of the same loop (SBWT.hh:557-559,
    src/CLI/sbwt_search.cpp:46-91).  The TPU engine's equivalent property
    comes from ADAPTIVE hinting instead of lax.cond dispatch (which
    dilutes branch gathers ~1.6x on this backend, docs/DESIGN.md §4a):

    * every batch's hit count comes back as a free by-product of the
      answer reduction, and picks the static regime hint for the NEXT
      batch (regime shifts within one query stream are rare, and hints
      select among bit-identical programs — tests/test_turbo_branches.py);
    * the first large batch of a session runs a small strided PROBE
      (16K lanes, hint-free lax.cond program) to seed the hint, so even
      batch 1 runs the big program fully hinted.

    Exactness is hint-invariant; only speed adapts.  This is the engine
    behind `sbwt-tpu search` (models/sbwt.py streaming_search_batch) and
    the `*_auto` bench cells (bench.py)."""

    PROBE_LANES = 1 << 14
    PROBE_MIN_BATCH = 1 << 16

    def __init__(self, turbo, index):
        self.turbo = turbo
        self.index = index
        self.hint: str | None = None

    def _observe(self, hits: int, n_queries: int):
        if n_queries > 0:
            self.hint = regime_hint_from_hit_fraction(hits / n_queries)

    def _maybe_probe(self, codes, lengths):
        B = codes.shape[0]
        if self.hint is not None or B < self.PROBE_MIN_BATCH:
            return
        stride = max(1, B // self.PROBE_LANES)
        pc = codes[::stride][: self.PROBE_LANES]
        pl = lengths[::stride][: self.PROBE_LANES]
        _, hits = _turbo_reduced_stats(self.turbo, self.index, pc, pl, None)
        P = pc.shape[1] - self.turbo.k + 1
        self._observe(int(hits), pc.shape[0] * max(P, 1))

    def search(self, codes, lengths):
        """Full answers [B, P]; updates the hint from this batch's hits.

        The hit fraction uses all padded positions as the denominator —
        padded/invalid positions count as misses, which leans the hint
        in the direction that is also right for them (they cost like
        dead lanes)."""
        self._maybe_probe(codes, lengths)
        out, hits = _turbo_with_stats(
            self.turbo, self.index, codes, lengths, self.hint
        )
        self._observe(int(hits), out.shape[0] * max(out.shape[1], 1))
        return out

    def search_reduced(self, codes, lengths):
        """(checksum, hits) device scalars — the bench form."""
        self._maybe_probe(codes, lengths)
        B, L = codes.shape
        s, hits = _turbo_reduced_stats(
            self.turbo, self.index, codes, lengths, self.hint
        )
        h = int(hits)
        self._observe(h, B * max(L - self.turbo.k + 1, 1))
        return s, h
