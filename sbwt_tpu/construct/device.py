"""On-device (TPU) SBWT construction: the whole pipeline as jit sort/join
programs.

The reference's construction is KMC + external-memory sort + cursor-stream
merges on the host (kmc_construct.hh:102-238, EM_sort/).  The host-side
numpy port of that lives in construct/inmemory.py; THIS module is the
TPU-native path: window packing, colex sort, dedup, out-edge joins,
dummy-prefix emission and rank-table packing all run as one compiled XLA
program over static padded shapes — no data-dependent shapes anywhere
(counts ride along as device scalars; the only host round trips are tiny
scalar fetches at the end).

Design notes:

* k <= 32 k-mers are (hi, lo) uint32 pairs (top-aligned like
  utils/kmers.py, so pairwise unsigned compare == colex compare);
  `lax.sort` with num_keys >= 2 gives the 64-bit ordering without x64.
* Sorted-set membership (out-edge probes, predecessor tests) is done with
  the merge trick — concatenate tagged keys, one multi-key sort, check
  the left neighbor — because there is no 2-key searchsorted on device.
* Dummy prefixes are emitted into a STATIC slot budget (`src_pad`
  sources): genomes have a handful of sources (k-mers without a
  predecessor), read sets roughly one per read.  If the input exceeds the
  budget the builder raises and the caller falls back to the host path.
* Everything downstream of the big sort stays padded to static shapes;
  the final MatrixIndex simply carries zero-padded rank tables (queries
  never gather past column n_nodes - 1, so padding is invisible), with
  the true n_nodes fetched as one scalar.

Differentially tested against construct/inmemory.build_sbwt (the oracle)
in tests/test_device_build.py.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_SENT = np.uint32(0xFFFFFFFF)


def _pack_bits_words(b, n_words):
    """bool [T] -> uint32 [n_words] little-bit-order words (T <= 32*n_words)."""
    T = b.shape[0]
    b = jnp.pad(b, (0, n_words * 32 - T))
    w = b.reshape(-1, 32).astype(jnp.uint32) << jnp.arange(32, dtype=jnp.uint32)
    return w.sum(axis=1, dtype=jnp.uint32)


def _rank_rows(words):
    """uint32 words -> int32 [W, 2] (word, exclusive cumulative popcount)."""
    pc = jax.lax.population_count(words).astype(jnp.int32)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(pc)[:-1]])
    return jnp.stack([words.astype(jnp.int32), cum], axis=1)


def _drop_first(hi, lo, k):
    """Clear the first char (bits [64-2k, 65-2k]) of length-k pairs."""
    b = 64 - 2 * k
    if b >= 32:
        return hi & np.uint32(~(3 << (b - 32)) & 0xFFFFFFFF), lo
    return hi, lo & np.uint32(~(3 << b) & 0xFFFFFFFF)


def _drop_last(hi, lo):
    """64-bit shift left by 2 (drop the most-significant char pair)."""
    return (hi << 2) | (lo >> 30), lo << 2


def _append_last(hi, lo, c):
    """64-bit shift right by 2, then set the top char to c."""
    c = c.astype(jnp.uint32) if hasattr(c, "astype") else jnp.uint32(c)
    return (hi >> 2) | (c << 30), (lo >> 2) | ((hi & 3) << 30)


def _prefix(hi, lo, k, length):
    """Packed (hi, lo) of the first `length` chars of length-k pairs —
    static shift by 2*(k-length) (used with the static dummy unroll)."""
    s = 2 * (k - length)
    if s == 0:
        return hi, lo
    if s >= 64:
        return jnp.zeros_like(hi), jnp.zeros_like(lo)
    if s >= 32:
        return (lo << (s - 32)) if s > 32 else lo, jnp.zeros_like(lo)
    return (hi << s) | (lo >> (32 - s)), lo << s


def _char_at(hi, lo, d):
    """Char code at distance d (static) from the end."""
    b = 62 - 2 * d
    if b >= 32:
        return ((hi >> (b - 32)) & 3).astype(jnp.int32)
    return ((lo >> b) & 3).astype(jnp.int32)


def _member_sorted(a_hi, a_lo, a_n, q_hi, q_lo, q_valid):
    """Membership of queries in a sorted-distinct list, via one merge sort.

    a_*: sorted distinct keys compacted to the front (first a_n real).
    q_*: query keys (any order), q_valid masks live queries.
    Returns bool [len(q)] — query key present among the first a_n a-keys.
    """
    m_a, m_q = a_hi.shape[0], q_hi.shape[0]
    in_a = jnp.arange(m_a) < a_n
    hi = jnp.concatenate([jnp.where(in_a, a_hi, _SENT), jnp.where(q_valid, q_hi, _SENT)])
    lo = jnp.concatenate([jnp.where(in_a, a_lo, _SENT), jnp.where(q_valid, q_lo, _SENT)])
    tag = jnp.concatenate(
        [jnp.zeros(m_a, jnp.uint32), jnp.ones(m_q, jnp.uint32)]
    )
    src = jnp.concatenate(
        [jnp.full(m_a, m_q, jnp.int32), jnp.arange(m_q, dtype=jnp.int32)]
    )
    shi, slo, stag, ssrc = lax.sort((hi, lo, tag, src), num_keys=3)
    # a query hits iff its equal-key RUN starts with an a-entry (a-keys are
    # distinct and sort first within a run; queries may repeat — e.g.
    # predecessor probes of k-mers sharing a (k-1)-prefix — so propagate
    # the run-start tag with a cummax instead of checking one neighbor)
    tot = m_a + m_q
    i = jnp.arange(tot, dtype=jnp.int32)
    run_start = (i == 0) | (shi != jnp.roll(shi, 1)) | (slo != jnp.roll(slo, 1))
    enc = jnp.where(run_start, 2 * i + (stag == 0), -1)
    first_is_a = (lax.cummax(enc) & 1) == 1
    hit_here = first_is_a & (stag == 1)
    out = jnp.zeros(m_q, dtype=bool)
    out = out.at[ssrc].max(hit_here, mode="drop")
    return out & q_valid


@partial(jax.jit, static_argnames=("k", "src_pad", "streaming", "n_words"))
def _build_device_jit(codes, k, src_pad, streaming, n_words):
    """The construction program.  codes int8 [Ntot] (-1 separates/pads).

    Returns (rank_tbl [4*n_words, 2] i32, sgs_tbl [n_words, 2] i32,
    C i32 [4], n_nodes i32, n_kmers i32, n_src i32)."""
    Ntot = codes.shape[0]
    m = Ntot - k + 1
    u = (codes & 3).astype(jnp.uint32)

    # ---- pack windows (k static shifted passes, VPU) -------------------
    hi = jnp.zeros(m, jnp.uint32)
    lo = jnp.zeros(m, jnp.uint32)
    for j in range(k):
        b = 64 - 2 * k + 2 * j  # bit of the char at window offset j
        w = lax.dynamic_slice(u, (j,), (m,))
        if b >= 32:
            hi = hi | (w << (b - 32))
        else:
            lo = lo | (w << b)
    bad = (codes < 0).astype(jnp.int32)
    cs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(bad)])
    valid = (cs[k:] - cs[:-k]) == 0
    hi = jnp.where(valid, hi, _SENT)
    lo = jnp.where(valid, lo, _SENT)

    # ---- colex sort + dedup -------------------------------------------
    shi, slo = lax.sort((hi, lo), num_keys=2)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    idx = jnp.arange(m, dtype=jnp.int32)
    newk = ((idx == 0) | (shi != jnp.roll(shi, 1)) | (slo != jnp.roll(slo, 1))) & (
        idx < n_valid
    )
    # compact distinct keys to the front (cumsum scatter, ops/search.py style)
    pos = jnp.cumsum(newk.astype(jnp.int32)) - 1
    n = jnp.where(m > 0, pos[-1] + 1, 0)  # distinct k-mer count
    dv_hi = jnp.full(m, _SENT)
    dv_lo = jnp.full(m, _SENT)
    dv_hi = dv_hi.at[jnp.where(newk, pos, m)].set(shi, mode="drop")
    dv_lo = dv_lo.at[jnp.where(newk, pos, m)].set(slo, mode="drop")
    in_n = idx < n

    # ---- suffix groups among k-mers -----------------------------------
    sf_hi, sf_lo = _drop_first(dv_hi, dv_lo, k)
    gstart = ((idx == 0) | (sf_hi != jnp.roll(sf_hi, 1)) | (sf_lo != jnp.roll(sf_lo, 1))) & in_n
    # group id per kmer column; rep suffix value broadcast over the group
    gid = jnp.cumsum(gstart.astype(jnp.int32)) - 1

    # ---- out-edges: probe rep-suffix . c against the k-mer set --------
    kmer_bits = []
    for c in range(4):
        y_hi, y_lo = _append_last(sf_hi, sf_lo, jnp.uint32(c))
        present = _member_sorted(dv_hi, dv_lo, n, y_hi, y_lo, gstart)
        # present at the group REP: every column of the group shares it
        # only the rep column carries the edge bit (subset structure)
        kmer_bits.append(present & gstart)

    # ---- sources: k-mers whose (k-1)-predecessor suffix is absent -----
    # predecessors = drop_last(kmer); membership against the distinct
    # rep suffixes (compacted like dv)
    n_rep = jnp.sum(gstart.astype(jnp.int32))
    rpos = jnp.cumsum(gstart.astype(jnp.int32)) - 1
    rs_hi = jnp.full(m, _SENT)
    rs_lo = jnp.full(m, _SENT)
    rs_hi = rs_hi.at[jnp.where(gstart, rpos, m)].set(sf_hi, mode="drop")
    rs_lo = rs_lo.at[jnp.where(gstart, rpos, m)].set(sf_lo, mode="drop")
    p_hi, p_lo = _drop_last(dv_hi, dv_lo)
    has_pred = _member_sorted(rs_hi, rs_lo, n_rep, p_hi, p_lo, in_n)
    is_src = in_n & ~has_pred
    n_src = jnp.sum(is_src.astype(jnp.int32))
    spos = jnp.cumsum(is_src.astype(jnp.int32)) - 1
    src_hi = jnp.full(src_pad, _SENT)
    src_lo = jnp.full(src_pad, _SENT)
    src_hi = src_hi.at[jnp.where(is_src, spos, src_pad)].set(dv_hi, mode="drop")
    src_lo = src_lo.at[jnp.where(is_src, spos, src_pad)].set(dv_lo, mode="drop")
    src_ok = jnp.arange(src_pad) < n_src

    # ---- dummy prefixes (static unroll over lengths k-1..0) -----------
    D = src_pad * k + 1
    parts_hi, parts_lo, parts_len, parts_edge, parts_ok = [], [], [], [], []
    for l in range(k - 1, -1, -1):
        ph, pl = _prefix(src_hi, src_lo, k, l)
        parts_hi.append(ph)
        parts_lo.append(pl)
        parts_len.append(jnp.full(src_pad, l, jnp.int32))
        # the edge char = source char at index l = distance k-1-l from end
        parts_edge.append(_char_at(src_hi, src_lo, k - 1 - l))
        parts_ok.append(src_ok)
    # + the root (always exists, initially edge-less)
    parts_hi.append(jnp.zeros(1, jnp.uint32))
    parts_lo.append(jnp.zeros(1, jnp.uint32))
    parts_len.append(jnp.zeros(1, jnp.int32))
    parts_edge.append(jnp.full(1, -1, jnp.int32))
    parts_ok.append(jnp.ones(1, bool))
    dd_hi = jnp.concatenate(parts_hi)
    dd_lo = jnp.concatenate(parts_lo)
    dd_len = jnp.concatenate(parts_len)
    dd_edge = jnp.concatenate(parts_edge)
    dd_ok = jnp.concatenate(parts_ok)
    dd_hi = jnp.where(dd_ok, dd_hi, _SENT)
    dd_lo = jnp.where(dd_ok, dd_lo, _SENT)
    dd_lenk = jnp.where(dd_ok, dd_len.astype(jnp.uint32), jnp.uint32(255))

    # ---- dedup dummies by (val, len), OR-ing edges --------------------
    sd_hi, sd_lo, sd_len, sd_edge = lax.sort(
        (dd_hi, dd_lo, dd_lenk, dd_edge), num_keys=3
    )
    di = jnp.arange(D, dtype=jnp.int32)
    n_dd = jnp.sum(dd_ok.astype(jnp.int32))
    dnew = (
        (di == 0)
        | (sd_hi != jnp.roll(sd_hi, 1))
        | (sd_lo != jnp.roll(sd_lo, 1))
        | (sd_len != jnp.roll(sd_len, 1))
    ) & (di < n_dd)
    dgid = jnp.cumsum(dnew.astype(jnp.int32)) - 1
    n_d = jnp.where(D > 0, jnp.maximum(dgid[-1] + 1, 0), 0)
    n_d = jnp.where(n_dd > 0, n_d, 0)
    du_hi = jnp.full(D, _SENT)
    du_lo = jnp.full(D, _SENT)
    du_len = jnp.full(D, jnp.uint32(255))
    tgt = jnp.where(dnew, dgid, D)
    du_hi = du_hi.at[tgt].set(sd_hi, mode="drop")
    du_lo = du_lo.at[tgt].set(sd_lo, mode="drop")
    du_len = du_len.at[tgt].set(sd_len, mode="drop")
    du_bits = []
    for c in range(4):
        bc = jnp.zeros(D, dtype=bool)
        live = di < n_dd
        bc = bc.at[jnp.where(live, dgid, D)].max(sd_edge == c, mode="drop")
        du_bits.append(bc)

    # ---- final merge of dummies + k-mers ------------------------------
    T = m + D
    a_hi = jnp.concatenate([du_hi, dv_hi])
    a_lo = jnp.concatenate([du_lo, dv_lo])
    a_len = jnp.concatenate(
        [du_len, jnp.where(in_n, jnp.uint32(k), jnp.uint32(255))]
    )
    a_bits = [
        jnp.concatenate([du_bits[c], kmer_bits[c]]).astype(jnp.uint32)
        for c in range(4)
    ]
    nm_hi, nm_lo, nm_len, b0, b1, b2, b3 = lax.sort(
        (a_hi, a_lo, a_len, a_bits[0], a_bits[1], a_bits[2], a_bits[3]),
        num_keys=3,
    )
    n_nodes = n + n_d
    ti = jnp.arange(T, dtype=jnp.int32)
    node_ok = ti < n_nodes
    bits = [(b.astype(bool) & node_ok) for b in (b0, b1, b2, b3)]

    # ---- streaming support over all nodes -----------------------------
    if streaming:
        full = nm_len == k
        kh, kl = _drop_first(nm_hi, nm_lo, k)
        sh_hi = jnp.where(full, kh, nm_hi)
        sh_lo = jnp.where(full, kl, nm_lo)
        sh_len = jnp.where(full, jnp.uint32(k - 1), nm_len)
        sgs = (
            (ti == 0)
            | (sh_hi != jnp.roll(sh_hi, 1))
            | (sh_lo != jnp.roll(sh_lo, 1))
            | (sh_len != jnp.roll(sh_len, 1))
        ) & node_ok
    else:
        sgs = jnp.zeros(T, dtype=bool)

    # ---- rank tables ---------------------------------------------------
    rank_tbl = jnp.concatenate(
        [_rank_rows(_pack_bits_words(bits[c], n_words)) for c in range(4)]
    )
    sgs_words = _pack_bits_words(sgs, n_words)
    sgs_tbl = jnp.stack(
        [
            sgs_words.astype(jnp.int32),
            jnp.concatenate([jnp.zeros(1, jnp.int32), sgs_words[:-1].astype(jnp.int32)]),
        ],
        axis=1,
    )
    counts = jnp.stack([jnp.sum(b, dtype=jnp.int32) for b in bits])
    C = jnp.concatenate([jnp.ones(1, jnp.int32), jnp.cumsum(counts)[:-1] + 1])
    n_kmers = n
    return rank_tbl, sgs_tbl, C, n_nodes, n_kmers, n_src


def _round_up(x: int, quantum: int) -> int:
    return -(-x // quantum) * quantum


def prepare_device_codes(
    seqs, k: int, pad_quantum: int = 1 << 20, src_pad: int | None = None
):
    """Flatten + pad sequences for the device builder and upload once.

    Returns (codes_device, src_pad, n_words) — reusable across repeat
    builds (benchmarks re-time the compiled program without re-paying the
    tunnel upload)."""
    from ..utils.dna import encode

    if k > 32:
        raise ValueError("device construction supports k <= 32")
    parts = []
    for s in seqs:
        codes = s if isinstance(s, np.ndarray) else encode(s)
        parts.append(codes.astype(np.int8))
        parts.append(np.full(1, -1, dtype=np.int8))  # separator
    flat = np.concatenate(parts) if parts else np.full(1, -1, dtype=np.int8)
    Ntot = _round_up(max(len(flat), k + 1), pad_quantum)
    buf = np.full(Ntot, -1, dtype=np.int8)
    buf[: len(flat)] = flat

    m = Ntot - k + 1
    if src_pad is None:
        src_pad = max(1024, min(m, len(parts) // 2 + m // 16))
    n_words = (m + src_pad * k + 1) // 32 + 1
    return jnp.asarray(buf), src_pad, n_words


def build_sbwt_device(
    seqs,
    k: int,
    streaming_support: bool = True,
    precalc_k: int = 0,
    src_pad: int | None = None,
    pad_quantum: int = 1 << 20,
    prepared=None,
):
    """Build a plain-matrix MatrixIndex ON DEVICE from sequences.

    seqs: list of str / int8 code arrays.  k <= 32.  Construction runs as
    one compiled program (see module docstring); input length is padded to
    `pad_quantum` so repeat builds of similar sizes reuse the compile.
    `prepared` (from prepare_device_codes) skips the flatten + upload.

    Raises ValueError when the source budget overflows (inputs with more
    predecessor-less k-mers than src_pad — extremely fragmented inputs);
    callers should fall back to the host builder then.
    """
    from ..models.matrix import MatrixIndex, with_precalc

    buf_d, src_pad, n_words = (
        prepared
        if prepared is not None
        else prepare_device_codes(seqs, k, pad_quantum, src_pad)
    )
    rank_tbl, sgs_tbl, C, n_nodes, n_kmers, n_src = _build_device_jit(
        buf_d, k, src_pad, bool(streaming_support), n_words
    )
    n_src = int(n_src)
    if n_src > src_pad:
        raise ValueError(
            f"device build source budget exceeded ({n_src} > {src_pad}); "
            "use the host builder or raise src_pad"
        )
    index = MatrixIndex(
        rank_tbl=rank_tbl,
        sgs_tbl=sgs_tbl if streaming_support else jnp.zeros((1, 2), jnp.int32),
        C=C,
        precalc=jnp.zeros((1, 2), dtype=jnp.int32),
        n_nodes=int(n_nodes),
        n_kmers=int(n_kmers),
        k=int(k),
        precalc_k=0,
        n_words=n_words,
        has_streaming=bool(streaming_support),
    )
    if precalc_k > 0:
        index = with_precalc(index, precalc_k)
    return index
