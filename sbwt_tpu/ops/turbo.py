"""Turbo query engine: de Bruijn successor-pair table.

The exact-output fast path for the reference's headline workload
(`sbwt search` streaming over reads, src/CLI/sbwt_search.cpp:46-65),
trading HBM for gather count — the TPU query bottleneck is dependent
random gathers, so answers-per-gather is the whole game:

* ``pair_tbl`` int32 [n*16, 2]: entry (col*4+c1)*4+c2 holds
  (succ(col, c1), succ(succ(col, c1), c2)) where succ follows the
  out-edge labeled c from col's suffix group (SBWT.hh:566-577).  One
  8-byte gather advances a read TWO k-mer positions: 0.5 gathers/answer
  on the streaming chain, vs 2 rank gathers/answer for the LF engine.

* First k-mers and post-mismatch restarts use the **singleton seed**
  path: with precalc_k >= log4(n) the precalc interval of a k-mer's
  first p characters is almost always empty (answer -1) or a singleton
  column.  A singleton search state at < k processed characters is
  always a whole suffix group (k-mers sharing a (k-1)-suffix agree on
  any shorter suffix), so the remaining k-p characters can be walked
  with the same successor-pair table — the LF interval machinery
  (SBWT.hh:423-437) is only needed for the rare non-singleton seeds,
  which fall back to the exact engine (ops/search.py).

Output is bit-identical to SBWT::streaming_search / search (the
contract of SBWT.hh:231), verified differentially in tests.

Cost model (k=30, p=12, 100bp reads): ~45 gathers per 71 answers
= 0.63 gathers/answer -> ~100M+ answers/s/chip at the measured
70-80M dependent gathers/s.  HBM cost: 128 B/column (optional tier;
the succinct engines remain the default).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["pair_tbl", "precalc", "C"],
    meta_fields=["n_nodes", "k", "precalc_k"],
)
@dataclass(frozen=True)
class TurboIndex:
    pair_tbl: jax.Array  # int32 [n*16, 2]
    precalc: jax.Array  # int32 [4^p, 2] (shared with the base index)
    C: jax.Array  # int32 [4]
    n_nodes: int
    k: int
    precalc_k: int


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


def _build_pair_tbl(index, chunk=1 << 20):
    """Chunked over columns to bound transient HBM (~128 MB per chunk)."""
    succ = _succ1_jit(index)  # [4, n] int32
    n = succ.shape[1]
    if n <= chunk:
        return _pair_chunk(
            jnp.pad(succ, ((0, 0), (0, chunk - n))), 0, chunk
        )[: n * 16]
    n_pad = -(-n // chunk) * chunk
    succ_p = jnp.pad(succ, ((0, 0), (0, n_pad - n)))
    parts = [
        _pair_chunk(succ_p, s, chunk) for s in range(0, n_pad, chunk)
    ]
    return jnp.concatenate(parts)[: n * 16]


def build_turbo(index) -> TurboIndex:
    """Build the successor-pair table from a device index (any variant that
    implements the engine interface; plain-matrix recommended)."""
    if not index.has_streaming:
        raise ValueError("turbo engine requires streaming support (suffix group marks)")
    pair = _build_pair_tbl(index)
    return TurboIndex(
        pair_tbl=pair,
        precalc=index.precalc,
        C=index.C,
        n_nodes=index.n_nodes,
        k=index.k,
        precalc_k=index.precalc_k,
    )


# ---------------------------------------------------------------------------
# fast singleton search
# ---------------------------------------------------------------------------


def _pair_step(turbo, col, c1, c2, v1, v2):
    """Advance col by (c1, c2); returns (col after c1, col after c1c2).
    v1/v2: char-valid masks.  Dead lanes (col < 0) stay dead."""
    idx = jnp.clip(col, 0) * 16 + (c1 & 3) * 4 + (c2 & 3)
    row = turbo.pair_tbl[idx]
    n1 = jnp.where((col >= 0) & v1, row[..., 0], -1)
    n2 = jnp.where((n1 >= 0) & v2, row[..., 1], -1)
    return n1, n2


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
    rem = k - p
    tv = jnp.ones_like(col, dtype=bool)
    for j in range(0, rem - 1, 2):
        col, col2 = _pair_step(
            turbo, col, cc[..., p + j], cc[..., p + j + 1], tv, tv
        )
        col = col2
    if rem % 2 == 1:
        n1, _ = _pair_step(turbo, col, cc[..., k - 1], jnp.zeros_like(col), tv, tv)
        col = n1
    ans = jnp.where(needs_slow, -1, col)
    return ans, needs_slow


# ---------------------------------------------------------------------------
# streaming search
# ---------------------------------------------------------------------------


def turbo_streaming_search(
    turbo: TurboIndex,
    index,
    codes,
    lengths=None,
    chunk_lanes=8192,
    chunk_slow=4096,
):
    """Exact streaming search via the successor-pair table.

    codes int [B, L] (pad with -1), lengths optional int [B].  Returns
    int32 [B, P], P = L - k + 1, equal to per-k-mer search at every
    position.  `index` is the base device index, used only for the rare
    exact-LF fallback lanes.
    """
    from .search import compact_indices, search_batch

    B, L = codes.shape
    k, p = turbo.k, turbo.precalc_k
    P = L - k + 1
    total = B * P
    codes = codes.astype(jnp.int32)

    # ---- position 0: fast singleton search on every lane --------------
    ans0, slow0 = fast_search(turbo, codes[:, :k])
    # exact fallback for non-singleton seeds at position 0 (must resolve
    # before the chain can start)
    work0, n_slow0 = compact_indices(slow0)

    def body0(i, a0):
        sel = lax.dynamic_slice(work0, (i * chunk_slow,), (min(chunk_slow, B),))
        win = codes[jnp.clip(sel, 0, B - 1), :k]
        res = search_batch(index, win)
        return a0.at[sel].set(res, mode="drop")

    n0 = (n_slow0 + chunk_slow - 1) // chunk_slow
    ans0 = lax.fori_loop(0, n0, body0, ans0)

    # ---- chain: two positions per gather -------------------------------
    n_pairs = (P - 1 + 1) // 2
    if n_pairs > 0:
        ext = jnp.concatenate(
            [codes, jnp.full((B, 2), -1, dtype=jnp.int32)], axis=1
        )
        # chars for pair j: positions k+2j, k+2j+1
        c1s = jnp.stack([ext[:, k + 2 * j] for j in range(n_pairs)])
        c2s = jnp.stack([ext[:, k + 2 * j + 1] for j in range(n_pairs)])

        def step(col, cs):
            c1, c2 = cs
            # extend semantics: lowercase codes 4..7 valid (SBWT.hh:565-566)
            n1, n2 = _pair_step(turbo, col, c1, c2, c1 >= 0, c2 >= 0)
            return n2, jnp.stack([n1, n2])

        _, outs = lax.scan(step, ans0, (c1s, c2s))  # [n_pairs, 2, B]
        rest = outs.transpose(2, 0, 1).reshape(B, 2 * n_pairs)[:, : P - 1]
        ans = jnp.concatenate([ans0[:, None], rest], axis=1)
    else:
        ans = ans0[:, None]

    # ---- restarts: positions whose predecessor is -1 -------------------
    # Patching is per DIRTY LANE (a read with any restart), not per flat
    # position: compaction runs over B lanes instead of B*P positions, and
    # the k-char windows come from the lane's own row (sliding slices) so
    # no per-position window gathers are needed.
    unresolved = jnp.concatenate(
        [jnp.zeros((B, 1), dtype=bool), ans[:, :-1] == -1], axis=1
    )
    if lengths is not None:
        pos_ok = jnp.arange(P)[None, :] <= (lengths[:, None] - k)
        unresolved = unresolved & pos_ok

    dirty = jnp.any(unresolved, axis=1)  # [B]
    lanes_work, n_dirty = compact_indices(dirty)
    Cn = min(chunk_lanes, B)
    weights = jnp.asarray(4 ** np.arange(p, dtype=np.int64), dtype=jnp.int32)
    karange = jnp.arange(k, dtype=jnp.int32)
    chunk_slow = min(chunk_slow, Cn * P)

    def lane_body(i, a):
        lanes = lax.dynamic_slice(lanes_work, (i * Cn,), (Cn,))  # sentinel B
        safe = jnp.clip(lanes, 0, B - 1)
        rows = codes[safe]  # [Cn, L] row gather
        un = unresolved[safe] & (lanes[:, None] < B)  # [Cn, P]
        # per-position search validity: all k chars in 0..3
        ok = (rows >= 0) & (rows < 4)  # [Cn, L]
        okc = jnp.cumsum(ok.astype(jnp.int32), axis=1)
        okc = jnp.concatenate([jnp.zeros((Cn, 1), jnp.int32), okc], axis=1)
        vwin = (okc[:, k:] - okc[:, :-k]) == k  # [Cn, P]
        cc = jnp.clip(rows, 0) & 3
        # precalc seed index per position: sum_j cc[i+j] << 2j
        pidx = jnp.zeros((Cn, P), dtype=jnp.int32)
        for j in range(p):
            pidx = pidx + cc[:, j : j + P] * weights[j]
        seed = turbo.precalc[pidx]  # [Cn, P, 2]
        l, r = seed[..., 0], seed[..., 1]
        dead = (l < 0) | ~vwin
        singleton = l == r
        needs_slow = ~dead & ~singleton & un
        col = jnp.where(dead, -1, l)
        rem = k - p
        tv = jnp.ones_like(col, dtype=bool)
        for j in range(0, rem - 1, 2):
            c1 = rows[:, p + j : p + j + P]
            c2 = rows[:, p + j + 1 : p + j + 1 + P]
            _, col = _pair_step(turbo, col, jnp.clip(c1, 0) & 3,
                                jnp.clip(c2, 0) & 3, tv, tv)
        if rem % 2 == 1:
            clast = rows[:, k - 1 : k - 1 + P]
            col, _ = _pair_step(turbo, col, jnp.clip(clast, 0) & 3,
                                jnp.zeros_like(col), tv, tv)
        # fast results at unresolved non-slow positions; keep the rest
        new_rows = jnp.where(un & ~needs_slow, col, a[safe])

        # exact LF fallback for this chunk's non-singleton seeds, right
        # here (bounded by the chunk, so no global slow buffer to overflow)
        sw, sc = compact_indices(needs_slow)  # flat over Cn*P
        rows_flat = rows.ravel()

        def slow_body(t, nr):
            sel = lax.dynamic_slice(sw, (t * chunk_slow,), (chunk_slow,))
            lane_of = jnp.clip(sel, 0, Cn * P - 1) // P
            pos_of = jnp.clip(sel, 0, Cn * P - 1) % P
            base = lane_of * L + pos_of
            win = rows_flat[jnp.clip(base[:, None] + karange[None, :], 0, Cn * L - 1)]
            res = search_batch(index, win)
            return nr.ravel().at[sel].set(res, mode="drop").reshape(Cn, P)

        n_st = (sc + chunk_slow - 1) // chunk_slow
        new_rows = lax.fori_loop(0, n_st, slow_body, new_rows)
        return a.at[lanes].set(new_rows, mode="drop")

    n_lane_iters = (n_dirty + Cn - 1) // Cn
    ans = lax.fori_loop(0, n_lane_iters, lane_body, ans)

    if lengths is not None:
        pos_ok = jnp.arange(P)[None, :] <= (lengths[:, None] - k)
        ans = jnp.where(pos_ok, ans, -1)
    return ans


turbo_streaming_jit = jax.jit(turbo_streaming_search)
fast_search_jit = jax.jit(fast_search)
