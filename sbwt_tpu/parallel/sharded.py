"""Multi-chip execution: data-parallel queries + row-sharded (TP) index.

The reference is single-node, single-threaded at query time
(src/CLI/sbwt_search.cpp:46-91); its only scaling story is "run more
processes".  Here scaling is mesh-native:

* **Data parallelism** (the primary axis): query batches are sharded over
  the `data` mesh axis; the index tables are replicated.  The engines in
  ops/search.py run unchanged under jit with sharding annotations — every
  gather is local, no collectives on the hot path.

* **Tensor parallelism** (for indexes too large to replicate): the rank
  tables are row-sharded over the `model` axis; each device answers the
  rank queries whose word falls in its shard and the partial answers are
  combined with a `psum` over `model`.  This is expressed with
  `shard_map`, reusing the exact same engine code through a duck-typed
  index view (`TPIndexView`) that implements the two-gather interface.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.matrix import FusedRowEngineMixin, MatrixIndex
from ..ops import search as engines


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# Data parallelism: replicated index, sharded queries
# ---------------------------------------------------------------------------

def replicate_index(index: MatrixIndex, mesh: Mesh) -> MatrixIndex:
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), index)


def dp_streaming_search(index: MatrixIndex, codes, lengths, mesh: Mesh):
    """Streaming search with reads sharded over the data axis."""
    batch_sharding = NamedSharding(mesh, P("data", None))
    lane_sharding = NamedSharding(mesh, P("data"))
    codes = jax.device_put(codes, batch_sharding)
    lengths = jax.device_put(lengths, lane_sharding)
    fn = jax.jit(
        engines.streaming_search,
        out_shardings=batch_sharding,
    )
    return fn(index, codes, lengths)


def dp_search(index: MatrixIndex, codes, mesh: Mesh):
    """Per-k-mer search with k-mers sharded over the data axis."""
    batch_sharding = NamedSharding(mesh, P("data", None))
    codes = jax.device_put(codes, batch_sharding)
    fn = jax.jit(engines.search_batch, out_shardings=NamedSharding(mesh, P("data")))
    return fn(index, codes)


def dp_turbo_streaming_search(turbo, index, codes, lengths, mesh: Mesh):
    """Turbo streaming search with reads sharded over `data` and the
    successor-pair table replicated.  shard_map (not sharding-annotated
    jit) so each device's restart-patch loop runs its own trip count with
    no cross-device synchronization — the turbo path has no collectives.
    """
    from ..ops.turbo import turbo_streaming_search

    def body(turbo_l, index_l, codes_l, lengths_l):
        return turbo_streaming_search(turbo_l, index_l, codes_l, lengths_l)

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P("data", None), P("data")),
            out_specs=P("data", None),
        )
    )
    repl = NamedSharding(mesh, P())
    turbo = jax.tree.map(lambda x: jax.device_put(x, repl), turbo)
    index = jax.tree.map(lambda x: jax.device_put(x, repl), index)
    codes = jax.device_put(codes, NamedSharding(mesh, P("data", None)))
    lengths = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    return fn(turbo, index, codes, lengths)


# ---------------------------------------------------------------------------
# Tensor parallelism: row-sharded rank tables
# ---------------------------------------------------------------------------

@dataclass
class TPIndexView(FusedRowEngineMixin):
    """Per-device view of a row-sharded index inside shard_map.

    Implements the same gather interface as MatrixIndex (rank_row /
    sgs_row); out-of-shard gathers contribute zero and a psum over the
    `model` axis reassembles the full row.  The engine-facing methods
    (rank_c / extend_rank / sg_start) come from the fused-row mixin.
    """

    rank_local: jax.Array  # int32 [rows_per_shard, 2]
    sgs_local: jax.Array  # int32 [sgs_rows_per_shard, 2]
    C: jax.Array
    precalc: jax.Array
    n_nodes: int
    n_kmers: int
    k: int
    precalc_k: int
    n_words: int
    has_streaming: bool
    axis: str = "model"

    def _sharded_gather(self, table, idx):
        shard = lax.axis_index(self.axis).astype(jnp.int32)
        rows = table.shape[0]
        lo = shard * rows
        local = idx - lo
        in_range = (local >= 0) & (local < rows)
        row = table[jnp.clip(local, 0, rows - 1)]
        row = jnp.where(in_range[..., None], row, 0)
        return lax.psum(row, self.axis)

    def rank_row(self, c, w):
        return self._sharded_gather(self.rank_local, c * self.n_words + w)

    def sgs_row(self, w):
        return self._sharded_gather(self.sgs_local, w)


def _pad_rows(arr: np.ndarray | jax.Array, multiple: int):
    rows = arr.shape[0]
    target = -(-rows // multiple) * multiple
    if target == rows:
        return arr
    pad = [(0, target - rows)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad)


def is_row_sharded(index: MatrixIndex, mesh: Mesh) -> bool:
    """True if the index's rank/sgs tables are already row-sharded over
    this mesh's `model` axis (so the TP entry points can skip the
    re-placement device_put — a real cost on big meshes)."""
    want = NamedSharding(mesh, P("model", None))
    n_model = mesh.shape["model"]
    try:
        return (
            isinstance(index.rank_tbl, jax.Array)
            and index.rank_tbl.sharding.is_equivalent_to(want, index.rank_tbl.ndim)
            and index.sgs_tbl.sharding.is_equivalent_to(want, index.sgs_tbl.ndim)
            and index.rank_tbl.shape[0] % n_model == 0
            and index.sgs_tbl.shape[0] % n_model == 0
        )
    except (AttributeError, TypeError):
        return False


def shard_index_rows(index: MatrixIndex, mesh: Mesh) -> MatrixIndex:
    """Place the index with rank/sgs tables row-sharded over `model`.

    Idempotent and cheap if the index is already placed that way."""
    if is_row_sharded(index, mesh):
        return index
    n_model = mesh.shape["model"]
    rank_tbl = _pad_rows(index.rank_tbl, n_model)
    sgs_tbl = _pad_rows(index.sgs_tbl, n_model)
    row_shard = NamedSharding(mesh, P("model", None))
    repl = NamedSharding(mesh, P())
    return dataclasses.replace(
        index,
        rank_tbl=jax.device_put(rank_tbl, row_shard),
        sgs_tbl=jax.device_put(sgs_tbl, row_shard),
        C=jax.device_put(index.C, repl),
        precalc=jax.device_put(index.precalc, repl),
    )


def _tp_view(meta: MatrixIndex, rank_local, sgs_local, C, precalc) -> TPIndexView:
    # Only static python metadata is taken from `meta`; every array comes in
    # as an explicit shard_map operand (closing over sharded globals inside
    # the body would capture them as constants).
    return TPIndexView(
        rank_local=rank_local,
        sgs_local=sgs_local,
        C=C,
        precalc=precalc,
        n_nodes=meta.n_nodes,
        n_kmers=meta.n_kmers,
        k=meta.k,
        precalc_k=meta.precalc_k,
        n_words=meta.n_words,
        has_streaming=meta.has_streaming,
    )


def tp_search(index: MatrixIndex, codes, mesh: Mesh):
    """Per-k-mer search over a (data, model)-sharded mesh.

    The index rows live sharded over `model`; queries are sharded over
    `data`; each rank gather is a masked local gather + psum over `model`.
    """
    sharded = shard_index_rows(index, mesh)

    def body(rank_local, sgs_local, C, precalc, codes_local):
        view = _tp_view(index, rank_local, sgs_local, C, precalc)
        return engines.search_batch(view, codes_local)

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("model", None), P("model", None), P(), P(), P("data", None)),
            out_specs=P("data"),
        )
    )
    codes = jax.device_put(codes, NamedSharding(mesh, P("data", None)))
    return fn(sharded.rank_tbl, sharded.sgs_tbl, sharded.C, sharded.precalc, codes)


@dataclass
class TPTurboView:
    """Per-device view of a row-sharded turbo successor table inside
    shard_map: same interface as ops.turbo.TurboIndex (tbl_row /
    tbl_row_sub + the fields the engine reads), with out-of-shard row
    gathers contributing zero and a psum over `model` reassembling the
    row.  The seed bitmap and precalc stay replicated (8.4 MB / 537 MB vs
    the multi-GB table — sharding THE TABLE is what drops per-device HBM
    with mesh size).

    Row indexing is REBASED per shard: the arity>=2 step supplies
    (column, sub-index) separately (ops/turbo.py tbl_row_sub), so the
    flat row index (col - shard_base) * 4^arity + sub is formed only
    AFTER subtracting the shard base — the global col * 4^arity would
    overflow int32 past 2^31 / 4^arity columns, but per-shard indexing
    only needs one shard's columns to fit (the reference is int64
    throughout and has no such ceiling, SBWT.hh:44-46)."""

    tbl_local: jax.Array  # int32 [cols_per_shard * 4^arity, w]
    precalc: jax.Array
    C: jax.Array
    seed_bits: jax.Array | None
    n_nodes: int
    k: int
    precalc_k: int
    arity: int
    axis: str = "model"

    pos_dtype = jnp.int32

    def tbl_row(self, idx):
        # arity-1 path: idx IS the column (< n < 2^31) — flat rebasing safe
        shard = lax.axis_index(self.axis).astype(jnp.int32)
        rows = self.tbl_local.shape[0]
        local = idx - shard * rows
        in_range = (local >= 0) & (local < rows)
        row = self.tbl_local[jnp.clip(local, 0, rows - 1)]
        row = jnp.where(in_range[..., None], row, 0)
        return lax.psum(row, self.axis)

    def succ_from_row(self, row, c, alive):
        s01 = jnp.where(c == 0, row[..., 0], row[..., 1])
        s23 = jnp.where(c == 2, row[..., 2], row[..., 3])
        s = jnp.where(c <= 1, s01, s23)
        return jnp.where(alive, s, -1)

    def tbl_row_sub(self, col, sub):
        shard = lax.axis_index(self.axis).astype(jnp.int32)
        rpc = 4**self.arity  # rows per column
        cols = self.tbl_local.shape[0] // rpc
        local_col = col - shard * cols
        in_range = (local_col >= 0) & (local_col < cols)
        local = jnp.clip(local_col, 0, cols - 1) * jnp.int32(rpc) + sub
        row = self.tbl_local[local]
        row = jnp.where(in_range[..., None], row, 0)
        return lax.psum(row, self.axis)


def _check_shard_cols(cols_per_shard: int, arity: int):
    if cols_per_shard * (4**arity) >= 2**31:
        raise ValueError(
            f"turbo TP shard too large: {cols_per_shard} columns * 4^{arity} "
            "rows exceeds int32 per-shard indexing; use more model-axis devices"
        )


def shard_turbo_rows(turbo, mesh: Mesh):
    """Place an already-built turbo successor table row-sharded over
    `model`; the small leaves (precalc, C, seed_bits) replicated.

    Shards are padded to whole-COLUMN boundaries (4^arity rows) so the
    per-shard rebased indexing of TPTurboView.tbl_row_sub lines up.  For
    tables too large to build on one device, use build_turbo_sharded."""
    import dataclasses as _dc

    n_model = mesh.shape["model"]
    rpc = 4**turbo.arity if turbo.arity >= 2 else 1
    tbl = _pad_rows(turbo.tbl, n_model * rpc)
    _check_shard_cols(tbl.shape[0] // n_model // rpc, turbo.arity if turbo.arity >= 2 else 0)
    row_shard = NamedSharding(mesh, P("model", None))
    repl = NamedSharding(mesh, P())
    return _dc.replace(
        turbo,
        tbl=jax.device_put(tbl, row_shard),
        precalc=jax.device_put(turbo.precalc, repl),
        C=jax.device_put(turbo.C, repl),
        seed_bits=(
            jax.device_put(turbo.seed_bits, repl)
            if turbo.seed_bits is not None
            else None
        ),
    )


def is_turbo_row_sharded(turbo, mesh: Mesh) -> bool:
    """True if the turbo table is already row-sharded over this mesh's
    `model` axis on whole-column boundaries (e.g. built by
    build_turbo_sharded) — the TP entry point then skips re-placement."""
    want = NamedSharding(mesh, P("model", None))
    n_model = mesh.shape["model"]
    rpc = 4**turbo.arity if turbo.arity >= 2 else 1
    try:
        return (
            isinstance(turbo.tbl, jax.Array)
            and turbo.tbl.sharding.is_equivalent_to(want, turbo.tbl.ndim)
            and turbo.tbl.shape[0] % (n_model * rpc) == 0
        )
    except (AttributeError, TypeError):
        return False


def build_turbo_sharded(index: MatrixIndex, mesh: Mesh, arity: int = 2):
    """Build the turbo successor table DIRECTLY row-sharded over `model`:
    each device expands only its own column range from the replicated
    1-step successor map, so the aggregate table can exceed any single
    device's HBM (building on one device first — shard_turbo_rows —
    caps the table at what one device can materialize, which defeats the
    point of sharding it).

    The replicated inputs are tiny next to the table: succ is 16 B/column
    vs 128 B (arity 2) or 1 KiB (arity 3) for the table itself.  Returns
    a TurboIndex whose tbl is a global jax.Array sharded P('model', None);
    query it with tp_turbo_streaming_search."""
    from ..ops.turbo import (
        TurboIndex, _pack_seed_pair_bits, _pair_chunk, _triple_chunk,
        _succ1_jit,
    )

    if arity not in (2, 3):
        raise ValueError("sharded turbo build supports arity 2 or 3")
    if not index.has_streaming:
        raise ValueError("turbo engine requires streaming support (suffix group marks)")
    n_model = mesh.shape["model"]
    n = index.n_nodes
    chunk = 1 << 20 if arity == 2 else 1 << 18
    per_shard = -(-n // n_model)
    chunk = min(chunk, max(1024, per_shard))
    # columns per shard: multiple of chunk so the per-shard build loops
    # over whole chunks; every shard holds the same count (shard_map needs
    # equal block shapes), tail shards hold pad columns (never gathered)
    cps = -(-per_shard // chunk) * chunk
    _check_shard_cols(cps, arity)
    succ = _succ1_jit(index)  # [4, n] int32, replicated
    succ_p = jnp.pad(succ, ((0, 0), (0, n_model * cps - n)))
    rpc = 4**arity
    width = 2 if arity == 2 else 4
    fn_chunk = _pair_chunk.__wrapped__ if arity == 2 else _triple_chunk.__wrapped__
    n_chunks = cps // chunk

    def body(succ_l):
        base = lax.axis_index("model").astype(jnp.int32) * cps
        # the carry must be device-varying like the chunk parts it
        # accumulates (a fresh constant is replicated -> carry mismatch)
        tbl = lax.pcast(
            jnp.zeros((cps * rpc, width), dtype=jnp.int32),
            "model",
            to="varying",
        )

        def fill(i, tbl):
            part = fn_chunk(succ_l, base + i * chunk, chunk)
            return lax.dynamic_update_slice(tbl, part, (i * chunk * rpc, 0))

        return lax.fori_loop(0, n_chunks, fill, tbl)

    built = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(),),
            out_specs=P("model", None),
        )
    )(jax.device_put(succ_p, NamedSharding(mesh, P())))

    repl = NamedSharding(mesh, P())
    seed_bits = (
        jax.device_put(_pack_seed_pair_bits(index.precalc[:, 0] >= 0), repl)
        if 0 < index.precalc_k <= 14
        else None
    )
    return TurboIndex(
        tbl=built,
        precalc=jax.device_put(index.precalc, repl),
        C=jax.device_put(index.C, repl),
        n_nodes=n,
        k=index.k,
        precalc_k=index.precalc_k,
        arity=arity,
        seed_bits=seed_bits,
    )


def tp_turbo_streaming_search(turbo, index: MatrixIndex, codes, lengths, mesh: Mesh):
    """Turbo streaming search with the SUCCESSOR TABLE row-sharded over
    `model` and reads sharded over `data` — for indexes whose turbo table
    exceeds one device's HBM (per-device table cost drops linearly with
    the model-axis size).  The base index (rank tables, ~5 B/column) and
    the precalc/seed-bitmap stay replicated; every successor gather
    becomes a masked local gather + psum.  Dynamic trip counts are
    pmax-synchronized over the whole mesh so every device runs every
    collective."""
    from ..ops.turbo import turbo_streaming_search

    sharded_t = turbo if is_turbo_row_sharded(turbo, mesh) else shard_turbo_rows(turbo, mesh)
    repl = NamedSharding(mesh, P())
    index = jax.tree.map(lambda x: jax.device_put(x, repl), index)

    def body(tbl_local, precalc, C, seed_bits, index_l, codes_l, lengths_l):
        view = TPTurboView(
            tbl_local=tbl_local,
            precalc=precalc,
            C=C,
            seed_bits=seed_bits,
            n_nodes=turbo.n_nodes,
            k=turbo.k,
            precalc_k=turbo.precalc_k,
            arity=turbo.arity,
        )
        return turbo_streaming_search(
            view, index_l, codes_l, lengths_l, sync_axes=("data", "model")
        )

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("model", None),
                P(),
                P(),
                P(),
                P(),
                P("data", None),
                P("data"),
            ),
            out_specs=P("data", None),
        )
    )
    codes = jax.device_put(codes, NamedSharding(mesh, P("data", None)))
    lengths = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    return fn(
        sharded_t.tbl, sharded_t.precalc, sharded_t.C, sharded_t.seed_bits,
        index, codes, lengths,
    )


def tp_streaming_search(index: MatrixIndex, codes, lengths, mesh: Mesh):
    """Streaming search with row-sharded index + data-sharded reads.

    The patch pass's trip count is synchronized over the data axis
    (sync_axes) because its body contains the model-axis psum gathers:
    every device must execute the same number of collectives.
    """
    sharded = shard_index_rows(index, mesh)

    def body(rank_local, sgs_local, C, precalc, codes_local, lengths_local):
        view = _tp_view(index, rank_local, sgs_local, C, precalc)
        return engines.streaming_search(
            view, codes_local, lengths_local, sync_axes=("data",)
        )

    fn = jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(
                P("model", None),
                P("model", None),
                P(),
                P(),
                P("data", None),
                P("data"),
            ),
            out_specs=P("data", None),
        )
    )
    codes = jax.device_put(codes, NamedSharding(mesh, P("data", None)))
    lengths = jax.device_put(lengths, NamedSharding(mesh, P("data")))
    return fn(sharded.rank_tbl, sharded.sgs_tbl, sharded.C, sharded.precalc, codes, lengths)
