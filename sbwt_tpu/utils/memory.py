"""Device memory headroom probes for capacity-aware engine selection.

The turbo successor tables (ops/turbo.py) cost 128 B (arity 2) or 1 KiB
(arity 3) of HBM per column; auto mode must degrade 3 -> 2 -> LF based on
*measured* free memory instead of OOM-killing the CLI (the reference
never OOMs here because it has no such table — graceful degradation is
the parity-preserving behavior)."""
from __future__ import annotations

import os

import jax

# build workspace + run-time arrays need room too; never plan to fill
# more than this fraction of free memory with the turbo table
HEADROOM_FRACTION = 0.5


def device_free_bytes(device=None) -> int | None:
    """Free memory of a device, or None when it cannot be measured.

    TPU/GPU backends report allocator stats via memory_stats(); the CPU
    backend allocates from host RAM, measured via sysconf."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        stats = None
    if stats and "bytes_limit" in stats:
        return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    if d.platform == "cpu":
        try:
            return os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        except (ValueError, OSError):
            return None
    return None


def turbo_table_bytes(
    n_nodes: int, arity: int, precalc_k: int = 0, wide: bool = False
) -> int:
    """HBM cost of the turbo engine's device tables (ops/turbo.py):
    the successor table (arity 1 = int32 [n, 4] rows, 16 B/col;
    arity 2/3 = int32 [n * 4^arity, width] with width 2 or 4) plus the
    seed-liveness pair bitmap (2 bits per (p+1)-mer, built whenever
    0 < precalc_k <= 14 — 67 MB at p=13).  A wide (int64) index only has
    the arity-1 pair-row tier: [n, 8] int32 (lo, hi) rows = 32 B/col
    (ops/turbo.py WideTurboIndex) regardless of the requested arity."""
    if wide:
        tbl = n_nodes * 32
    elif arity == 1:
        tbl = n_nodes * 16
    else:
        width = 2 if arity == 2 else 4
        tbl = n_nodes * (4**arity) * width * 4
    if 0 < precalc_k <= 14:
        tbl += 4 ** (precalc_k + 1) // 4
    return tbl


def select_turbo_arity(
    n_nodes: int, free_bytes: int | None = None, precalc_k: int = 0,
    wide: bool = False,
) -> int | None:
    """Largest affordable turbo arity (3, 2, 1) or None for the LF engine.

    free_bytes defaults to the measured free memory of the default device;
    the table may take at most HEADROOM_FRACTION of it.  The arity-1 row
    tier costs only 16 B/column and still sustains >=100M answers/s, so
    the LF fallback is reached only past ~1G columns on a 16 GB chip."""
    if free_bytes is None:
        free_bytes = device_free_bytes()
    if wide:
        # the wide engine's only tier is the arity-1 [n, 8] pair-row
        # table (32 B/col); account for IT, not the narrow 16 B rows
        if free_bytes is None:
            return 1 if n_nodes <= 200_000_000 else None
        budget = int(free_bytes * HEADROOM_FRACTION)
        return 1 if turbo_table_bytes(n_nodes, 1, precalc_k, wide=True) <= budget else None
    if free_bytes is None:
        # unmeasurable: conservative legacy thresholds (2 GB pair table)
        if n_nodes <= 6_000_000:
            return 3
        if n_nodes <= 16_000_000:
            return 2
        return 1 if n_nodes <= 400_000_000 else None
    budget = int(free_bytes * HEADROOM_FRACTION)
    for arity in (3, 2, 1):
        if arity >= 2 and n_nodes * (4**arity) >= 2**31:
            continue  # flat row index would overflow int32 (ops/turbo.py)
        if turbo_table_bytes(n_nodes, arity, precalc_k) <= budget:
            return arity
    return None
