"""Index serialization.

Two formats:

* **cpp** — byte-layout compatible with the reference `.sbwt` files
  (variant tag + SBWT v0.1 stream, src/CLI/sbwt_build.cpp:140-142 and
  include/sbwt/SBWT.hh:463-516): little-endian length-prefixed strings
  (globals.cpp:49-62), sdsl bit_vector framing (8-byte bit count +
  64-bit words), rank_support_v5 payloads (skipped and recomputed on
  load, which is what the sdsl structures allow — supports are rebindable,
  SubsetMatrixRank.hh:108-114), raw int64 metadata.  This lets the TPU
  framework load reference-built plain-matrix indexes directly.

* **native** — a numpy container holding the variant's own compressed
  structure payload (models/subsetrank.py), so rrr/mef/concat/split files
  are genuinely smaller on disk, like the reference's variants.
"""
from __future__ import annotations

import io
import json
import struct
import zlib

import numpy as np

SBWT_VERSION = "v0.1"  # serialized version tag, matches SBWT.hh:28

NATIVE_MAGIC = b"SBWT-TPU-NATIVE-v1\x00"


# ---------------------------------------------------------------------------
# Low-level cpp-format primitives
# ---------------------------------------------------------------------------

def write_string(f, s: str) -> int:
    data = s.encode("ascii")
    f.write(struct.pack("<q", len(data)))
    f.write(data)
    return 8 + len(data)


def read_string(f) -> str:
    (n,) = struct.unpack("<q", f.read(8))
    return f.read(n).decode("ascii")


def write_sdsl_bit_vector(f, bools: np.ndarray) -> int:
    """sdsl::bit_vector::serialize framing: u64 bit count + 64-bit words."""
    n = len(bools)
    n_words = (n + 63) // 64
    padded = np.zeros(n_words * 64, dtype=bool)
    padded[:n] = bools
    words = np.packbits(padded.reshape(n_words, 64), axis=1, bitorder="little")
    f.write(struct.pack("<Q", n))
    f.write(words.tobytes())
    return 8 + n_words * 8


def read_sdsl_bit_vector(f) -> np.ndarray:
    (n,) = struct.unpack("<Q", f.read(8))
    n_words = (n + 63) // 64
    raw = f.read(n_words * 8)
    bits = np.unpackbits(np.frombuffer(raw, dtype=np.uint8), bitorder="little")
    return bits[:n].astype(bool)


def skip_sdsl_int_vector(f) -> None:
    """Skip a serialized sdsl int_vector<64> (e.g. a rank_support_v5 payload)."""
    (n_bits,) = struct.unpack("<Q", f.read(8))
    f.seek(((n_bits + 63) // 64) * 8, io.SEEK_CUR)


def write_rank_support_v5(f, bools: np.ndarray) -> int:
    """Write a payload shaped like sdsl::rank_support_v5's basic-block vector.

    Layout (per 2048-bit superblock): word 0 = absolute rank before the
    superblock, word 1 = five 11-bit relative ranks at 384-bit offsets.
    NOTE: this writer exists so the byte stream is structurally complete;
    our own loader recomputes rank support from the bits and never reads
    this payload.  Cross-loading into the C++ implementation should be
    re-validated against a real sdsl build before relying on it.
    """
    n = len(bools)
    n_super = (n >> 11) + 1
    words = np.zeros(2 * n_super, dtype=np.uint64)
    padded = np.zeros(n_super * 2048, dtype=np.int64)
    padded[:n] = bools
    cums = np.concatenate([[0], np.cumsum(padded)])
    for s in range(n_super):
        base = s * 2048
        words[2 * s] = cums[base]
        rel = np.uint64(0)
        for j in range(5):
            cnt = np.uint64(int(cums[base + 384 * (j + 1)] - cums[base]))
            rel |= cnt << np.uint64(11 * j)
        words[2 * s + 1] = rel
    n_bits = len(words) * 64
    f.write(struct.pack("<Q", n_bits))
    f.write(words.tobytes())
    return 8 + len(words) * 8


def write_int64_vector(f, vals: np.ndarray) -> int:
    """serialize_std_vector framing (SBWT.hh:442-449): i64 byte count + data."""
    data = np.asarray(vals, dtype="<i8").tobytes()
    f.write(struct.pack("<q", len(data)))
    f.write(data)
    return 8 + len(data)


def read_int64_vector(f) -> np.ndarray:
    (n_bytes,) = struct.unpack("<q", f.read(8))
    return np.frombuffer(f.read(n_bytes), dtype="<i8").copy()


# ---------------------------------------------------------------------------
# cpp format: full index files
# ---------------------------------------------------------------------------

def save_cpp(path: str, sbwt) -> int:
    """Write a reference-compatible `.sbwt` file (plain-matrix layout).

    Non-plain-matrix variants currently serialize their logical content in
    plain-matrix layout under their own variant tag is NOT cpp-compatible,
    so we refuse; use the native format for those.
    """
    if sbwt.variant != "plain-matrix":
        raise NotImplementedError(
            f"cpp-format export for variant {sbwt.variant!r} is not available yet; "
            "use format='native'"
        )
    di = sbwt.device_index
    with open(path, "wb") as f:
        written = write_string(f, sbwt.variant)
        written += write_string(f, SBWT_VERSION)
        for c in range(4):
            written += write_sdsl_bit_vector(f, sbwt.bits[c])
        for c in range(4):
            written += write_rank_support_v5(f, sbwt.bits[c])
        written += write_sdsl_bit_vector(f, sbwt.suffix_group_starts)
        written += write_int64_vector(f, np.asarray(di.C, dtype=np.int64))
        precalc = np.asarray(di.precalc, dtype=np.int64)
        if di.precalc_k == 0:
            pairs = np.empty((0, 2), dtype=np.int64)
        else:
            pairs = precalc
        written += write_int64_vector(f, pairs.ravel())
        f.write(struct.pack("<q", di.precalc_k))
        f.write(struct.pack("<q", di.n_nodes))
        f.write(struct.pack("<q", di.n_kmers))
        f.write(struct.pack("<q", di.k))
        written += 32
    return written


def load_cpp_stream(f):
    """Load a reference-format index stream (after any leading variant tag)."""
    from ..models.sbwt import SBWT, VARIANT_NAMES

    variant = read_string(f)
    if variant not in VARIANT_NAMES:
        raise ValueError(f"unrecognized variant tag {variant!r}")
    if variant != "plain-matrix":
        raise NotImplementedError(
            f"loading cpp-format variant {variant!r} is not supported yet "
            "(only plain-matrix)"
        )
    version = read_string(f)
    if version != SBWT_VERSION:
        raise ValueError(
            "corrupt index file, or the index was constructed with an "
            "incompatible version of SBWT"
        )
    rows = []
    for _ in range(4):
        rows.append(read_sdsl_bit_vector(f))
    for _ in range(4):
        skip_sdsl_int_vector(f)  # rank_support_v5 payloads; recomputed
    sgs = read_sdsl_bit_vector(f)
    C = read_int64_vector(f)
    pairs = read_int64_vector(f)
    (precalc_k,) = struct.unpack("<q", f.read(8))
    (n_nodes,) = struct.unpack("<q", f.read(8))
    (n_kmers,) = struct.unpack("<q", f.read(8))
    (k,) = struct.unpack("<q", f.read(8))
    bits = np.stack(rows)
    assert bits.shape[1] == n_nodes
    precalc_table = None
    if precalc_k > 0:
        precalc_table = pairs.reshape(-1, 2).astype(np.int32)
    sbwt = SBWT(
        bits,
        sgs,
        k=int(k),
        n_kmers=int(n_kmers),
        precalc_k=int(precalc_k),
        variant=variant,
        precalc_table=precalc_table,
    )
    expect_C = np.asarray(sbwt.device_index.C, dtype=np.int64)
    if not np.array_equal(C, expect_C):
        raise ValueError("corrupt index: C array mismatch")
    return sbwt


# ---------------------------------------------------------------------------
# native format
# ---------------------------------------------------------------------------
#
# Layout: MAGIC, json header (meta + ordered payload keys), then one
# np.save per payload array.  For plain-matrix the payload is the packed
# bit matrix; for every other variant it is the variant's own compressed
# structure payload (models/subsetrank.py), so on-disk size reflects the
# variant's true compression — the property the reference's variant
# families exist for.


def _variant_payload(sbwt) -> dict:
    if sbwt.variant == "plain-matrix":
        return {"bits_packed": np.packbits(sbwt.bits, axis=1, bitorder="little")}
    return sbwt.device_index.struct.payload()


def save_native(path: str, sbwt) -> int:
    di = sbwt.device_index
    payload = _variant_payload(sbwt)
    payload["sgs_packed"] = np.packbits(sbwt.suffix_group_starts, bitorder="little")
    payload["precalc"] = np.asarray(di.precalc, dtype=np.int32)
    meta = {
        "variant": sbwt.variant,
        "k": di.k,
        "n_nodes": di.n_nodes,
        "n_kmers": di.n_kmers,
        "precalc_k": di.precalc_k,
        "has_streaming": di.has_streaming,
        "payload_keys": list(payload.keys()),
    }
    with open(path, "wb") as f:
        f.write(NATIVE_MAGIC)
        header = json.dumps(meta).encode()
        f.write(struct.pack("<q", len(header)))
        f.write(header)
        for key in payload:
            np.save(f, np.asarray(payload[key]))
        return f.tell()


def load_native(f):
    from ..models.sbwt import SBWT
    from ..models.subsetrank import struct_from_payload
    from ..models.variants import build_generic_index

    magic = f.read(len(NATIVE_MAGIC))
    if magic != NATIVE_MAGIC:
        raise ValueError("not a native SBWT-TPU index file")
    (hlen,) = struct.unpack("<q", f.read(8))
    meta = json.loads(f.read(hlen))
    payload = {}
    for key in meta["payload_keys"]:
        payload[key] = np.load(f)
    n = meta["n_nodes"]
    sgs = (
        np.unpackbits(payload["sgs_packed"], bitorder="little")[:n].astype(bool)
        if meta["has_streaming"]
        else None
    )
    precalc = payload["precalc"]
    precalc_table = precalc if meta["precalc_k"] > 0 else None

    if meta["variant"] == "plain-matrix":
        bits = np.unpackbits(payload["bits_packed"], axis=1, bitorder="little")[
            :, :n
        ].astype(bool)
        return SBWT(
            bits,
            sgs,
            k=meta["k"],
            n_kmers=meta["n_kmers"],
            precalc_k=meta["precalc_k"],
            variant=meta["variant"],
            precalc_table=precalc_table,
        )

    st = struct_from_payload(meta["variant"], payload)
    bits = st.to_bits()
    device_index = build_generic_index(
        meta["variant"],
        bits,
        sgs if sgs is not None else np.empty(0, dtype=bool),
        k=meta["k"],
        n_kmers=meta["n_kmers"],
        precalc_k=meta["precalc_k"],
        precalc_table=precalc_table,
        struct=st,
    )
    return SBWT.from_device_index(device_index, bits, sgs)


# ---------------------------------------------------------------------------
# auto-detect
# ---------------------------------------------------------------------------

def save(path: str, sbwt, fmt: str = "cpp") -> int:
    if fmt == "cpp":
        return save_cpp(path, sbwt)
    if fmt == "native":
        return save_native(path, sbwt)
    raise ValueError(f"unknown format {fmt!r}")


def load(path: str):
    with open(path, "rb") as f:
        head = f.read(len(NATIVE_MAGIC))
        f.seek(0)
        if head == NATIVE_MAGIC:
            return load_native(f)
        return load_cpp_stream(f)
