"""Device-resident bit vectors with rank: plain, RRR-compressed, modified
Elias-Fano.

TPU-native equivalents of the reference's three bit-vector families
(variants.hh:19-63):

* `PlainBV`    — sdsl::bit_vector + rank_support_v5: interleaved
  (word, cum-popcount) rows; rank = 1 contiguous 8-byte gather
  (ops/bitvector.py layout).
* `RRRBV`      — sdsl::rrr_vector<>: blocks of 32 bits stored as
  (class = popcount, offset = combinatorial rank among C(32,class)
  patterns); rank decodes the block with a fixed 32-step vectorized
  unranking loop (combinatorial number system).  Slow-but-small tier,
  mirroring the reference where rrr ranks are also several times
  slower than plain.
* `MEFBV`      — sbwt::mod_ef_vector (MEF.hpp:85-131,376-389): buckets of
  2^wl bits; all-zero buckets dropped; `upper` marks non-empty buckets,
  `lower` concatenates kept buckets; rank = upper-rank + lower-rank =
  2 plain-rank gathers.  Bucket width chosen to minimize total bits
  (the reference reaches the same optimum by iterated pair-OR shrinking,
  MEF.hpp:284-354).

All three expose the same API:
  host:   build(bools) classmethod, to_bools(), payload()/from_payload(),
          size_in_bytes()
  device: rank(pos) batched, get(pos) batched (access; all three support
          it here — the reference's mod_ef does not, which only limits
          its ascii-export, handled at the CLI layer).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import bitvector as bvt

_ONE = np.uint32(1)


# ---------------------------------------------------------------------------
# Plain
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tbl"],
    meta_fields=["n_bits"],
)
@dataclass(frozen=True)
class PlainBV:
    tbl: jax.Array  # int32 [W, 2] (bits word, exclusive cum popcount)
    n_bits: int

    @classmethod
    def build(cls, bools: np.ndarray) -> "PlainBV":
        return cls(tbl=jnp.asarray(bvt.rank_table_host(bools)), n_bits=len(bools))

    def rank(self, pos):
        return bvt.rank(self.tbl, pos)

    def get(self, pos):
        return bvt.get_bit(self.tbl, pos)

    def to_bools(self) -> np.ndarray:
        return bvt.unpack_bits_host(np.asarray(self.tbl), self.n_bits)

    def payload(self) -> dict:
        return {"tbl": np.asarray(self.tbl), "n_bits": np.int64(self.n_bits)}

    @classmethod
    def from_payload(cls, p: dict) -> "PlainBV":
        return cls(tbl=jnp.asarray(p["tbl"]), n_bits=int(p["n_bits"]))

    def size_in_bytes(self) -> int:
        # bits + the cum-popcount rank support (both live in tbl)
        return int(np.asarray(self.tbl).nbytes)


# ---------------------------------------------------------------------------
# RRR (block-compressed)
# ---------------------------------------------------------------------------

_BLK = 63  # bits per block (like sdsl::rrr_vector<63>: minimizes class+ceil overhead)
_SBB = 16  # blocks per superblock (1008 bits)

# C(i, j) for i in 0..62, j in 0..63 (int64 on host for exact encode;
# C(62,31) = 4.6e17 fits in 63 bits)
_BINOM = np.zeros((_BLK, _BLK + 1), dtype=np.int64)
_BINOM[:, 0] = 1
for _i in range(1, _BLK):
    _BINOM[_i, 1:] = _BINOM[_i - 1, 1:] + _BINOM[_i - 1, :-1]

# full-width binomials C(63, c) for the width table
_BINOM63 = np.zeros(_BLK + 1, dtype=np.float64)
for _c in range(_BLK + 1):
    _v = 1.0
    for _j in range(_c):
        _v = _v * (_BLK - _j) / (_j + 1)
    _BINOM63[_c] = _v

# offset width per class: ceil(log2 C(63, cls))
_WIDTHS = np.array(
    [max(0, int(np.ceil(np.log2(max(1.0, _BINOM63[c]))))) for c in range(_BLK + 1)],
    dtype=np.int32,
)


def _rrr_encode_host(bools: np.ndarray):
    """Encode to (classes uint8 [B], offsets int64 [B]) per 63-bit block."""
    n = len(bools)
    B = max(1, (n + _BLK - 1) // _BLK)
    padded = np.zeros(B * _BLK, dtype=bool)
    padded[:n] = bools
    blocks = padded.reshape(B, _BLK)
    classes = blocks.sum(axis=1).astype(np.uint8)
    # combinatorial rank: bit j = column j, scanning high position down
    offsets = np.zeros(B, dtype=np.int64)
    ones_left = classes.astype(np.int64).copy()
    for i in range(_BLK - 1, -1, -1):
        b = blocks[:, i]
        offsets[b] += _BINOM[i, ones_left[b]]
        ones_left[b] -= 1
    return classes, offsets


def _rrr_decode_host(classes: np.ndarray, offsets: np.ndarray, n_bits: int):
    B = len(classes)
    blocks = np.zeros((B, _BLK), dtype=bool)
    off = offsets.astype(np.int64).copy()
    ones_left = classes.astype(np.int64).copy()
    for i in range(_BLK - 1, -1, -1):
        c = _BINOM[i, ones_left]
        take = (off >= c) & (ones_left > 0)
        blocks[take, i] = True
        off[take] -= c[take]
        ones_left[take] -= 1
    return blocks.ravel()[:n_bits]


def _split64(v: np.ndarray):
    v = v.astype(np.uint64)
    return (v >> np.uint64(32)).astype(np.uint32), (v & np.uint64(0xFFFFFFFF)).astype(
        np.uint32
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["meta", "offs", "binom_hi", "binom_lo", "widths"],
    meta_fields=["n_bits"],
)
@dataclass(frozen=True)
class RRRBV:
    """RRR over 63-bit blocks: per-superblock metadata row [6 int32] =
    (cum rank, offset bit ptr, 3 words of 16x6-bit packed classes, pad),
    plus the packed variable-width offset bit stream.  Offsets are up to
    60 bits, handled on device as emulated (hi, lo) uint32 pairs."""

    meta: jax.Array  # int32 [n_sb, 6]
    offs: jax.Array  # int32 [n_off_words] packed offset stream
    binom_hi: jax.Array  # int32 [63, 64] high halves of C(i, j)
    binom_lo: jax.Array  # int32 [63, 64] low halves
    widths: jax.Array  # int32 [64]
    n_bits: int

    @classmethod
    def build(cls, bools: np.ndarray) -> "RRRBV":
        bools = np.asarray(bools, dtype=bool)
        n = len(bools)
        classes, offsets = _rrr_encode_host(bools)
        B = len(classes)
        n_sb = (B + _SBB - 1) // _SBB + 1  # +1 pad row so pos == n_bits works
        cls_pad = np.zeros(n_sb * _SBB, dtype=np.int64)
        cls_pad[:B] = classes
        widths = _WIDTHS[cls_pad]
        bit_pos = np.concatenate([[0], np.cumsum(widths.astype(np.int64))])
        total_bits = int(bit_pos[-1])

        # pack offsets (<= 60 bits) into a uint32 stream; each value touches
        # at most 3 words
        n_words = total_bits // 32 + 3
        stream = np.zeros(n_words, dtype=np.uint64)
        starts = bit_pos[: n_sb * _SBB]
        offs64 = np.zeros(n_sb * _SBB, dtype=np.uint64)
        offs64[:B] = offsets.astype(np.uint64)
        w = starts // 32
        sh = (starts % 32).astype(np.uint64)
        lo = (offs64 << sh) & np.uint64(0xFFFFFFFF)
        mid = (offs64 >> (np.uint64(32) - sh)) & np.uint64(0xFFFFFFFF)
        mid[sh == 0] = (offs64 >> np.uint64(32))[sh == 0]
        hi = np.where(
            sh > 0, offs64 >> (np.uint64(64) - sh), np.uint64(0)
        )
        np.bitwise_or.at(stream, w, lo)
        np.bitwise_or.at(stream, w + 1, mid)
        np.bitwise_or.at(stream, w + 2, hi)
        offs_words = stream.astype(np.uint32).view(np.int32)

        # superblock meta
        cum = np.concatenate([[0], np.cumsum(cls_pad)]).astype(np.int64)
        meta = np.zeros((n_sb, 6), dtype=np.int32)
        for s in range(n_sb):
            meta[s, 0] = cum[s * _SBB]
            meta[s, 1] = bit_pos[s * _SBB]
        cls_mat = cls_pad.reshape(n_sb, _SBB)
        # pack 16 classes x 6 bits into 3 int32 words
        packed = np.zeros((n_sb, 3), dtype=np.uint64)
        for j in range(_SBB):
            word = (j * 6) // 32
            shift = (j * 6) % 32
            packed[:, word] |= cls_mat[:, j].astype(np.uint64) << np.uint64(shift)
            if shift > 26:
                packed[:, min(word + 1, 2)] |= cls_mat[:, j].astype(
                    np.uint64
                ) >> np.uint64(32 - shift)
        meta[:, 2:5] = (packed & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        if cum[-1] >= 2**31 or total_bits >= 2**31:
            raise ValueError("RRR vector too large for int32 device rank")
        bh, bl = _split64(_BINOM.astype(np.uint64))
        return cls(
            meta=jnp.asarray(meta),
            offs=jnp.asarray(offs_words),
            binom_hi=jnp.asarray(bh.view(np.int32)),
            binom_lo=jnp.asarray(bl.view(np.int32)),
            widths=jnp.asarray(_WIDTHS),
            n_bits=n,
        )

    # ---- device ----

    def _block_info(self, pos):
        """For positions pos: (class, offset bit pos) of the containing block
        and the rank before that block."""
        blk = pos // _BLK
        sb = blk >> 4
        j = blk & 15  # block index within superblock
        row = self.meta[sb]  # [..., 6] gather
        cum0 = row[..., 0]
        optr = row[..., 1]
        # unpack the 16 6-bit classes from words 2..4
        cls_words = row[..., 2:5].astype(jnp.uint32)  # [..., 3]
        jj = jnp.arange(_SBB, dtype=jnp.int32)  # [16]
        wordi = (jj * 6) // 32
        shift = ((jj * 6) % 32).astype(jnp.uint32)
        lo = jnp.take_along_axis(
            cls_words, jnp.broadcast_to(wordi, pos.shape + (_SBB,)), axis=-1
        )
        hi_i = jnp.minimum(wordi + 1, 2)
        hi = jnp.take_along_axis(
            cls_words, jnp.broadcast_to(hi_i, pos.shape + (_SBB,)), axis=-1
        )
        hi_sh = jnp.where(shift > 0, np.uint32(32) - shift, np.uint32(31))
        hi_part = jnp.where(shift > 26, hi << hi_sh, 0)
        six = (((lo >> shift) | hi_part) & np.uint32(63)).astype(jnp.int32)
        mask = jnp.arange(_SBB, dtype=jnp.int32) < j[..., None]
        cls_sum = jnp.sum(jnp.where(mask, six, 0), axis=-1)
        my_cls = jnp.take_along_axis(six, j[..., None], axis=-1)[..., 0]
        w_sum = jnp.sum(jnp.where(mask, self.widths[six], 0), axis=-1)
        bitp = optr + w_sum
        return my_cls, bitp, cum0 + cls_sum

    def _read_offset(self, bitp, cls):
        """Extract the (<= 60 bit) offset as an emulated (hi, lo) uint32 pair."""
        wi = bitp >> 5
        sh = (bitp & 31).astype(jnp.uint32)
        w0 = self.offs[wi].astype(jnp.uint32)
        w1 = self.offs[wi + 1].astype(jnp.uint32)
        w2 = self.offs[wi + 2].astype(jnp.uint32)
        inv = np.uint32(32) - sh
        lo = (w0 >> sh) | jnp.where(sh > 0, w1 << inv, np.uint32(0))
        hi = jnp.where(sh > 0, (w1 >> sh) | (w2 << inv), w1)
        width = self.widths[cls].astype(jnp.uint32)
        wlo = jnp.minimum(width, np.uint32(32))
        whi = width - wlo
        mask_lo = jnp.where(wlo >= 32, np.uint32(0xFFFFFFFF), (_ONE << wlo) - _ONE)
        mask_hi = (_ONE << whi) - _ONE
        return hi & mask_hi, lo & mask_lo

    def _decode_prefix_pop(self, cls, off_hi, off_lo, upto):
        """popcount of block bits at positions < upto (combinatorial unrank
        with emulated 64-bit compares/subtracts)."""

        def step(i, carry):
            oh, ol, ones, acc = carry
            ipos = _BLK - 1 - i
            ch = self.binom_hi[ipos, jnp.clip(ones, 0, _BLK)].astype(jnp.uint32)
            cl = self.binom_lo[ipos, jnp.clip(ones, 0, _BLK)].astype(jnp.uint32)
            ge = (oh > ch) | ((oh == ch) & (ol >= cl))
            is_one = ge & (ones > 0)
            borrow = (ol < cl).astype(jnp.uint32)
            nl = ol - cl
            nh = oh - ch - borrow
            oh = jnp.where(is_one, nh, oh)
            ol = jnp.where(is_one, nl, ol)
            ones = jnp.where(is_one, ones - 1, ones)
            acc = acc + jnp.where(is_one & (ipos < upto), 1, 0)
            return oh, ol, ones, acc

        _, _, _, acc = lax.fori_loop(
            0, _BLK, step, (off_hi, off_lo, cls, jnp.zeros_like(cls))
        )
        return acc

    def rank(self, pos):
        pos = jnp.asarray(pos, dtype=jnp.int32)
        cls, bitp, before = self._block_info(pos)
        o = pos - (pos // _BLK) * _BLK
        oh, ol = self._read_offset(bitp, cls)
        inblock = self._decode_prefix_pop(cls, oh, ol, o)
        return before + jnp.where(o > 0, inblock, 0)

    def get(self, pos):
        pos = jnp.asarray(pos, dtype=jnp.int32)
        return self.rank(pos + 1) - self.rank(pos)

    # ---- host ----

    def to_bools(self) -> np.ndarray:
        meta = np.asarray(self.meta)
        n_sb = meta.shape[0]
        cls_words = (
            np.ascontiguousarray(meta[:, 2:5]).view(np.uint32).reshape(n_sb, 3).astype(np.uint64)
        )
        classes = np.zeros((n_sb, _SBB), dtype=np.int64)
        for j in range(_SBB):
            word = (j * 6) // 32
            shift = (j * 6) % 32
            v = cls_words[:, word] >> np.uint64(shift)
            if shift > 26:
                v |= cls_words[:, min(word + 1, 2)] << np.uint64(32 - shift)
            classes[:, j] = v & 63
        classes = classes.ravel()
        widths = _WIDTHS[classes].astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(widths)])[:-1]
        stream = np.asarray(self.offs).view(np.uint32).astype(np.uint64)
        stream = np.concatenate([stream, np.zeros(3, dtype=np.uint64)])
        wi = starts // 32
        sh = (starts % 32).astype(np.uint64)
        w0 = stream[wi]
        w1 = stream[wi + 1]
        w2 = stream[wi + 2]
        inv = np.uint64(32) - sh
        lo = (w0 >> sh) | np.where(sh > 0, w1 << inv, np.uint64(0))
        lo &= np.uint64(0xFFFFFFFF)
        hi = np.where(sh > 0, (w1 >> sh) | ((w2 << inv) & np.uint64(0xFFFFFFFF)), w1)
        hi &= np.uint64(0xFFFFFFFF)
        raw = lo | (hi << np.uint64(32))
        masks = np.where(
            widths >= 64,
            np.uint64(0xFFFFFFFFFFFFFFFF),
            (np.uint64(1) << widths.astype(np.uint64)) - np.uint64(1),
        )
        offsets = (raw & masks).astype(np.int64)
        n_blocks = max(1, (self.n_bits + _BLK - 1) // _BLK)
        return _rrr_decode_host(
            classes[:n_blocks].astype(np.uint8), offsets[:n_blocks], self.n_bits
        )

    def payload(self) -> dict:
        return {
            "meta": np.asarray(self.meta),
            "offs": np.asarray(self.offs),
            "n_bits": np.int64(self.n_bits),
        }

    @classmethod
    def from_payload(cls, p: dict) -> "RRRBV":
        bh, bl = _split64(_BINOM.astype(np.uint64))
        return cls(
            meta=jnp.asarray(p["meta"]),
            offs=jnp.asarray(p["offs"]),
            binom_hi=jnp.asarray(bh.view(np.int32)),
            binom_lo=jnp.asarray(bl.view(np.int32)),
            widths=jnp.asarray(_WIDTHS),
            n_bits=int(p["n_bits"]),
        )

    def size_in_bytes(self) -> int:
        return int(np.asarray(self.meta).nbytes + np.asarray(self.offs).nbytes)


# ---------------------------------------------------------------------------
# Modified Elias-Fano
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["upper", "lower"],
    meta_fields=["n_bits", "wl"],
)
@dataclass(frozen=True)
class MEFBV:
    """mod_ef_vector: non-empty 2^wl-bit buckets kept in `lower`,
    `upper` marks which buckets were kept (MEF.hpp:85-131).

    rank(pos) (MEF.hpp:376-389): with b = pos >> wl and
    u = rank1(upper, b), the answer is rank1(lower, (u << wl) + t) where
    t = pos & (2^wl - 1) if bucket b is non-empty else 0 — two plain
    rank gathers."""

    upper: PlainBV
    lower: PlainBV
    n_bits: int
    wl: int

    @classmethod
    def build(cls, bools: np.ndarray, wl: int | None = None) -> "MEFBV":
        bools = np.asarray(bools, dtype=bool)
        n = len(bools)
        if wl is None:
            wl = _best_mef_width(bools)
        bs = 1 << wl
        n_buckets = max(1, (n + bs - 1) // bs)
        padded = np.zeros(n_buckets * bs, dtype=bool)
        padded[:n] = bools
        buckets = padded.reshape(n_buckets, bs)
        nonempty = buckets.any(axis=1)
        lower_bits = buckets[nonempty].ravel()
        return cls(
            upper=PlainBV.build(nonempty),
            lower=PlainBV.build(lower_bits),
            n_bits=n,
            wl=int(wl),
        )

    def rank(self, pos):
        pos = jnp.asarray(pos, dtype=jnp.int32)
        b = pos >> self.wl
        t = pos & ((1 << self.wl) - 1)
        u = self.upper.rank(b)
        keep = self.upper.get(b)
        lpos = (u << self.wl) + jnp.where(keep == 1, t, 0)
        return self.lower.rank(lpos)

    def get(self, pos):
        pos = jnp.asarray(pos, dtype=jnp.int32)
        b = pos >> self.wl
        t = pos & ((1 << self.wl) - 1)
        u = self.upper.rank(b)
        keep = self.upper.get(b)
        bit = self.lower.get((u << self.wl) + t)
        return jnp.where(keep == 1, bit, 0)

    def to_bools(self) -> np.ndarray:
        up = self.upper.to_bools()
        low = self.lower.to_bools()
        bs = 1 << self.wl
        n_buckets = len(up)
        out = np.zeros(n_buckets * bs, dtype=bool)
        kept = np.flatnonzero(up)
        low = low[: len(kept) * bs].reshape(len(kept), bs)
        out.reshape(n_buckets, bs)[kept] = low
        return out[: self.n_bits]

    def payload(self) -> dict:
        return {
            "upper_tbl": np.asarray(self.upper.tbl),
            "upper_n": np.int64(self.upper.n_bits),
            "lower_tbl": np.asarray(self.lower.tbl),
            "lower_n": np.int64(self.lower.n_bits),
            "n_bits": np.int64(self.n_bits),
            "wl": np.int64(self.wl),
        }

    @classmethod
    def from_payload(cls, p: dict) -> "MEFBV":
        return cls(
            upper=PlainBV(tbl=jnp.asarray(p["upper_tbl"]), n_bits=int(p["upper_n"])),
            lower=PlainBV(tbl=jnp.asarray(p["lower_tbl"]), n_bits=int(p["lower_n"])),
            n_bits=int(p["n_bits"]),
            wl=int(p["wl"]),
        )

    def size_in_bytes(self) -> int:
        return self.upper.size_in_bytes() + self.lower.size_in_bytes()


def _best_mef_width(bools: np.ndarray) -> int:
    """Bucket width minimizing total stored bits (upper + lower).

    The reference reaches the same optimum by iterated pair-OR shrink
    (MEF.hpp:284-354); direct evaluation gives the identical answer."""
    n = len(bools)
    if n == 0:
        return 3
    best_wl, best_cost = 3, None
    for wl in range(3, 17):
        bs = 1 << wl
        n_buckets = (n + bs - 1) // bs
        padded = np.zeros(n_buckets * bs, dtype=bool)
        padded[:n] = bools
        nonempty = int(padded.reshape(n_buckets, bs).any(axis=1).sum())
        cost = n_buckets + nonempty * bs
        if best_cost is None or cost < best_cost:
            best_wl, best_cost = wl, cost
        if bs >= n:
            break
    return best_wl


BV_CLASSES = {"plain": PlainBV, "rrr": RRRBV, "mef": MEFBV}
