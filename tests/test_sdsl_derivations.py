"""Hand-derived byte streams for the sdsl codecs (docs/SDSL_LAYOUT.md).

The golden fixtures in test_sdsl_fixtures.py pin the WRITERS' OWN output,
which catches drift but not wrongness.  Here each expected stream is
re-built from first principles — struct.pack + math.comb + the documented
field rules, with the arithmetic spelled out — so the layout claims are
checkable by a human with the sdsl sources open, without running C++.

Width rules documented here and in docs/SDSL_LAYOUT.md:
  * int_vector<0> framing: u64 bit count, u8 width, LSB-first packed words
  * bit_vector framing:    u64 bit count, LSB-first 64-bit words (no width)
  * hi(x) = index of the highest set bit (sdsl::bits::hi)
"""
import io
import math
import struct

import numpy as np
import pytest

from sbwt_tpu.io import sdsl


def hi(x: int) -> int:
    return x.bit_length() - 1


def pack_lsb(bit_positions, n_bits: int) -> bytes:
    """n_bits packed LSB-first into ceil(n_bits/64) LE words."""
    n_words = (n_bits + 63) // 64
    val = 0
    for p in bit_positions:
        assert p < n_bits
        val |= 1 << p
    return val.to_bytes(n_words * 8, "little")


def bv(bit_positions, n_bits: int) -> bytes:
    """sdsl::bit_vector: u64 size + words."""
    return struct.pack("<Q", n_bits) + pack_lsb(bit_positions, n_bits)


def iv0(values, width: int) -> bytes:
    """sdsl::int_vector<0>: u64 bit count, u8 width, packed values."""
    out = struct.pack("<Q", len(values) * width) + struct.pack("<B", width)
    acc = 0
    shift = 0
    for v in values:
        assert width == 64 or v < (1 << width)
        acc |= int(v) << shift
        shift += width
    n_words = (shift + 63) // 64
    return out + acc.to_bytes(max(n_words, 0) * 8, "little")


def written(fn) -> bytes:
    buf = io.BytesIO()
    fn(buf)
    return buf.getvalue()


# BITS13: ones at positions 0, 2, 3, 7, 10, 12 (13 bits, popcount 6)
BITS13 = np.zeros(13, dtype=bool)
BITS13[[0, 2, 3, 7, 10, 12]] = True
# SPARSE200: ones at 3, 64, 130, 199 (200 bits)
SPARSE200 = np.zeros(200, dtype=bool)
SPARSE200[[3, 64, 130, 199]] = True


def test_rrr_bytes_derived():
    """rrr_vector<63, int_vector<>, 32> of BITS13, field by field."""
    # --- m_bt: per-63-bit-block popcounts, width 6 -----------------------
    # 13 bits -> one 63-bit block (no dummy: 63 does not divide 13),
    # popcount 6.
    bt = iv0([6], 6)

    # --- m_btnr: the block's combinatorial offset ------------------------
    # bin_to_nr walks bits LSB-first with nn positions remaining and k
    # ones remaining; a set bit at that state adds C(nn-1, k).  For ones
    # at 0,2,3,7,10,12 the walk visits them with (nn, k):
    #   p=0:  nn=63, k=6 -> C(62,6)
    #   p=2:  nn=61, k=5 -> C(60,5)
    #   p=3:  nn=60, k=4 -> C(59,4)
    #   p=7:  nn=56, k=3 -> C(55,3)
    #   p=10: nn=53, k=2 -> C(52,2)
    #   p=12: nn=51, k=1 -> C(50,1)
    nr = (
        math.comb(62, 6) + math.comb(60, 5) + math.comb(59, 4)
        + math.comb(55, 3) + math.comb(52, 2) + math.comb(50, 1)
    )
    # space_for_bt(6) = floor(log2 C(63,6)) + 1; C(63,6) = 67,945,521
    space = hi(math.comb(63, 6)) + 1
    assert math.comb(63, 6) == 67_945_521 and space == 27
    assert nr < (1 << space)
    # btnr is a bit_vector of at least 64 bits
    btnr_bits = max(space, 64)
    btnr = struct.pack("<Q", btnr_bits) + nr.to_bytes(8, "little")

    # --- m_btnrp: btnr bit offset per 32-block superblock ----------------
    # one superblock starting at offset 0; width = hi(total offset bits)+1
    btnrp = iv0([0], hi(space) + 1)
    # --- m_rank: rank sample per superblock + total ----------------------
    # first superblock rank 0, plus the final total-ones entry (6);
    # 13 bits < one full superblock span (32*63), so ONE extra sample slot
    # holds the total.  width = hi(total ones)+1 = hi(6)+1 = 3
    rank = iv0([0, 6], hi(6) + 1)
    # --- m_invert: one bit per allocated superblock; the (partial)
    # superblock is never inverted (only full 32-block superblocks can be)
    invert = bv([], 1)

    expect = struct.pack("<Q", 13) + bt + btnr + btnrp + rank + invert
    assert written(lambda f: sdsl.write_rrr(f, BITS13)) == expect


def test_sd_bytes_derived():
    """sd_vector<> of SPARSE200 (ones at 3, 64, 130, 199), field by field."""
    n, m = 200, 4
    # wl = logn - logm, logx = hi(x)+1: logn = hi(200)+1 = 8, logm = 3
    wl = (hi(n) + 1) - (hi(m) + 1)
    assert wl == 5
    head = struct.pack("<Q", n) + struct.pack("<B", wl)
    # m_low: low 5 bits of each 1-position
    low = iv0([3 & 31, 64 & 31, 130 & 31, 199 & 31], wl)
    assert [3 & 31, 64 & 31, 130 & 31, 199 & 31] == [3, 0, 2, 7]
    # m_high: j-th one at (pos_j >> wl) + j; size m + 2^logm = 4 + 8 = 12
    high_pos = [(3 >> 5) + 0, (64 >> 5) + 1, (130 >> 5) + 2, (199 >> 5) + 3]
    assert high_pos == [0, 3, 6, 9]
    high = bv(high_pos, m + (1 << (hi(m) + 1)))

    # select_support_mcl<1> over m_high: 4 ones, all in one superblock.
    # logn' = hi(capacity)+1 = hi(64)+1 = 7 (capacity = words*64, not size)
    mcl1 = (
        struct.pack("<Q", 4)            # arg_cnt
        + iv0([0], 7)                   # superblock: position of match 0
        + bv([], 0)                     # mini_or_long: empty (no long)
        + iv0([0] * 64, 1)              # miniblock: every-64th offsets; all
                                        # 0 here -> bit_compress width 1
    )
    # select_support_mcl<0> over m_high: 8 zeros at 1,2,4,5,7,8,10,11
    mcl0 = (
        struct.pack("<Q", 8)
        + iv0([1], 7)                   # position of zero #0
        + bv([], 0)
        + iv0([0] * 64, 1)
    )
    expect = head + low + high + mcl1 + mcl0
    assert written(lambda f: sdsl.write_sd(f, SPARSE200)) == expect


def test_select_mcl_bytes_derived():
    """select_support_mcl<1> of BITS13 (6 ones), field by field."""
    # ones at 0,2,3,7,10,12; capacity = 64 bits -> logn = 7
    expect = (
        struct.pack("<Q", 6)
        + iv0([0], 7)       # superblock anchor: position of match 0
        + bv([], 0)         # no long superblocks
        + iv0([0] * 64, 1)  # miniblock offsets (only match 0 exists)
    )
    assert written(lambda f: sdsl.write_select_mcl(f, BITS13, 1)) == expect


def test_mef_bytes_derived():
    """mod_ef_vector<> of SPARSE200, replaying optimize_w by hand.

    optimize_w (MEF.hpp:284-315) pair-ORs the vector (shrink) until the
    size estimate stops improving; shrink (MEF.hpp:341-354) only rewrites
    words with bit index < size-64 and then halves the size, so trailing
    bits survive unshrunk — the quirk that decides wl here:
      wl=1: shrink 200 -> 100 bits, ones {1, 32, 65} (bit 199 dropped:
            its word starts at 192 > 200-64).  est 100 + 3*2 = 106 < 200.
      wl=2: shrink 100 -> 50 bits: the loop rewrites only word 0 (64 > 36
            stops it), so ones become {0, 16} from the pair-OR plus the
            ORIGINAL bit 32 surviving in the untouched upper half: {0,16,32}.
            est 50 + 3*4 = 62 < 106.
      wl=3: size 50 < 64 -> loop exits; wl stays 2.
    """
    wl = 2
    bucket = 1 << wl
    head = struct.pack("<Q", 200) + struct.pack("<B", wl)
    # m_upper: one bit per bucket over the ORIGINAL bits; 200/4 = 50
    # buckets + the always-set final bucket = 51 bits.  Ones land in
    # buckets 3//4=0, 64//4=16, 130//4=32, 199//4=49, plus final 50.
    upper_pos = [0, 16, 32, 49, 50]
    upper = bv(upper_pos, 51)
    # m_lower: the 4 kept buckets in order + one trailing bucket for the
    # (empty) size-200%4 tail = (4+1)*4 = 20 bits; bit offsets within
    # kept buckets: 3%4=3, 64%4=0, 130%4=2, 199%4=3
    lower_pos = [0 * 4 + 3, 1 * 4 + 0, 2 * 4 + 2, 3 * 4 + 3]
    assert lower_pos == [3, 4, 10, 15]
    lower = bv(lower_pos, 20)
    # rank_support_v payloads over upper and lower: one superblock each
    # (<= 512 bits): u64 absolute rank 0, then 9-bit word-count fields at
    # shifts 63-9m.  upper word 0 popcount = 5 -> m=1 field only... the
    # payloads are int_vector<64> of 2 words per superblock.
    def rank_v_words(word_popcounts):
        # single-superblock payload: abs = 0; rel packs the cumulative
        # count at each word boundary m (1..7) at shift 63-9m, but ONLY
        # for boundaries within the vector's word capacity
        cap_words = len(word_popcounts)
        rel = 0
        cum = 0
        for mfield in range(1, 8):
            if mfield > cap_words:
                break
            cum += word_popcounts[mfield - 1]
            rel |= cum << (63 - 9 * mfield)
        return [0, rel]

    upper_rv = rank_v_words([5])   # 51 bits -> 1 word, popcount 5
    lower_rv = rank_v_words([4])   # 20 bits -> 1 word, popcount 4
    iv64 = lambda words: struct.pack("<Q", len(words) * 64) + b"".join(
        int(w).to_bytes(8, "little") for w in words
    )
    expect = head + upper + lower + iv64(upper_rv) + iv64(lower_rv)
    assert written(lambda f: sdsl.write_mef(f, SPARSE200)) == expect
    # rank_support_mod_ef: a single u64 mask = 2^wl - 1 (MEF.hpp:424-431)
    assert written(lambda f: sdsl.write_mef_rank_support(f, wl)) == struct.pack("<Q", 3)


def test_select_mcl_long_superblock_replica():
    """A genuinely LONG superblock (span >= logn^4) over a real pattern:
    4096+ ones spread over ~300k bits, capacity logn = 19, logn^4 =
    130321 < span.  The long path stores every absolute position; the
    replica must answer select() for all matches, and the writer's
    long/mini decision must match the documented rule."""
    rng = np.random.default_rng(9)
    n = 300_000
    bools = np.zeros(n, dtype=bool)
    ones = np.sort(rng.choice(n, size=5000, replace=False))
    bools[ones] = True
    cap = ((n + 63) // 64) * 64
    logn = hi(cap) + 1
    span0 = int(ones[4095]) - int(ones[0])
    assert span0 >= logn**4, "test pattern must make superblock 0 long"

    fl = sdsl.select_mcl_fields(bools, 1)
    assert fl["long_flags"][0], "superblock 0 must take the long path"
    # superblock 1 (904 remaining ones) spans nearly the whole range too
    buf = io.BytesIO()
    sdsl.write_select_mcl(buf, bools, 1)
    buf.seek(0)
    rd = sdsl.read_select_mcl(buf)
    for i in list(range(1, 40)) + [4095, 4096, 4097, 5000]:
        assert sdsl.select_mcl_replica(rd, bools, 1, i) == int(ones[i - 1]), i
