"""Golden byte fixtures for the sdsl codecs (docs/SDSL_LAYOUT.md).

Every writer's output for small documented inputs is pinned to exact
bytes, so any accidental layout drift is caught immediately — the
checkable stand-in for a live sdsl diff that this environment cannot run
(the reference's sdsl-lite submodule is not vendored).
"""
import hashlib
import io

import numpy as np

from sbwt_tpu.io import sdsl

BITS13 = np.array([1, 0, 1, 1, 0, 0, 0, 1, 0, 0, 1, 0, 1], dtype=bool)
SPARSE200 = np.zeros(200, dtype=bool)
SPARSE200[[3, 64, 130, 199]] = True


def _bytes(write_fn):
    buf = io.BytesIO()
    write_fn(buf)
    return buf.getvalue()


def test_bit_vector_bytes():
    # u64 size (13) + one data word 0x148d (bits 0,2,3,7,10,12)
    assert _bytes(lambda f: sdsl.write_bit_vector(f, BITS13)).hex() == (
        "0d000000000000008d14000000000000"
    )


def test_rank_v5_bytes():
    # one (abs, rel) pair + capacity pad pair; 13 bits < the first 384-bit
    # sub-block boundary, so every relative field is zero
    assert _bytes(lambda f: sdsl.write_rank_support_v5(f, BITS13)).hex() == (
        "800000000000000000000000000000000000000000000000"
    )


def test_rank_v_bytes():
    # superblock 512 bits: field m=1 (count of word 0 = 6) at shift 63-9
    # -> 6 << 54 = 0x0180000000000000
    assert _bytes(lambda f: sdsl.write_rank_support_v(f, BITS13)).hex() == (
        "800000000000000000000000000000000000000000008001"
    )


def test_rrr_bytes():
    # size 13; bt int_vector<0> width 6 (one block, popcount 6);
    # btnr >= 64 bits holding bin_to_nr(0x148d); btnrp/rank samples; no
    # inversion
    assert _bytes(lambda f: sdsl.write_rrr(f, BITS13)).hex() == (
        "0d0000000000000006000000000000000606000000000000004000000000"
        "00000090ba04040000000005000000000000000500000000000000000600"
        "000000000000033000000000000000010000000000000000000000000000"
        "00"
    )


def test_sd_bytes():
    assert _bytes(lambda f: sdsl.write_sd(f, SPARSE200)).hex() == (
        "c8000000000000000514000000000000000503880300000000000c000000"
        "000000004902000000000000040000000000000007000000000000000700"
        "000000000000000000000000000000400000000000000001000000000000"
        "000008000000000000000700000000000000070100000000000000000000"
        "00000000004000000000000000010000000000000000"
    )


def test_mef_bytes():
    assert _bytes(lambda f: sdsl.write_mef(f, SPARSE200)).hex() == (
        "c80000000000000002330000000000000001000100010006001400000000"
        "000000188400000000000080000000000000000000000000000000000000"
        "0000004001800000000000000000000000000000000000000000000001"
    )


def test_select_mcl_bytes():
    # arg count 6, superblock iv<0> (width 7: hi(64)+1), empty
    # mini_or_long, one 64-entry miniblock
    assert _bytes(lambda f: sdsl.write_select_mcl(f, BITS13, 1)).hex() == (
        "060000000000000007000000000000000700000000000000000000000000"
        "0000004000000000000000010000000000000000"
    )


def test_wt_blcd_digest():
    # the byte_tree's 256-entry c_to_leaf/path tables make this 4.5 KB;
    # pin a digest instead of inline hex
    data = _bytes(
        lambda f: sdsl.write_wt_blcd(
            f, np.frombuffer(b"ACGTT$A", dtype=np.uint8), compressed=False
        )
    )
    assert len(data) == 4528
    assert hashlib.sha256(data).hexdigest() == (
        "b40d4069f180f2ed9b378ae12f5e0fc3057db849c872c4882b5912bf44fe13e2"
    )


def test_rrr_word_aligned_offset_stream():
    # Regression: a trailing uniform (width-0) block whose offset lands
    # exactly on a 64-bit stream boundary used to index past the reader's
    # spill pad.  Two blocks of popcount 55 give space 32+32 = 64 bits,
    # and 126 = 2*63 adds the dummy trailing block at offset 64.
    bools = np.zeros(126, dtype=bool)
    bools[:55] = True
    bools[63 : 63 + 55] = True
    buf = io.BytesIO()
    sdsl.write_rrr(buf, bools)
    buf.seek(0)
    assert np.array_equal(sdsl.read_rrr(buf), bools)


def test_int_vector0_roundtrip_widths():
    # write/read_int_vector0 are vectorized (no per-value bigint walk);
    # cover narrow, unaligned, 63- and 64-bit widths.
    rng = np.random.default_rng(5)
    for width in (1, 6, 17, 63, 64):
        vals = rng.integers(0, 2 ** min(width, 63), size=257, dtype=np.uint64)
        buf = io.BytesIO()
        sdsl.write_int_vector0(buf, vals, width)
        buf.seek(0)
        got, w = sdsl.read_int_vector0(buf)
        assert w == width
        assert np.array_equal(got, vals)
