"""Serialization tests: roundtrips in both formats + cpp-format framing.

Mirrors the reference's test_serialization (tests/test_small.hh:324-429):
build, serialize, reload, then exhaustively re-query and streaming-query.
Also checks the sdsl bit_vector framing primitives directly.
"""
import io
import itertools

import numpy as np
import pytest

from sbwt_tpu.io import serialize as ser
from sbwt_tpu.models.sbwt import SBWT, VARIANT_NAMES
from sbwt_tpu.utils.dna import encode_query
from oracle import get_kmers

STRINGS = ["CCCGTGATGGCTA", "TAATGCTGTAGC", "TGGCTCGTGTAGTCGA", "NNAAAAAAAAAAAA"]
K = 4


def test_sdsl_bit_vector_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 63, 64, 65, 1000, 4096]:
        bits = rng.random(n) < 0.3
        buf = io.BytesIO()
        ser.write_sdsl_bit_vector(buf, bits)
        buf.seek(0)
        back = ser.read_sdsl_bit_vector(buf)
        assert np.array_equal(bits, back)
        assert buf.read() == b""


def test_string_and_vector_framing():
    buf = io.BytesIO()
    ser.write_string(buf, "plain-matrix")
    ser.write_int64_vector(buf, np.array([1, 5, -7], dtype=np.int64))
    buf.seek(0)
    assert ser.read_string(buf) == "plain-matrix"
    assert ser.read_int64_vector(buf).tolist() == [1, 5, -7]
    # exact byte layout: 8-byte LE length + ascii (globals.cpp:49-54)
    raw = buf.getvalue()
    assert raw[:8] == (12).to_bytes(8, "little")
    assert raw[8:20] == b"plain-matrix"
    assert raw[20:28] == (24).to_bytes(8, "little")


@pytest.mark.parametrize("fmt", ["cpp", "native"])
def test_index_roundtrip(tmp_path, fmt):
    sbwt = SBWT.build(STRINGS, K, precalc_k=2)
    path = str(tmp_path / f"index_{fmt}.sbwt")
    ser.save(path, sbwt, fmt)
    back = ser.load(path)

    assert back.k == K
    assert back.number_of_kmers() == sbwt.number_of_kmers()
    assert back.number_of_subsets() == sbwt.number_of_subsets()
    assert back.get_precalc_k() == 2
    assert np.array_equal(back.bits, sbwt.bits)
    assert np.array_equal(back.suffix_group_starts, sbwt.suffix_group_starts)
    assert np.array_equal(
        np.asarray(back.device_index.precalc), np.asarray(sbwt.device_index.precalc)
    )

    true_kmers = {s for s in get_kmers(STRINGS, K)}
    all_kmers = ["".join(t) for t in itertools.product("ACGT", repeat=K)]
    codes = np.stack([encode_query(s) for s in all_kmers])
    assert np.array_equal(back.search_batch(codes), sbwt.search_batch(codes))
    for s in STRINGS:
        assert back.streaming_search(s) == sbwt.streaming_search(s)


def test_no_streaming_support_roundtrip(tmp_path):
    sbwt = SBWT.build(STRINGS, K, streaming_support=False)
    assert not sbwt.has_streaming_query_support()
    for fmt in ["cpp", "native"]:
        path = str(tmp_path / f"ns_{fmt}.sbwt")
        ser.save(path, sbwt, fmt)
        back = ser.load(path)
        assert not back.has_streaming_query_support()
        assert back.search(STRINGS[0][:K]) == sbwt.search(STRINGS[0][:K])


def test_variant_tags_roundtrip_native(tmp_path):
    for variant in VARIANT_NAMES:
        sbwt = SBWT.build(STRINGS[:2], K, variant=variant)
        path = str(tmp_path / f"{variant}.tsbwt")
        ser.save(path, sbwt, "native")
        back = ser.load(path)
        assert back.variant == variant
        assert back.search(STRINGS[0][:K]) == sbwt.search(STRINGS[0][:K])


def test_cpp_format_rejects_bad_version(tmp_path):
    path = str(tmp_path / "bad.sbwt")
    with open(path, "wb") as f:
        ser.write_string(f, "plain-matrix")
        ser.write_string(f, "v9.9")
    with pytest.raises(ValueError):
        ser.load(path)
