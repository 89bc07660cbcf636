"""All 10 index variants: query equality, serialization, compression.

Mirrors the reference's variant test strategy (tests/test_small.hh:324-429):
build every variant from the same input, serialize, reload, then
exhaustively re-query all 4^k k-mers and streaming-query random reads,
expecting identical answers from every variant.
"""
import itertools
import os

import numpy as np
import pytest

from sbwt_tpu.models.sbwt import SBWT, VARIANT_NAMES
from sbwt_tpu.io.serialize import save, load
from sbwt_tpu.utils.dna import encode_query

K = 4
SEQS = [
    "TAGCAAGCACAGCATACAGG",
    "CCCTTTGGGAAACACAGT",
    "ACGTACGTACGTACGT",
]


@pytest.fixture(scope="module")
def plain():
    return SBWT.build(SEQS, K, precalc_k=2)


@pytest.fixture(scope="module")
def all_kmer_codes():
    codes = np.array(
        list(itertools.product(range(4), repeat=K)), dtype=np.int8
    )
    return codes


@pytest.fixture(scope="module")
def expected_answers(plain, all_kmer_codes):
    return plain.search_batch(all_kmer_codes)


@pytest.fixture(scope="module")
def reads():
    rng = np.random.default_rng(99)
    # half substrings of the input, half random (absent-heavy)
    reads = []
    for i in range(8):
        s = SEQS[i % len(SEQS)]
        reads.append(s[i % 3 : i % 3 + 12])
    for _ in range(8):
        reads.append("".join(rng.choice(list("ACGT"), size=12)))
    return reads


@pytest.mark.parametrize("variant", VARIANT_NAMES)
def test_variant_query_equality(variant, plain, all_kmer_codes, expected_answers):
    v = plain.to_variant(variant)
    got = v.search_batch(all_kmer_codes)
    np.testing.assert_array_equal(got, expected_answers)


@pytest.mark.parametrize("variant", VARIANT_NAMES)
def test_variant_streaming_equality(variant, plain, reads):
    v = plain.to_variant(variant)
    for r in reads:
        assert v.streaming_search(r) == plain.streaming_search(r), r


@pytest.mark.parametrize("variant", VARIANT_NAMES)
def test_variant_serialize_roundtrip(variant, plain, all_kmer_codes, expected_answers, tmp_path):
    v = plain.to_variant(variant)
    path = str(tmp_path / f"{variant}.sbwt")
    save(path, v, "native")
    loaded = load(path)
    assert loaded.variant == variant
    assert loaded.k == plain.k
    assert loaded.number_of_kmers() == plain.number_of_kmers()
    assert loaded.number_of_subsets() == plain.number_of_subsets()
    assert loaded.get_precalc_k() == plain.get_precalc_k()
    got = loaded.search_batch(all_kmer_codes)
    np.testing.assert_array_equal(got, expected_answers)
    # streaming after reload
    read = SEQS[0]
    assert loaded.streaming_search(read) == plain.streaming_search(read)
    # host bits restored for tooling
    np.testing.assert_array_equal(loaded.bits, plain.bits)


@pytest.mark.parametrize("variant", VARIANT_NAMES)
def test_variant_forward_and_partial(variant, plain):
    v = plain.to_variant(variant)
    # forward from every node with every char must agree with plain
    n = plain.number_of_subsets()
    for c in "ACGT":
        for node in range(0, n, max(1, n // 7)):
            assert v.forward(node, c) == plain.forward(node, c)
    (l, r), m = v.partial_search("GCAAGC")
    (l2, r2), m2 = plain.partial_search("GCAAGC")
    assert (l, r, m) == (l2, r2, m2)


def test_compressed_variants_smaller(tmp_path):
    """Compression parity: rrr/mef shrink each family both on disk (vs the
    same family's plain member) and in device memory (vs the plain-matrix
    fused rank table, which spends 2 bits per bit for 1-gather ranks)."""
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), size=2000)) for _ in range(3)]
    sb = SBWT.build(seqs, 14)
    disk = {}
    hbm = {}
    for variant in VARIANT_NAMES:
        path = str(tmp_path / f"{variant}.sbwt")
        v = sb.to_variant(variant)
        disk[variant] = save(path, v, "native")
        hbm[variant] = v.structure_size_in_bytes()
    # on disk, within each family the compressed member wins
    assert disk["rrr-split"] < disk["plain-split"]
    assert disk["rrr-subsetwt"] < disk["plain-subsetwt"]
    assert disk["mef-concat"] < disk["plain-concat"]
    # in device memory, every compressed structure beats the fused
    # plain-matrix rank table
    # (mef is designed for sparse vectors; on ~25%-dense rows its buckets
    # are rarely empty, so it is excluded here)
    for variant in ["rrr-matrix", "rrr-split", "rrr-subsetwt"]:
        assert hbm[variant] < hbm["plain-matrix"], (variant, hbm)


def test_build_variant_cli(tmp_path):
    from sbwt_tpu.cli import main as cli_main
    from sbwt_tpu.io import seqio

    fasta = str(tmp_path / "in.fna")
    with open(fasta, "w") as f:
        for i, s in enumerate(SEQS):
            f.write(f">s{i}\n{s}\n")
    plain_path = str(tmp_path / "plain.sbwt")
    assert cli_main(["build", "-i", fasta, "-o", plain_path, "-k", str(K)]) == 0
    for variant in ["rrr-matrix", "plain-concat", "mef-matrix"]:
        out = str(tmp_path / f"{variant}.sbwt")
        assert (
            cli_main(
                ["build-variant", "-i", plain_path, "-o", out, "--variant", variant]
            )
            == 0
        )
        loaded = load(out)
        assert loaded.variant == variant
        assert loaded.search("TAGC") == load(plain_path).search("TAGC")


def test_ascii_export_mef_refused(tmp_path):
    from sbwt_tpu.cli import main as cli_main

    sb = SBWT.build(SEQS, K).to_variant("mef-matrix")
    path = str(tmp_path / "mef.sbwt")
    save(path, sb, "native")
    out = str(tmp_path / "out.txt")
    assert cli_main(["ascii-export", "-i", path, "-o", out]) == 1
