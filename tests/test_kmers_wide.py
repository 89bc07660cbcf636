"""Multi-word (k > 32) packed k-mer ops and construction, tested against
string oracles (mirrors the reference's exhaustive Kmer tests,
tests/test_kmer.hh:27-155, and the in-memory-constructor differential
strategy, tests/test_small.hh:65-99)."""
import numpy as np
import pytest

from sbwt_tpu.utils import kmers_wide as kw
from sbwt_tpu.utils.dna import encode

from oracle import OracleIndex, colex_sorted

ACGT = "ACGT"


def rand_str(rng, n):
    return "".join(rng.choice(list(ACGT), size=n))


def test_pack_unpack_roundtrip_all_lengths():
    rng = np.random.default_rng(0)
    for L in list(range(1, 70)) + [100, 200, 255]:
        s = rand_str(rng, L)
        row = kw.pack_kmer(encode(s))
        assert kw.to_string(row, L) == s


def test_colex_sort_matches_string_oracle():
    rng = np.random.default_rng(1)
    L = 50
    strs = [rand_str(rng, L) for _ in range(300)]
    rows = np.stack([kw.pack_kmer(encode(s)) for s in strs])
    order = kw.colex_argsort(rows)
    got = [strs[i] for i in order]
    assert got == colex_sorted(strs)


def test_colex_sort_with_lengths_matches_string_oracle():
    rng = np.random.default_rng(2)
    strs = [rand_str(rng, int(rng.integers(1, 70))) for _ in range(300)]
    W = kw.n_words(70)
    rows = np.stack([kw.pack_kmer(encode(s), W) for s in strs])
    lens = np.array([len(s) for s in strs])
    order = kw.colex_argsort(rows, lens)
    got = [strs[i] for i in order]
    want = colex_sorted(strs)
    assert got == want


def test_edit_ops_match_strings():
    rng = np.random.default_rng(3)
    k = 45
    strs = [rand_str(rng, k) for _ in range(64)]
    rows = np.stack([kw.pack_kmer(encode(s)) for s in strs])
    # drop_first
    df = kw.drop_first(rows, k)
    for i, s in enumerate(strs):
        assert kw.to_string(df[i], k - 1) == s[1:]
    # drop_last
    dl = kw.drop_last(rows)
    for i, s in enumerate(strs):
        assert kw.to_string(dl[i], k - 1) == s[:-1]
    # append_last
    al = kw.append_last(rows, np.full(len(strs), 2, dtype=np.uint8))
    for i, s in enumerate(strs):
        assert kw.to_string(al[i], k) == s[1:] + "G"
    # chars
    assert [ACGT[c] for c in kw.first_char(rows, k)] == [s[0] for s in strs]
    assert [ACGT[c] for c in kw.last_char(rows)] == [s[-1] for s in strs]
    for d in [0, 1, 31, 32, 33, 44]:
        got = kw.char_at_distance(rows, d)
        assert [ACGT[c] for c in got] == [s[k - 1 - d] for s in strs]


def test_prefix_of_length_matches_strings():
    rng = np.random.default_rng(4)
    k = 70
    strs = [rand_str(rng, k) for _ in range(32)]
    rows = np.stack([kw.pack_kmer(encode(s)) for s in strs])
    for m in [0, 1, 5, 31, 32, 33, 63, 64, 65, 69, 70]:
        pm = kw.prefix_of_length(rows, k, m)
        for i, s in enumerate(strs):
            assert kw.to_string(pm[i], m) == s[:m], (m, i)


def test_searchsorted_and_isin():
    rng = np.random.default_rng(5)
    k = 40
    strs = sorted({rand_str(rng, k) for _ in range(500)})
    rows = np.stack([kw.pack_kmer(encode(s)) for s in strs])
    order = kw.colex_argsort(rows)
    rows = rows[order]
    present = rows[rng.integers(0, len(rows), size=50)]
    absent = np.stack([kw.pack_kmer(encode(rand_str(rng, k))) for _ in range(50)])
    assert kw.isin_sorted(rows, present).all()
    sset = {kw.to_string(r, k) for r in rows}
    want = np.array([kw.to_string(r, k) in sset for r in absent])
    assert np.array_equal(kw.isin_sorted(rows, absent), want)


@pytest.mark.parametrize("k", [33, 40, 64, 65, 100])
def test_wide_construction_matches_oracle_bits(k):
    rng = np.random.default_rng(k * 7)
    seqs = [rand_str(rng, 260) for _ in range(3)] + [rand_str(rng, k)]
    from sbwt_tpu.construct.inmemory import build_sbwt
    from oracle import build_oracle

    built = build_sbwt(seqs, k)
    nodes, bits, sgs, n_kmers = build_oracle(seqs, k)
    assert built.n_kmers == n_kmers
    assert built.n_nodes == len(nodes)
    for ci, c in enumerate(ACGT):
        assert np.array_equal(built.bits[ci], np.array(bits[c])), c
    assert np.array_equal(built.suffix_group_starts, np.array(sgs))
    # node labels match too
    got = [kw.to_string(v, l) for v, l in zip(built.node_vals, built.node_lens)]
    assert got == nodes


def test_wide_queries_match_oracle():
    k = 40
    rng = np.random.default_rng(77)
    seqs = [rand_str(rng, 400) for _ in range(2)]
    from sbwt_tpu.models.sbwt import SBWT

    sbwt = SBWT.build(seqs, k, precalc_k=4)
    oracle = OracleIndex(seqs, k)
    # every indexed k-mer found at its colex rank
    for s in seqs:
        for i in range(0, len(s) - k + 1, 7):
            w = s[i : i + k]
            assert sbwt.search(w) == oracle.search(w)
    # absent k-mers
    for _ in range(20):
        w = rand_str(rng, k)
        assert sbwt.search(w) == oracle.search(w)
    # streaming over a read
    read = seqs[0][:120] + rand_str(rng, 30)
    assert sbwt.streaming_search(read) == oracle.streaming_search(read)


def test_wide_external_build_matches_inmemory():
    k = 40
    rng = np.random.default_rng(123)
    seqs = [rand_str(rng, 500) for _ in range(3)]
    from sbwt_tpu.construct.external import build_sbwt_external
    from sbwt_tpu.construct.inmemory import build_sbwt

    want = build_sbwt(seqs, k)
    got = build_sbwt_external(seqs, k, ram_bytes=1 << 20, n_threads=3)
    assert np.array_equal(got.bits, want.bits)
    assert np.array_equal(got.suffix_group_starts, want.suffix_group_starts)
    assert got.n_kmers == want.n_kmers


def test_wide_external_build_abundance_cutoffs():
    k = 36
    rng = np.random.default_rng(9)
    s = rand_str(rng, 200)
    seqs = [s, s, rand_str(rng, 120)]  # k-mers of s occur twice
    from sbwt_tpu.construct.external import build_sbwt_external
    from sbwt_tpu.construct.inmemory import build_sbwt

    want = build_sbwt(seqs, k, min_abundance=2)
    got = build_sbwt_external(seqs, k, min_abundance=2, ram_bytes=1 << 20)
    assert np.array_equal(got.bits, want.bits)
    assert got.n_kmers == want.n_kmers
