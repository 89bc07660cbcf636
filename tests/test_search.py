"""Query engine tests: exhaustive differential checks vs the oracle.

Mirrors the reference strategy (tests/test_small.hh): query all 4^k k-mers
against hash-set ground truth, check streaming == per-k-mer search per
position, partial_search against reconstructed k-mers, forward moves, and
k-mer extraction against reconstruction.
"""
import itertools
import random

import numpy as np
import pytest

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.utils.dna import encode_query
from oracle import OracleIndex, get_kmers

random.seed(247829347)


def rand_dna(n):
    return "".join(random.choice("ACGT") for _ in range(n))


SEQS = ["CCCGTGATGGCTA", "TAATGCTGTAGC", "TGGCTCGTGTAGTCGA"]


@pytest.fixture(scope="module", params=[0, 2, 4])
def built_k4(request):
    return SBWT.build(SEQS, 4, precalc_k=request.param), OracleIndex(SEQS, 4)


def test_all_queries_exhaustive(built_k4):
    sbwt, oracle = built_k4
    k = 4
    true_kmers = get_kmers(SEQS, k)
    all_kmers = ["".join(t) for t in itertools.product("ACGT", repeat=k)]
    codes = np.stack([encode_query(s) for s in all_kmers])
    ans = sbwt.search_batch(codes)
    for s, a in zip(all_kmers, ans):
        if s in true_kmers:
            assert a == oracle.search(s), s
        else:
            assert a == -1, s
    # all-N probe
    assert sbwt.search("N" * k) == -1
    # lowercase is rejected in per-k-mer search (SBWT.hh:426-427)
    some_present = next(iter(true_kmers))
    assert sbwt.search(some_present.lower()) == -1


def test_streaming_equals_per_kmer(built_k4):
    sbwt, oracle = built_k4
    k = 4
    inputs = SEQS + [rand_dna(60), "ACGT" + "N" + rand_dna(20), rand_dna(4), "N" * 30]
    for text in inputs:
        got = sbwt.streaming_search(text)
        want = oracle.streaming_search(text)
        # oracle rejects invalid chars inside search()
        want2 = []
        for i in range(len(text) - k + 1):
            w = text[i : i + k]
            want2.append(-1 if any(c not in "ACGT" for c in w) else oracle.search(w))
        assert got == want2, text
        assert len(got) == max(0, len(text) - k + 1)


def test_streaming_batch_padding(built_k4):
    sbwt, _ = built_k4
    k = 4
    reads = [rand_dna(40), rand_dna(25), rand_dna(40), rand_dna(4)]
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), -1, dtype=np.int8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_query(r)
    lengths = np.array([len(r) for r in reads], dtype=np.int32)
    ans = sbwt.streaming_search_batch(codes, lengths)
    for i, r in enumerate(reads):
        expect = sbwt.streaming_search(r)
        got = list(ans[i, : max(0, len(r) - k + 1)])
        assert got == expect
        assert all(a == -1 for a in ans[i, max(0, len(r) - k + 1) :])


def test_streaming_mixed_hits_and_misses():
    # Force chain breaks and restarts: index one sequence, query a chimera.
    sbwt = SBWT.build(SEQS, 6, precalc_k=3)
    oracle = OracleIndex(SEQS, 6)
    for _ in range(20):
        text = "".join(
            random.choice([rand_dna(8), SEQS[0][2:10], SEQS[1][:7], "NN"])
            for _ in range(6)
        )
        got = sbwt.streaming_search(text)
        want = []
        for i in range(len(text) - 6 + 1):
            w = text[i : i + 6]
            want.append(-1 if any(c not in "ACGT" for c in w) else oracle.search(w))
        assert got == want, text


def test_partial_search():
    # Mirrors tests/test_small.hh:101-126.
    strings = SEQS
    k = 6
    sbwt = SBWT.build(strings, k)
    kmers_concat = sbwt.reconstruct_all_kmers()
    (l, r), length = sbwt.partial_search("GCAAAA")
    assert length == 2
    for i in range(sbwt.number_of_subsets()):
        kmer = kmers_concat[i * k : (i + 1) * k]
        if l <= i <= r:
            assert kmer[k - length :] == "GC"
        else:
            assert kmer[k - length :] != "GC"
    # partial_search accepts lowercase (SBWT.hh:531)
    (l2, r2), length2 = sbwt.partial_search("gcaaaa")
    assert (l2, r2, length2) == (l, r, length)


def test_forward_and_dummy_marks():
    k = 4
    sbwt = SBWT.build(SEQS, k)
    oracle = OracleIndex(SEQS, k)
    true_kmers = get_kmers(SEQS, k)
    # From every found k-mer, forward moves must agree with the k-mer set
    # (tests/test_large.hh:126-170 analog).
    for s in true_kmers:
        col = sbwt.search(s)
        assert col >= 0
        for c in "ACGT":
            succ = s[1:] + c
            res = sbwt.forward(col, c)
            if succ in true_kmers:
                assert res == oracle.search(succ), (s, c)
            else:
                assert res == -1, (s, c)
    marks = sbwt.compute_dummy_node_marks()
    n_dummies = int(marks.sum())
    assert sbwt.number_of_subsets() == sbwt.number_of_kmers() + n_dummies
    # dummy marks = nodes whose label is shorter than k
    for i, node in enumerate(oracle.nodes):
        assert marks[i] == (len(node) < k), (i, node)


def test_reconstruct_and_get_kmer():
    k = 4
    sbwt = SBWT.build(SEQS, k)
    oracle = OracleIndex(SEQS, k)
    concat = sbwt.reconstruct_all_kmers()
    for i, node in enumerate(oracle.nodes):
        want = "$" * (k - len(node)) + node
        assert concat[i * k : (i + 1) * k] == want
        assert sbwt.get_kmer(i) == want
        assert sbwt.get_kmer_fast(i, sbwt.select_support()) == want


def test_ascii_export():
    k = 4
    sbwt = SBWT.build(SEQS, k)
    oracle = OracleIndex(SEQS, k)
    # Reference format: per set, members in ACGT order with last lowercased,
    # '$' for the empty set (SBWT.hh:750-773).
    expect = []
    for i in range(len(oracle.nodes)):
        members = [c for c in "ACGT" if oracle.bits[c][i]]
        if not members:
            expect.append("$")
        else:
            expect.append("".join(members[:-1]) + members[-1].lower())
    assert sbwt.ascii_export_sets() == "".join(expect) + "\n"
    meta = sbwt.ascii_export_metadata()
    assert f"k: {k}" in meta and f"number_of_sets: {len(oracle.nodes)}" in meta


def test_update_interval():
    sbwt = SBWT.build(SEQS, 6)
    oracle = OracleIndex(SEQS, 6)
    n = sbwt.number_of_subsets()
    for s in ["A", "GC", "TAGC", "XY", "ACGTACGT"]:
        got = sbwt.update_sbwt_interval(s, (0, n - 1))
        want = oracle.update_interval(s, 0, n - 1)
        assert got == want, s
    assert sbwt.update_sbwt_interval("A", (-1, -1)) == (-1, -1)


def test_large_random_differential():
    seqs = [rand_dna(300) for _ in range(5)]
    k = 8
    sbwt = SBWT.build(seqs, k, precalc_k=4)
    true_kmers = get_kmers(seqs, k)
    # every indexed k-mer must be found, with distinct ranks
    codes = np.stack([encode_query(s) for s in sorted(true_kmers)])
    ans = sbwt.search_batch(codes)
    assert (ans >= 0).all()
    assert len(set(int(a) for a in ans)) == len(true_kmers)
    # random absent k-mers must be rejected
    misses = 0
    probes = [rand_dna(k) for _ in range(500)]
    probe_ans = sbwt.search_batch(np.stack([encode_query(s) for s in probes]))
    for s, a in zip(probes, probe_ans):
        if s not in true_kmers:
            misses += 1
            assert a == -1
    assert misses > 0
    # streaming over the original sequences: all positions found
    got = sbwt.streaming_search(seqs[0])
    assert all(a >= 0 for a in got)


def test_get_kmers_batch_matches_scalar():
    sbwt = SBWT.build(SEQS, 5)
    ss = sbwt.select_support()
    cols = list(range(sbwt.number_of_subsets()))
    batch = sbwt.get_kmers_batch(cols)
    for col in cols:
        assert batch[col] == sbwt.get_kmer_fast(col, ss)


def test_streaming_staged_patch_miss_heavy():
    """All-miss batch wide enough for multiple staged-patch trips: stage A
    (seed triage) + stage B (survivor searches) must equal per-k-mer
    search everywhere and leave no stage sentinel behind."""
    import numpy as np
    import jax.numpy as jnp
    from sbwt_tpu.ops.search import streaming_search_jit
    from sbwt_tpu.utils.dna import encode_query

    rng = np.random.default_rng(23)
    seqs = ["".join(rng.choice(list("ACGT"), size=2500))]
    sbwt = SBWT.build(seqs, 12, precalc_k=5)
    n, L = 500, 36
    codes = rng.integers(0, 4, size=(n, L)).astype(np.int32)
    for i in range(0, n, 40):  # some genomic reads
        codes[i] = encode_query(seqs[0][i : i + L])
    codes[3, 7] = -1  # invalid char mid-read
    lengths = np.full(n, L, dtype=np.int32)
    got = np.asarray(
        streaming_search_jit(
            sbwt.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )
    assert (got >= -1).all()
    k = 12
    P = L - k + 1
    wins = np.stack([codes[:, i : i + k] for i in range(P)], axis=1)
    want = np.asarray(sbwt.search_batch(wins.reshape(n * P, k))).reshape(n, P)
    np.testing.assert_array_equal(got, want)
