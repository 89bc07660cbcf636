"""Differential construction tests vs the independent string oracle.

Mirrors the reference's core strategy (tests/test_small.hh:65-99): build the
same input two independent ways and assert bit-for-bit equality, then
exhaustively query all 4^k k-mers against a hash-set ground truth.
Includes the reference's edge-case corpora: redundant dummies (subset count
must be exactly 9, test_small.hh:281-303), missing alphabet letters, many
random strings, and cyclic input.
"""
import random

import numpy as np
import pytest

from sbwt_tpu.construct.inmemory import build_sbwt, mark_suffix_groups
from sbwt_tpu.utils.kmers import to_string
from oracle import OracleIndex, get_kmers

random.seed(247829347)


def rand_dna(n):
    return "".join(random.choice("ACGT") for _ in range(n))


def assert_matches_oracle(seqs, k):
    built = build_sbwt(seqs, k, streaming_support=True)
    oracle = OracleIndex(seqs, k)
    node_strs = [to_string(v, l) for v, l in zip(built.node_vals, built.node_lens)]
    assert node_strs == oracle.nodes
    for ci, c in enumerate("ACGT"):
        assert built.bits[ci].tolist() == oracle.bits[c], f"row {c}"
    assert built.suffix_group_starts.tolist() == oracle.sgs
    assert built.n_kmers == oracle.n_kmers
    assert built.C.tolist() == [oracle.C[c] for c in "ACGT"]
    # streaming support must equal the label-propagation recomputation
    # (mirrors tests/test_large.hh:89-92)
    assert mark_suffix_groups(built.bits, k).tolist() == oracle.sgs
    return built, oracle


CASES = [
    (["CCCGTGATGGCTA", "TAATGCTGTAGC", "TGGCTCGTGTAGTCGA"], 4),
    (["CCCGTGATGGCTA", "TAATGCTGTAGC", "TGGCTCGTGTAGTCGA"], 6),
    (["AAAA", "ACCC", "ACCG", "CCCG", "TTTT"], 4),  # redundant dummies
    (["AAAA", "ACCC", "ACCG", "CCCG"], 3),  # no 'T' anywhere
    (["ACGTACGTACGT"], 3),  # cyclic de Bruijn graph
    (["A" * 10], 3),  # single self-loop
    ([rand_dna(6) for _ in range(20)], 6),  # lots of dummies
    ([rand_dna(100) for _ in range(10)], 8),
    (["ACGTNNNACGT", "NNNN"], 3),  # invalid characters in input
]


@pytest.mark.parametrize("seqs,k", CASES)
def test_construction_matches_oracle(seqs, k):
    assert_matches_oracle(seqs, k)


def test_redundant_dummies_count():
    # Dummies C, CC and CCC must not be created (test_small.hh:290-303).
    built = build_sbwt(["AAAA", "ACCC", "ACCG", "CCCG", "TTTT"], 4)
    assert built.n_nodes == 9


def test_multi_sequence_split_equivalence():
    # Building from one file or several yields the same index
    # (test_small.hh:256-278 analog).
    seqs = ["CCCGTGATGGCTA", "TAATGCTGTAGC", "TGGCTCGTGTAGTCGA"]
    a = build_sbwt(seqs, 4)
    b = build_sbwt(list(reversed(seqs)), 4)
    assert np.array_equal(a.bits, b.bits)
    assert np.array_equal(a.suffix_group_starts, b.suffix_group_starts)


def test_abundance_filters():
    seqs = ["ACGTACGT", "ACGTAAAA", "ACGTACGT"]
    k = 4
    # count occurrences of each kmer across all windows
    from collections import Counter

    counts = Counter()
    for s in seqs:
        for i in range(len(s) - k + 1):
            counts[s[i : i + k]] += 1
    kept = {x for x, c in counts.items() if c >= 2}
    built = build_sbwt(seqs, k, min_abundance=2)
    assert built.n_kmers == len(kept)
    kept_max = {x for x, c in counts.items() if c <= 2}
    built2 = build_sbwt(seqs, k, max_abundance=2)
    assert built2.n_kmers == len(kept_max)


def test_reverse_complements():
    seqs = ["ACGTGATGCTAGT"]
    from sbwt_tpu.utils.dna import reverse_complement

    a = build_sbwt(seqs, 4, add_reverse_complements=True)
    b = build_sbwt(seqs + [reverse_complement(seqs[0])], 4)
    assert np.array_equal(a.bits, b.bits)
    assert a.n_kmers == len(get_kmers(seqs + [reverse_complement(seqs[0])], 4))


def test_empty_and_tiny_inputs():
    built = build_sbwt([], 4)
    assert built.n_nodes == 1  # root only
    built = build_sbwt(["ACG"], 4)  # shorter than k
    assert built.n_kmers == 0
