"""Suffix-group optimization: differential tests against direct loop
oracles transcribed from the reference semantics
(src/suffix_group_optimization.cpp), plus query invariance."""
import numpy as np
import pytest

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.suffix_groups import (
    compute_column_entropy,
    mark_suffix_groups,
    push_bits_left,
    spread_bits_after_push_left,
)


def _oracle_push_left(bits, marks):
    bits = bits.copy()
    for i in range(bits.shape[1] - 1, 0, -1):
        if not marks[i]:
            bits[:, i - 1] |= bits[:, i]
            bits[:, i] = False
    return bits


def _oracle_spread(bits, marks):
    bits = bits.copy()
    n = bits.shape[1]
    for i in range(n - 1):
        if not marks[i + 1]:
            top = 0
            while top < 4 and not bits[top, i]:
                top += 1
            for j in range(top + 1, 4):
                bits[j, i + 1] = bits[j, i]
                bits[j, i] = False
    return bits


def _random_case(rng, n):
    bits = rng.random((4, n)) < 0.3
    marks = np.zeros(n, dtype=bool)
    marks[0] = True
    marks[1:] = rng.random(n - 1) < 0.5
    return bits, marks


@pytest.mark.parametrize("n", [1, 2, 17, 500])
def test_push_and_spread_match_oracle(n):
    rng = np.random.default_rng(n)
    for _ in range(10):
        bits, marks = _random_case(rng, n)
        pushed = push_bits_left(bits, marks)
        np.testing.assert_array_equal(pushed, _oracle_push_left(bits, marks))
        spread = spread_bits_after_push_left(pushed, marks)
        np.testing.assert_array_equal(spread, _oracle_spread(pushed, marks))


def test_mark_suffix_groups_recovers_construction_marks():
    rng = np.random.default_rng(9)
    seqs = ["".join(rng.choice(list("ACGT"), size=700)) for _ in range(2)]
    sb = SBWT.build(seqs, 10)
    recomputed = mark_suffix_groups(sb.bits, sb.k)
    np.testing.assert_array_equal(recomputed, sb.suffix_group_starts)


def test_queries_invariant_under_bit_redistribution():
    """Streaming queries must answer identically after push/spread (the
    point of the optimization: the group's rank intervals are unchanged
    at interval granularity)."""
    rng = np.random.default_rng(10)
    seqs = ["".join(rng.choice(list("ACGT"), size=600))]
    sb = SBWT.build(seqs, 9, precalc_k=3)
    read = seqs[0][37:137]
    expected = sb.streaming_search(read)

    pushed = push_bits_left(sb.bits, sb.suffix_group_starts)
    sb2 = SBWT(pushed, sb.suffix_group_starts, sb.k, sb.number_of_kmers(), precalc_k=3)
    assert sb2.streaming_search(read) == expected

    spread = spread_bits_after_push_left(pushed, sb.suffix_group_starts)
    sb3 = SBWT(spread, sb.suffix_group_starts, sb.k, sb.number_of_kmers(), precalc_k=3)
    assert sb3.streaming_search(read) == expected


def test_column_entropy():
    bits = np.zeros((4, 8), dtype=bool)
    # 4 columns of pattern A, 4 columns of pattern T -> entropy 1 bit
    bits[0, :4] = True
    bits[3, 4:] = True
    assert abs(compute_column_entropy(bits) - 1.0) < 1e-12
    assert compute_column_entropy(np.zeros((4, 5), dtype=bool)) == 0.0
