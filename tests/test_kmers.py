"""Packed k-mer tests: exhaustive ops vs string oracles.

Mirrors the reference's Kmer test strategy (tests/test_kmer.hh:27-155):
round-trips, drop/append ops, and full pairwise colex-order comparison
against a string-reversal oracle.
"""
import random

import numpy as np
import pytest

from sbwt_tpu.utils import kmers as km
from sbwt_tpu.utils.dna import encode, decode
from oracle import _colex_less

random.seed(247829347)


def rand_dna(n):
    return "".join(random.choice("ACGT") for _ in range(n))


def test_pack_unpack_roundtrip():
    for L in list(range(1, 12)) + [31, 32]:
        for _ in range(20):
            s = rand_dna(L)
            v = km.pack_kmer(encode(s))
            assert decode(km.unpack_kmer(v, L)) == s


def test_colex_order_matches_string_oracle():
    strs = set()
    for L in range(1, 9):
        for _ in range(30):
            strs.add(rand_dna(L))
    strs = sorted(strs)
    vals = np.array([km.pack_kmer(encode(s)) for s in strs], dtype=np.uint64)
    lens = np.array([len(s) for s in strs], dtype=np.int64)
    for i in range(len(strs)):
        for j in range(len(strs)):
            packed_less = (vals[i] < vals[j]) or (
                vals[i] == vals[j] and lens[i] < lens[j]
            )
            assert packed_less == _colex_less(strs[i], strs[j]), (strs[i], strs[j])


def test_colex_order_max_length():
    strs = {rand_dna(random.choice([30, 31, 32])) for _ in range(60)}
    strs = sorted(strs)
    vals = [km.pack_kmer(encode(s)) for s in strs]
    lens = [len(s) for s in strs]
    order = np.lexsort((np.array(lens), np.array(vals, dtype=np.uint64)))
    oracle_sorted = sorted(strs, key=lambda s: (s[::-1] + "A" * (32 - len(s)), len(s)))
    assert [strs[i] for i in order] == oracle_sorted


@pytest.mark.parametrize("k", [2, 3, 7, 31, 32])
def test_windows(k):
    s = rand_dna(200)
    # insert some invalid characters
    s = s[:50] + "N" + s[51:120] + "x" + s[121:]
    codes = encode(s)
    vals, valid = km.pack_windows(codes, k)
    assert len(vals) == len(s) - k + 1
    for i in range(len(vals)):
        w = s[i : i + k]
        ok = all(c in "ACGT" for c in w)
        assert valid[i] == ok
        if ok:
            assert vals[i] == km.pack_kmer(encode(w))


def test_drop_and_append():
    for k in [2, 5, 31, 32]:
        for _ in range(20):
            s = rand_dna(k)
            v = np.array([km.pack_kmer(encode(s))], dtype=np.uint64)
            assert km.drop_first(v, k)[0] == km.pack_kmer(encode(s[1:]))
            assert km.drop_last(v)[0] == km.pack_kmer(encode(s[:-1]))
            if k < 32:
                for c in range(4):
                    app = km.append_last(v, np.array([c], np.uint8))[0]
                    assert app == km.pack_kmer(encode(s + "ACGT"[c]))
            assert km.first_char(v, k)[0] == encode(s)[0]
            assert km.last_char(v)[0] == encode(s)[-1]
            for m in range(k + 1):
                assert km.prefix_of_length(v, k, np.array([m]))[0] == km.pack_kmer(
                    encode(s[:m])
                )
            for d in range(k):
                assert km.char_at_distance(v, np.array([d]))[0] == encode(s)[k - 1 - d]
