"""Slow, independent SBWT oracle used for differential testing.

Deliberately written with plain Python strings/dicts (no numpy, no shared
code with sbwt_tpu.construct) so that agreement with the vectorized
implementation is meaningful.  Mirrors the semantics of the reference
in-memory constructor (include/sbwt/NodeBOSSInMemoryConstructor.hh) and
search (include/sbwt/SBWT.hh:390-437) at the level of string operations.
"""
from __future__ import annotations

ACGT = "ACGT"


def colex_key(s: str):
    """Colex order: compare reversed strings position by position; a string
    that is a suffix-wise prefix (with implicit 'A' padding) ties are broken
    shorter-first — this matches Kmer::operator< (Kmer.hh:106-123)."""
    # Reversed string, padded conceptually with 'A' (= smallest char).
    # Implement by comparing (reversed padded to common length, length).
    return (s[::-1], len(s))


def _colex_less(a: str, b: str) -> bool:
    ra, rb = a[::-1], b[::-1]
    n = max(len(ra), len(rb))
    pa = ra + "A" * (n - len(ra))
    pb = rb + "A" * (n - len(rb))
    if pa != pb:
        return pa < pb
    return len(a) < len(b)


import functools


def colex_sorted(strings):
    return sorted(strings, key=functools.cmp_to_key(
        lambda a, b: -1 if _colex_less(a, b) else (1 if _colex_less(b, a) else 0)))


def get_kmers(seqs, k):
    """Distinct valid k-mers of the sequences."""
    out = set()
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i : i + k]
            if all(c in ACGT for c in w):
                out.add(w)
    return out


def build_oracle(seqs, k):
    """Build the plain-matrix SBWT naively.

    Returns (nodes, bits, sgs, n_kmers) where nodes is the colex-sorted
    node label list (strings; dummies are shorter than k), bits is a dict
    c -> list[bool], sgs list[bool].
    """
    kmers = get_kmers(seqs, k)
    suffixes = {x[1:] for x in kmers}  # drop-first values

    # Sources: k-mers with no predecessor in the graph.
    sources = {z for z in kmers if z[:-1] not in suffixes}

    # Dummy nodes: proper prefixes of sources; each dummy has an edge to the
    # next character of (any of) its sources.  Root always exists.
    dummy_edges = {"": set()}
    for z in sources:
        for m in range(k):
            p = z[:m]
            dummy_edges.setdefault(p, set()).add(z[m])

    # Edges of k-mer nodes: stored only on the first member of each suffix
    # group (among the k-mers, which form contiguous colex runs); edge c
    # exists iff kmer[1:] + c is an indexed k-mer.
    kmers_sorted = colex_sorted(kmers)
    kmer_edges = {}
    for i, x in enumerate(kmers_sorted):
        is_start = i == 0 or kmers_sorted[i - 1][1:] != x[1:]
        if is_start:
            kmer_edges[x] = {c for c in ACGT if x[1:] + c in kmers}
        else:
            kmer_edges[x] = set()

    nodes = colex_sorted(list(kmers) + list(dummy_edges.keys()))
    edge_sets = [
        dummy_edges[x] if len(x) < k else kmer_edges[x] for x in nodes
    ]
    bits = {c: [c in es for es in edge_sets] for c in ACGT}

    # Suffix group starts: drop first char iff node is a full k-mer, then
    # compare adjacent.
    def shorten(x):
        return x[1:] if len(x) == k else x

    sgs = []
    for i, x in enumerate(nodes):
        sgs.append(i == 0 or shorten(nodes[i - 1]) != shorten(x))

    return nodes, bits, sgs, len(kmers)


class OracleIndex:
    """Query-capable oracle wrapping build_oracle."""

    def __init__(self, seqs, k):
        self.nodes, self.bits, self.sgs, self.n_kmers = build_oracle(seqs, k)
        self.k = k
        self.n = len(self.nodes)
        counts = {c: sum(self.bits[c]) for c in ACGT}
        self.C = {}
        acc = 1
        for c in ACGT:
            self.C[c] = acc
            acc += counts[c]

    def rank(self, pos, c):
        return sum(self.bits[c][:pos])

    def update_interval(self, S, l, r):
        for ch in S:
            if ch not in ACGT:
                return -1, -1
            l = self.C[ch] + self.rank(l, ch)
            r = self.C[ch] + self.rank(r + 1, ch) - 1
            if l > r:
                return -1, -1
        return l, r

    def search(self, kmer):
        assert len(kmer) == self.k
        l, r = self.update_interval(kmer, 0, self.n - 1)
        if l == -1:
            return -1
        assert l == r, "non-singleton k-mer interval"
        return l

    def streaming_search(self, s):
        return [
            self.search(s[i : i + self.k]) for i in range(len(s) - self.k + 1)
        ]
