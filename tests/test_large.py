"""Large-ish integration test, modeled on the reference's TEST_LARGE
fixture (tests/test_large.hh:24-170): build a k=30 index over a genome
both in-memory and via the external pipeline, assert bit-vector
equality; check streaming == per-k-mer search over simulated reads;
dummy-mark identity n_subsets == n_kmers + n_dummies; every input k-mer
found with its forward moves validated against a hash set; random
absent k-mers all return -1.

Scaled to CI (120 kbp genome, 10^4 absent probes instead of 10^6)."""
import numpy as np
import pytest

from sbwt_tpu.construct.external import build_sbwt_external
from sbwt_tpu.construct.inmemory import build_sbwt
from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.utils.dna import decode, encode_query

K = 30


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(123)
    return "".join(rng.choice(list("ACGT"), size=120_000))


@pytest.fixture(scope="module")
def sb(genome):
    return SBWT.build([genome], K, precalc_k=8)


def test_inmemory_equals_external(genome, tmp_path_factory, sb):
    tmp = tmp_path_factory.mktemp("em")
    ext = build_sbwt_external([genome], K, temp_dir=str(tmp), ram_bytes=1 << 20)
    np.testing.assert_array_equal(sb.bits, ext.bits)
    np.testing.assert_array_equal(sb.suffix_group_starts, ext.suffix_group_starts)


def test_streaming_equals_search_on_reads(genome, sb):
    rng = np.random.default_rng(7)
    starts = rng.integers(0, len(genome) - 100, size=200)
    reads = [genome[s : s + 100] for s in starts]
    reads += ["".join(rng.choice(list("ACGT"), size=100)) for _ in range(20)]
    codes = np.stack([encode_query(r) for r in reads]).astype(np.int8)
    lengths = np.full(len(reads), 100, dtype=np.int32)
    stream = sb.streaming_search_batch(codes, lengths)
    # per-k-mer searches of every window
    wins = np.lib.stride_tricks.sliding_window_view(codes, K, axis=1)
    flat = np.ascontiguousarray(wins.reshape(-1, K))
    per = sb.search_batch(flat).reshape(len(reads), -1)
    np.testing.assert_array_equal(stream, per)


def test_dummy_mark_identity(sb):
    """n_subsets == n_kmers + n_dummies (test_large.hh:117-124)."""
    marks = sb.compute_dummy_node_marks()
    assert marks.sum() + sb.number_of_kmers() == sb.number_of_subsets()


def test_all_input_kmers_found_with_forward(genome, sb):
    kmer_set = {genome[i : i + K] for i in range(len(genome) - K + 1)}
    sample = sorted(kmer_set)[:: max(1, len(kmer_set) // 500)]
    codes = np.stack([encode_query(s) for s in sample]).astype(np.int8)
    cols = sb.search_batch(codes)
    assert (cols >= 0).all()
    # forward moves agree with the k-mer set (test_large.hh:126-170)
    for kmer, col in list(zip(sample, cols))[:100]:
        for c in "ACGT":
            nxt = kmer[1:] + c
            fwd = sb.forward(int(col), c)
            if nxt in kmer_set:
                assert fwd >= 0, (kmer, c)
                # the landed column's k-mer is nxt
                assert sb.get_kmer(fwd) == nxt
            else:
                assert fwd == -1, (kmer, c)


def test_random_absent_kmers(genome, sb):
    rng = np.random.default_rng(99)
    kmer_set = {genome[i : i + K] for i in range(len(genome) - K + 1)}
    probes = ["".join(r) for r in rng.choice(list("ACGT"), size=(10_000, K))]
    codes = np.stack([encode_query(s) for s in probes]).astype(np.int8)
    ans = sb.search_batch(codes)
    present = np.array([p in kmer_set for p in probes])
    np.testing.assert_array_equal(ans >= 0, present)


def test_streaming_support_matches_recomputation(sb):
    from sbwt_tpu.ops.suffix_groups import mark_suffix_groups

    np.testing.assert_array_equal(
        mark_suffix_groups(sb.bits, sb.k), sb.suffix_group_starts
    )
