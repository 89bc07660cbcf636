"""External (disk-backed) construction must equal in-memory construction
bit-for-bit — the same differential strategy the reference uses between
its KMC and in-memory constructors (tests/test_small.hh:65-99)."""
import numpy as np
import pytest

from sbwt_tpu.construct.external import build_sbwt_external
from sbwt_tpu.construct.inmemory import build_sbwt


@pytest.mark.parametrize("k", [4, 11, 31])
def test_external_equals_inmemory(k, tmp_path):
    rng = np.random.default_rng(k)
    seqs = ["".join(rng.choice(list("ACGT"), size=500)) for _ in range(3)]
    seqs.append("ACGT" * 50)
    a = build_sbwt(seqs, k)
    b = build_sbwt_external(seqs, k, temp_dir=str(tmp_path), ram_bytes=1 << 20)
    np.testing.assert_array_equal(a.bits, b.bits)
    np.testing.assert_array_equal(a.suffix_group_starts, b.suffix_group_starts)
    assert a.n_kmers == b.n_kmers


def test_external_abundance_filters(tmp_path):
    seqs = ["ACGTACGTACGT", "ACGTACGTACGT", "TTTTGGGG"]
    k = 5
    a = build_sbwt(seqs, k, min_abundance=2)
    b = build_sbwt_external(seqs, k, min_abundance=2, temp_dir=str(tmp_path))
    np.testing.assert_array_equal(a.bits, b.bits)
    a = build_sbwt(seqs, k, min_abundance=1, max_abundance=2)
    b = build_sbwt_external(seqs, k, max_abundance=2, temp_dir=str(tmp_path))
    np.testing.assert_array_equal(a.bits, b.bits)


def test_external_with_revcomp(tmp_path):
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), size=300))]
    a = build_sbwt(seqs, 9, add_reverse_complements=True)
    b = build_sbwt_external(seqs, 9, add_reverse_complements=True, temp_dir=str(tmp_path))
    np.testing.assert_array_equal(a.bits, b.bits)
