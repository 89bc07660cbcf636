"""API-surface parity: the reference-named accessors (SBWT.hh:111-157)
and the api_example walkthrough keep working as a library user of the
reference would expect (docs/PARITY.md)."""
import numpy as np

from sbwt_tpu.models.sbwt import SBWT


def test_reference_named_accessors():
    sb = SBWT.build(["ACGTACGTAGGTCCATTCAGTCAGGACT"], 6, precalc_k=3)
    assert sb.get_k() == 6 == sb.k
    C = sb.get_C_array()
    assert C.dtype == np.int64 and C[0] == 1 and np.all(np.diff(C) >= 0)
    pre = sb.get_precalc()
    assert pre.shape == (4**3, 2)
    ss = sb.get_streaming_support()
    assert ss.dtype == bool and len(ss) == sb.number_of_subsets()
    assert ss[0]  # first column always marks a suffix group start
    assert sb.get_subset_rank_structure() is sb.device_index
    assert sb.has_streaming_query_support()
    assert sb.number_of_subsets() >= sb.number_of_kmers()
    assert sb.get_precalc_k() == 3


def test_precalc_matches_update_interval():
    """Every precalc entry equals the interval from explicit LF steps on
    the full [0, n) interval (SBWT.hh:617-645 semantics)."""
    sb = SBWT.build(["ACGTACGTAGGTCCATTCAGTCAGGACT", "TTTTGCA"], 5, precalc_k=2)
    pre = sb.get_precalc()
    n = sb.number_of_subsets()
    for idx in range(4**2):
        # colex-reversed packing: idx = (idx<<2) | char_idx(kmer[p-1-i])
        chars = "ACGT"[(idx >> 0) & 3] + "ACGT"[(idx >> 2) & 3]
        l, r = sb.update_sbwt_interval(chars, (0, n - 1))
        want = (l, r) if l <= r else (-1, -1)
        assert tuple(pre[idx]) == want, (idx, chars)


def test_no_streaming_support_build():
    sb = SBWT.build(["ACGTACGTAGGTCC"], 4, streaming_support=False)
    assert not sb.has_streaming_query_support()
    assert len(sb.get_streaming_support()) == 0
    # per-kmer search still works without streaming support
    assert sb.search("ACGT") >= 0
    assert sb.search("AAAA") == -1
