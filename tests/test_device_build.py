"""On-device construction (construct/device.py) vs the host oracle.

The device build must produce bit-identical rank tables / suffix-group
marks / C to construct.inmemory.build_sbwt for the same input — the same
differential contract the reference enforces between its in-memory and
KMC constructors (tests/test_small.hh:65-99)."""
import numpy as np
import pytest

from sbwt_tpu.construct.device import build_sbwt_device
from sbwt_tpu.construct.inmemory import build_sbwt
from sbwt_tpu.models.matrix import from_host_arrays
from sbwt_tpu.ops import search as engines


def _assert_equal_index(dev, oracle_built, k):
    host = from_host_arrays(
        oracle_built.bits,
        oracle_built.suffix_group_starts,
        k=k,
        n_kmers=oracle_built.n_kmers,
    )
    n = host.n_nodes
    assert dev.n_nodes == n
    assert dev.n_kmers == host.n_kmers
    np.testing.assert_array_equal(np.asarray(dev.C), np.asarray(host.C))
    # padded device tables must agree on every real word
    W = host.n_words
    dr = np.asarray(dev.rank_tbl).reshape(4, dev.n_words, 2)
    hr = np.asarray(host.rank_tbl).reshape(4, W, 2)
    np.testing.assert_array_equal(dr[:, :W], hr)
    assert not dr[:, W:, 0].any(), "padding words must be zero"
    ds = np.asarray(dev.sgs_tbl)[:W]
    hs = np.asarray(host.sgs_tbl)
    np.testing.assert_array_equal(ds, hs)


CASES = [
    # (seqs builder, k)
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=300))], 7),
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=2000)) for _ in range(3)], 12),
    # reads with Ns (invalid chars break windows)
    (
        lambda rng: [
            "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=150))
            for _ in range(40)
        ],
        9,
    ),
    # cyclic input (the reference's trap case, test_small.hh:318-321)
    (lambda rng: ["ACGTACGTACGT" * 6], 4),
    # missing alphabet letters (test_small.hh:305-308)
    (lambda rng: ["AAACCACACCCACAACACCC"], 5),
    # k = 32 boundary (all chars in the top-aligned word)
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=400))], 32),
    # wide keys: k > 32 (W = 3..16 uint32 words)
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=500))], 33),
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=800)) for _ in range(2)], 51),
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=600))], 255),
    # many tiny reads -> many sources
    (lambda rng: ["".join(rng.choice(list("ACGT"), size=20)) for _ in range(60)], 8),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_device_build_matches_host(case):
    mk, k = CASES[case]
    rng = np.random.default_rng(100 + case)
    seqs = mk(rng)
    oracle = build_sbwt(seqs, k)
    dev = build_sbwt_device(seqs, k, pad_quantum=256)
    _assert_equal_index(dev, oracle, k)


def test_device_build_queries_end_to_end():
    rng = np.random.default_rng(7)
    seqs = ["".join(rng.choice(list("ACGT"), size=3000))]
    k = 14
    dev = build_sbwt_device(seqs, k, precalc_k=4, pad_quantum=256)
    oracle = build_sbwt(seqs, k)
    host = from_host_arrays(
        oracle.bits, oracle.suffix_group_starts, k=k,
        n_kmers=oracle.n_kmers, precalc_k=4,
    )
    import jax.numpy as jnp
    from sbwt_tpu.utils.dna import encode_query

    qs = []
    for i in range(256):
        if i % 2 == 0:
            st = int(rng.integers(0, 3000 - k))
            qs.append(encode_query(seqs[0][st : st + k]))
        else:
            qs.append(encode_query("".join(rng.choice(list("ACGT"), size=k))))
    qs = np.stack(qs)
    a = np.asarray(engines.search_jit(dev, jnp.asarray(qs)))
    b = np.asarray(engines.search_jit(host, jnp.asarray(qs)))
    np.testing.assert_array_equal(a, b)
    # streaming over reads
    reads = np.stack([encode_query("".join(rng.choice(list("ACGT"), size=60))) for _ in range(32)])
    lens = np.full(32, 60, dtype=np.int32)
    sa = np.asarray(engines.streaming_search_jit(dev, jnp.asarray(reads), jnp.asarray(lens)))
    sb = np.asarray(engines.streaming_search_jit(host, jnp.asarray(reads), jnp.asarray(lens)))
    np.testing.assert_array_equal(sa, sb)


def test_device_build_src_budget_error():
    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), size=20)) for _ in range(50)]
    with pytest.raises(ValueError, match="source budget"):
        build_sbwt_device(seqs, 8, src_pad=4, pad_quantum=256)


def test_sbwt_build_on_device_facade(tmp_path):
    """SBWT.build_on_device: query parity with the host-built SBWT and a
    working cpp serialization roundtrip (host packed copies recovered
    from the device tables)."""
    from sbwt_tpu.io.serialize import load, save_cpp
    from sbwt_tpu.models.sbwt import SBWT

    rng = np.random.default_rng(21)
    seqs = ["".join(rng.choice(list("ACGT"), size=1500)) for _ in range(2)]
    k = 11
    a = SBWT.build_on_device(seqs, k, precalc_k=3)
    b = SBWT.build(seqs, k, precalc_k=3)
    assert a.number_of_subsets() == b.number_of_subsets()
    assert a.number_of_kmers() == b.number_of_kmers()
    np.testing.assert_array_equal(a._bits_packed, b._bits_packed)
    np.testing.assert_array_equal(a._sgs_packed, b._sgs_packed)
    qs = np.stack([rng.integers(0, 4, size=k).astype(np.int8) for _ in range(200)])
    np.testing.assert_array_equal(
        np.asarray(a.search_batch(qs)), np.asarray(b.search_batch(qs))
    )
    p = tmp_path / "dev.sbwt"
    save_cpp(str(p), a)
    c = load(str(p))
    np.testing.assert_array_equal(
        np.asarray(c.search_batch(qs)), np.asarray(b.search_batch(qs))
    )
