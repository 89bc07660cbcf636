"""Turbo engine: exact output equality with the LF engines.

The successor-pair table (ops/turbo.py) must reproduce per-k-mer search
and streaming search bit-for-bit, including the reference's corner
semantics: lowercase valid in streaming extension but not in search
restarts (SBWT.hh:426-427 vs 565-566), N/invalid characters, absent
k-mers, and non-singleton precalc seeds.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.turbo import build_turbo, fast_search_jit, turbo_streaming_jit
from sbwt_tpu.utils.dna import encode_query


def _mk(seqs, k, p):
    return SBWT.build(seqs, k, precalc_k=p)


@pytest.fixture(scope="module")
def sb():
    rng = np.random.default_rng(17)
    seqs = ["".join(rng.choice(list("ACGT"), size=800)) for _ in range(2)]
    # add a repetitive sequence so some precalc seeds are non-singleton
    seqs.append("ACGT" * 100)
    # p = 7 > log4(n): most seeds are singletons or empty, which is the
    # regime the fast path is designed for (the repetitive sequence still
    # produces non-singleton seeds to exercise the LF fallback)
    return _mk(seqs, 12, 7)


@pytest.fixture(scope="module", params=[1, 2, 3])
def turbo(sb, request):
    return build_turbo(sb.device_index, arity=request.param)


def test_fast_search_matches_search(sb, turbo):
    rng = np.random.default_rng(0)
    # mix of present and absent k-mers
    txt = "".join(rng.choice(list("ACGT"), size=4000))
    wins = [txt[i : i + sb.k] for i in range(0, 3000, 7)]
    codes = np.stack([encode_query(w) for w in wins]).astype(np.int32)
    expected = sb.search_batch(codes)
    ans, slow = fast_search_jit(turbo, jnp.asarray(codes))
    ans, slow = np.asarray(ans), np.asarray(slow)
    # where the fast path resolved, answers must match exactly
    np.testing.assert_array_equal(ans[~slow], expected[~slow])
    # and the slow set should be a small minority
    assert slow.mean() < 0.5


def test_turbo_streaming_equals_lf_streaming(sb, turbo):
    rng = np.random.default_rng(1)
    reads = []
    src = "".join(rng.choice(list("ACGT"), size=2000))
    for i in range(6):
        reads.append(src[i * 53 : i * 53 + 64])
    for _ in range(6):  # absent-heavy
        reads.append("".join(rng.choice(list("ACGT"), size=64)))
    reads.append("ACGT" * 16)  # repetitive: non-singleton seeds
    reads.append("ACGTNNNNACGTACGTACGTNNACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTT")
    reads.append("acgtACGTacgtACGTacgtACGTacgtACGTacgtACGTacgtACGTacgtACGTacgtACGT"[:64])
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), -1, dtype=np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_query(r)
    lengths = np.array([len(r) for r in reads], dtype=np.int32)

    ref = sb.streaming_search_batch(codes, lengths)
    got = np.asarray(
        turbo_streaming_jit(
            turbo, sb.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_enable_turbo_api(sb):
    rng = np.random.default_rng(2)
    read = "".join(rng.choice(list("ACGT"), size=80))
    base = sb.streaming_search(read)
    sb2 = SBWT.build(
        ["".join(rng.choice(list("ACGT"), size=800))], 12, precalc_k=4
    )
    del sb2
    sb.enable_turbo()
    try:
        assert sb.streaming_search(read) == base
    finally:
        sb._turbo = None


@pytest.mark.parametrize("arity", [1, 2, 3])
@pytest.mark.parametrize("k,p", [(8, 8), (9, 4), (16, 7), (14, 3), (15, 4)])
def test_turbo_odd_tail_lengths(k, p, arity):
    """k - p mod arity in {0,1,2} and k == p exercise the partial tail."""
    rng = np.random.default_rng(k * 10 + p)
    sb = _mk(["".join(rng.choice(list("ACGT"), size=600))], k, p)
    turbo = build_turbo(sb.device_index, arity=arity)
    reads = ["".join(rng.choice(list("ACGT"), size=k + 11)) for _ in range(8)]
    src = "".join(rng.choice(list("ACGT"), size=600))
    codes = np.stack([encode_query(r) for r in reads]).astype(np.int32)
    lengths = np.full(len(reads), codes.shape[1], dtype=np.int32)
    ref = sb.streaming_search_batch(codes, lengths)
    got = np.asarray(
        turbo_streaming_jit(turbo, sb.device_index, jnp.asarray(codes), jnp.asarray(lengths))
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("arity", [1, 2, 3])
def test_turbo_deep_slow_path(arity):
    """Tiny precalc (p=2) makes most seeds non-singleton: the exact-LF
    fallback (seed interval + packed-window LF steps, rem > 16 so both
    packed words are exercised) must carry the whole load."""
    rng = np.random.default_rng(5)
    seqs = ["".join(rng.choice(list("ACGT"), size=1500))]
    sb = _mk(seqs, 20, 2)  # rem = 18
    turbo = build_turbo(sb.device_index, arity=arity)
    reads = [seqs[0][i * 37 : i * 37 + 70] for i in range(8)]
    reads += ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(8)]
    reads.append(seqs[0][:30] + "N" + seqs[0][40:70])
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), -1, dtype=np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_query(r)
    lengths = np.array([len(r) for r in reads], dtype=np.int32)
    ref = sb.streaming_search_batch(codes, lengths)
    got = np.asarray(
        turbo_streaming_jit(
            turbo, sb.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_pack_seed_pair_bits_encoding():
    """Pair table vs naive per-(p+1)-mer construction, both q%16==0 and
    the small-q fallback path."""
    from sbwt_tpu.ops.turbo import _pack_seed_pair_bits

    rng = np.random.default_rng(9)
    for p in (1, 2, 3):
        q = 4**p
        live = rng.random(q) < 0.4
        packed = np.asarray(_pack_seed_pair_bits(jnp.asarray(live)))
        for m in range(4 * q):
            want = int(live[m % q]) | (int(live[m >> 2]) << 1)
            got = (packed[m >> 4] >> (2 * (m & 15))) & 3
            assert got == want, (p, m)


def test_turbo_streaming_miss_heavy_multitrip():
    """All-miss batch big enough to force multiple dirty-lane trips and
    the pooled slow-sentinel pass; output must still equal the LF engine
    and contain no sentinel."""
    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=3000))]
    sb = _mk(seqs, 14, 5)
    turbo = build_turbo(sb.device_index, arity=3)
    n, L = 600, 40
    codes = rng.integers(0, 4, size=(n, L)).astype(np.int32)
    # a few genomic reads mixed in
    for i in range(0, n, 50):
        s = seqs[0][i : i + L]
        codes[i, : len(s)] = encode_query(s)
    lengths = np.full(n, L, dtype=np.int32)
    ref = sb.streaming_search_batch(codes, lengths)
    got = np.asarray(
        turbo_streaming_jit(
            turbo, sb.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )
    assert (got >= -1).all()
    np.testing.assert_array_equal(got, ref)
