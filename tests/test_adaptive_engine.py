"""AdaptiveTurboEngine: the hint-free production dispatch path.

The CLI's streaming_search_batch must need no workload declaration
(reference: one loop, no hints — src/CLI/sbwt_search.cpp:46-91) while
running the hinted (cond-free) programs: each batch's measured hit count
picks the hint for the next batch, and a strided probe seeds batch 1.
Exactness must hold through every hint transition.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.search import streaming_search_jit
from sbwt_tpu.ops.turbo import (
    AdaptiveTurboEngine,
    build_turbo,
    regime_hint_from_hit_fraction,
)
from sbwt_tpu.utils.dna import encode_query


@pytest.fixture(scope="module")
def sb():
    rng = np.random.default_rng(5)
    g = "".join(rng.choice(list("ACGT"), size=4000))
    sbwt = SBWT.build([g], 14, precalc_k=6)
    sbwt._turbo = build_turbo(sbwt.device_index, arity=2)
    return g, sbwt


def _batches(g, hit: float, B=512, L=40, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    enc = encode_query(g)
    n_gen = int(B * hit)
    for i in range(n_gen):
        s = enc[(i * 17) % 3000 : (i * 17) % 3000 + L]
        codes[i, : len(s)] = s
    lengths = np.full(B, L, dtype=np.int32)
    return codes, lengths


def _oracle(sbwt, codes, lengths):
    return np.asarray(
        streaming_search_jit(
            sbwt.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )


def test_hint_thresholds():
    assert regime_hint_from_hit_fraction(0.98) == "hit"
    assert regime_hint_from_hit_fraction(0.6) == "hit"
    assert regime_hint_from_hit_fraction(0.5) == "mid"
    assert regime_hint_from_hit_fraction(0.21) == "mid"
    assert regime_hint_from_hit_fraction(0.0) == "miss"


def test_adaptive_transitions_stay_exact(sb):
    """Miss batch -> hit batch -> mid batch through the facade: every
    answer exact, and the hint tracks the observed workload (so batch
    N+1 runs the program batch N's mix selects — even when that makes
    the hint 'wrong' for a shifted batch, exactness holds)."""
    g, sbwt = sb
    sbwt._turbo_engine = None  # fresh adaptation state
    for hit, expect_hint in [(0.0, "miss"), (1.0, "hit"), (0.5, "mid"), (0.0, "miss")]:
        codes, lengths = _batches(g, hit, seed=int(hit * 10) + 1)
        got = sbwt.streaming_search_batch(codes, lengths)
        np.testing.assert_array_equal(got, _oracle(sbwt, codes, lengths))
        eng = sbwt._turbo_engine
        # per-read hit fraction ~ per-query here (reads are fully
        # genomic or fully random); padding dilution keeps 1.0 below
        # the threshold only if windows were invalid — they are not
        assert eng.hint == expect_hint, (hit, eng.hint)


def test_probe_seeds_first_large_batch(sb, monkeypatch):
    """With a large first batch the strided probe runs first, so the
    full-width program is already hinted on batch 1."""
    g, sbwt = sb
    monkeypatch.setattr(AdaptiveTurboEngine, "PROBE_MIN_BATCH", 256)
    monkeypatch.setattr(AdaptiveTurboEngine, "PROBE_LANES", 64)
    eng = AdaptiveTurboEngine(sbwt._turbo, sbwt.device_index)
    codes, lengths = _batches(g, 0.0, B=512, seed=9)
    eng._maybe_probe(jnp.asarray(codes), jnp.asarray(lengths))
    assert eng.hint == "miss"
    out = eng.search(jnp.asarray(codes), jnp.asarray(lengths))
    np.testing.assert_array_equal(np.asarray(out), _oracle(sbwt, codes, lengths))


def test_reduced_form_matches_full(sb):
    g, sbwt = sb
    codes, lengths = _batches(g, 0.5, seed=3)
    eng = AdaptiveTurboEngine(sbwt._turbo, sbwt.device_index)
    s, h = eng.search_reduced(jnp.asarray(codes), jnp.asarray(lengths))
    ref = _oracle(sbwt, codes, lengths)
    assert int(s) == int(ref.sum())
    assert h == int((ref >= 0).sum())
