"""Turbo successor engine built FROM compressed/structured variants.

The successor table is variant-independent once built (ops/turbo.py
build_turbo accepts any index implementing the engine interface), so an
rrr/mef/split/concat/subsetwt index queries at turbo speed while keeping
its small serialized form — the reference runs all 10 variants through
the same LF loop instead (src/CLI/sbwt_search.cpp:204-253).  Exactness:
turbo over a variant must equal the variant's own LF streaming engine
AND the plain-matrix oracle.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.ops.search import streaming_search_jit
from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_jit, turbo_streaming_search
from sbwt_tpu.utils.dna import encode_query

VARIANTS = ["rrr-matrix", "mef-matrix", "plain-split", "plain-concat", "plain-subsetwt"]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(5)
    g = "".join(rng.choice(list("ACGT"), size=4000))
    sbwt = SBWT.build([g], 14, precalc_k=6)
    B, L = 384, 40
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    enc = encode_query(g)
    # mixed: genomic lanes, chimeric lanes (restarts resolving real
    # k-mers), random lanes
    for i in range(0, B, 3):
        s = enc[(i * 13) % 3000 : (i * 13) % 3000 + L]
        codes[i, : len(s)] = s
    for i in range(1, B, 3):
        cut = int(rng.integers(1, L - 14))
        s = enc[(i * 7) % 3000 : (i * 7) % 3000 + (L - cut)]
        codes[i, cut : cut + len(s)] = s
    lengths = np.full(B, L, dtype=np.int32)
    lengths[11] = 25
    ref = np.asarray(
        streaming_search_jit(
            sbwt.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )
    return g, sbwt, codes, lengths, ref


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_after():
    """The turbo streaming program inlines each variant's whole rank
    machinery into its fallback branches — five of those on top of the
    full suite's several hundred prior compiles aborted XLA's CPU
    compiler (SIGABRT in backend_compile_and_load).  Static hints below
    halve the per-variant program, and dropping the module's executables
    afterwards keeps the process-cumulative compiler state bounded."""
    import jax

    yield
    jax.clear_caches()


@pytest.mark.parametrize("variant", VARIANTS)
def test_variant_turbo_exact(data, variant):
    from functools import partial
    import jax

    _, sbwt, codes, lengths, ref = data
    var = sbwt.to_variant(variant)
    turbo = build_turbo(var.device_index, arity=2)
    # auto (cond) program only for rrr; the others pin a hint — hints
    # are exactness-invariant (tests/test_turbo_branches.py) and the
    # hinted programs compile at half the size
    hint = None if variant == "rrr-matrix" else ("mid" if "split" in variant else "hit")
    fn = turbo_streaming_jit if hint is None else jax.jit(
        partial(turbo_streaming_search, regime_hint=hint)
    )
    got = np.asarray(
        fn(turbo, var.device_index, jnp.asarray(codes), jnp.asarray(lengths))
    )
    np.testing.assert_array_equal(got, ref)


def test_variant_facade_enable_turbo(data):
    """The CLI path: enable_turbo on a loaded variant, then the batched
    streaming search runs the turbo engine with exact answers."""
    _, sbwt, codes, lengths, ref = data
    var = sbwt.to_variant("rrr-matrix")
    arity = var.enable_turbo(arity=1)
    assert arity == 1 and var._turbo is not None
    got = var.streaming_search_batch(codes, lengths)
    np.testing.assert_array_equal(got, ref)


def test_turbo_requires_precalc():
    rng = np.random.default_rng(7)
    g = "".join(rng.choice(list("ACGT"), size=500))
    sbwt = SBWT.build([g], 8, precalc_k=0)
    with pytest.raises(ValueError, match="precalc"):
        build_turbo(sbwt.device_index, arity=1)
