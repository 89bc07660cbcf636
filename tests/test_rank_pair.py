"""rank_pair == (rank(pos), rank(pos+1)) across every layer.

The LF extension step queries rank at both interval ends (SBWT.hh:423-437);
rank_pair answers both from one decode chain.  Differential against the
single-rank path at every position including word/block/bucket boundaries.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sbwt_tpu.ops.bv import BV_CLASSES, MEFBV, PlainBV, RRRBV
from sbwt_tpu.ops.wavelet import WaveletTree


def _bools(n, density, seed):
    rng = np.random.default_rng(seed)
    return rng.random(n) < density


@pytest.mark.parametrize("kind", ["plain", "rrr", "mef"])
@pytest.mark.parametrize("n,density", [(1, 0.5), (97, 0.3), (2048, 0.25), (700, 0.02)])
def test_bv_rank_pair(kind, n, density):
    bools = _bools(n, density, n + int(density * 100))
    bv = BV_CLASSES[kind].build(bools)
    pos = jnp.arange(n, dtype=jnp.int32)  # pos+1 reaches n (in-bounds)
    r1, r2 = jax.jit(bv.rank_pair)(pos)
    exp = np.concatenate([[0], np.cumsum(bools)])
    np.testing.assert_array_equal(np.asarray(r1), exp[:n])
    np.testing.assert_array_equal(np.asarray(r2), exp[1 : n + 1])


@pytest.mark.parametrize("kind", ["plain", "rrr", "mef"])
def test_wavelet_rank_pair(kind):
    rng = np.random.default_rng(9)
    syms = rng.integers(0, 5, size=1500)
    wt = WaveletTree.build(syms, 5, kind)
    pos = jnp.arange(len(syms), dtype=jnp.int32)
    for c in range(5):
        r1, r2 = wt.rank_pair(jnp.full_like(pos, c), pos)
        exp = np.concatenate([[0], np.cumsum(syms == c)])
        np.testing.assert_array_equal(np.asarray(r1), exp[:-1], err_msg=f"c={c}")
        np.testing.assert_array_equal(np.asarray(r2), exp[1:], err_msg=f"c={c}")


def _rand_bits(n, seed):
    rng = np.random.default_rng(seed)
    bits = rng.random((4, n)) < 0.3
    bits[:, rng.random(n) < 0.2] = False  # some empty sets
    only = rng.random(n) < 0.4  # many unary columns (split's fast side)
    for j in np.flatnonzero(only):
        bits[:, j] = False
        bits[rng.integers(0, 4), j] = True
    return bits


@pytest.mark.parametrize(
    "variant",
    ["rrr-matrix", "mef-matrix", "plain-split", "rrr-split", "mef-split",
     "plain-concat", "mef-concat", "plain-subsetwt", "rrr-subsetwt"],
)
def test_struct_rank_pair(variant):
    from sbwt_tpu.models.subsetrank import build_struct

    bits = _rand_bits(800, 4)
    st = build_struct(variant, bits)
    if not hasattr(st, "rank_pair"):
        pytest.skip("no rank_pair for this structure")
    n = bits.shape[1]
    pos = jnp.arange(n, dtype=jnp.int32)
    for c in range(4):
        r1, r2 = jax.jit(st.rank_pair)(jnp.full_like(pos, c), pos)
        exp = np.concatenate([[0], np.cumsum(bits[c])])
        np.testing.assert_array_equal(np.asarray(r1), exp[:-1], err_msg=f"c={c}")
        np.testing.assert_array_equal(np.asarray(r2), exp[1:], err_msg=f"c={c}")
