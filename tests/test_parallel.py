"""Sharding tests on a virtual 8-device CPU mesh.

Data-parallel and tensor-parallel (row-sharded) query execution must equal
single-device results exactly.
"""
import numpy as np
import pytest
import jax

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.parallel import sharded
from sbwt_tpu.utils.dna import encode_query

SEQS = ["CCCGTGATGGCTAGCTAGCTGATCGATCGTACGTACGTAGCTAGCATCG" * 3, "TAATGCTGTAGCAAAGGCTTAC"]
K = 8


@pytest.fixture(scope="module")
def sbwt():
    return SBWT.build(SEQS, K, precalc_k=3)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(42)
    reads = []
    for _ in range(16):
        if rng.random() < 0.5:
            s = SEQS[0][int(rng.integers(0, 20)) : int(rng.integers(40, 120))]
        else:
            s = "".join(rng.choice(list("ACGT"), size=64))
        reads.append(s)
    L = 160
    codes = np.full((16, L), -1, dtype=np.int8)
    lengths = np.zeros(16, dtype=np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_query(r)
        lengths[i] = len(r)
    return codes, lengths


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dp_search_matches_single_device(sbwt, batch):
    codes, lengths = batch
    kmers = codes[:, :K]
    want = sbwt.search_batch(kmers)
    mesh = sharded.make_mesh(n_data=8, n_model=1)
    index = sharded.replicate_index(sbwt.device_index, mesh)
    got = np.asarray(sharded.dp_search(index, kmers, mesh))
    assert np.array_equal(got, want)


def test_dp_streaming_matches_single_device(sbwt, batch):
    codes, lengths = batch
    want = sbwt.streaming_search_batch(codes, lengths)
    mesh = sharded.make_mesh(n_data=8, n_model=1)
    index = sharded.replicate_index(sbwt.device_index, mesh)
    got = np.asarray(sharded.dp_streaming_search(index, codes, lengths, mesh))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (2, 4), (1, 8)])
def test_tp_search_matches_single_device(sbwt, batch, n_data, n_model):
    codes, lengths = batch
    kmers = codes[:, :K]
    want = sbwt.search_batch(kmers)
    mesh = sharded.make_mesh(n_data=n_data, n_model=n_model)
    got = np.asarray(sharded.tp_search(sbwt.device_index, kmers, mesh))
    assert np.array_equal(got, want)


def test_tp_streaming_matches_single_device(sbwt, batch):
    codes, lengths = batch
    want = sbwt.streaming_search_batch(codes, lengths)
    mesh = sharded.make_mesh(n_data=4, n_model=2)
    got = np.asarray(
        sharded.tp_streaming_search(sbwt.device_index, codes, lengths, mesh)
    )
    assert np.array_equal(got, want)


def test_dp_turbo_matches_single_device(sbwt, batch):
    import jax.numpy as jnp
    from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_jit

    codes, lengths = batch
    turbo = build_turbo(sbwt.device_index)
    expected = np.asarray(
        turbo_streaming_jit(
            turbo, sbwt.device_index, jnp.asarray(codes), jnp.asarray(lengths)
        )
    )
    mesh = sharded.make_mesh(n_data=8, n_model=1)
    got = np.asarray(
        sharded.dp_turbo_streaming_search(
            turbo, sbwt.device_index, codes, lengths, mesh
        )
    )
    np.testing.assert_array_equal(got, expected)


def test_shard_index_rows_idempotent(sbwt):
    """The TP entry points must accept a pre-sharded index without
    re-placing it (a second device_put costs real time on big meshes)."""
    from sbwt_tpu.parallel import sharded

    mesh = sharded.make_mesh(n_data=4, n_model=2)
    index = sbwt.device_index
    s1 = sharded.shard_index_rows(index, mesh)
    assert sharded.is_row_sharded(s1, mesh)
    s2 = sharded.shard_index_rows(s1, mesh)
    assert s2 is s1


def test_tp_turbo_streaming_matches_reference(sbwt, batch):
    """Row-sharded turbo successor table (TPTurboView): per-device table
    cost drops with the model-axis size; answers must equal the
    single-device turbo engine bit for bit."""
    import jax

    from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_jit
    from sbwt_tpu.parallel import sharded

    codes, lengths = batch
    ref_turbo = build_turbo(sbwt.device_index, arity=1)
    ref = np.asarray(
        turbo_streaming_jit(ref_turbo, sbwt.device_index, codes, lengths)
    )
    for n_data, n_model in [(4, 2), (2, 4)]:
        mesh = sharded.make_mesh(n_data=n_data, n_model=n_model)
        got = sharded.tp_turbo_streaming_search(
            ref_turbo, sbwt.device_index, codes, lengths, mesh
        )
        np.testing.assert_array_equal(np.asarray(got), ref, err_msg=f"{n_data}x{n_model}")
    # arity 3 as well (flat table layout)
    t3 = build_turbo(sbwt.device_index, arity=3)
    ref3 = np.asarray(turbo_streaming_jit(t3, sbwt.device_index, codes, lengths))
    mesh = sharded.make_mesh(n_data=2, n_model=4)
    got3 = sharded.tp_turbo_streaming_search(t3, sbwt.device_index, codes, lengths, mesh)
    np.testing.assert_array_equal(np.asarray(got3), ref3)
