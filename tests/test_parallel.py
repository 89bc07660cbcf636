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


def test_build_turbo_sharded_matches_single_device(sbwt, batch):
    """Per-shard table BUILD (each device expands its own column range
    from the replicated 1-step successor map): the aggregate table can
    exceed one device's HBM, and answers must equal the single-device
    turbo engine bit for bit."""
    from sbwt_tpu.ops.turbo import build_turbo, turbo_streaming_jit
    from sbwt_tpu.parallel import sharded

    codes, lengths = batch
    for arity in (2, 3):
        ref_turbo = build_turbo(sbwt.device_index, arity=arity)
        ref = np.asarray(
            turbo_streaming_jit(ref_turbo, sbwt.device_index, codes, lengths)
        )
        mesh = sharded.make_mesh(n_data=2, n_model=4)
        tsh = sharded.build_turbo_sharded(sbwt.device_index, mesh, arity=arity)
        assert sharded.is_turbo_row_sharded(tsh, mesh)
        # the sharded build's rows must agree with the single-device table
        # on every real column's rows (shard padding may differ)
        rpc = 4**arity
        n = sbwt.device_index.n_nodes
        got_tbl = np.asarray(tsh.tbl)
        want_tbl = np.asarray(ref_turbo.tbl)
        cps = tsh.tbl.shape[0] // 4 // rpc  # 4 model shards
        for shard in range(4):
            lo_col = shard * cps
            hi_col = min(n, (shard + 1) * cps)
            if lo_col >= n:
                break
            got_rows = got_tbl[shard * cps * rpc:][: (hi_col - lo_col) * rpc]
            want_rows = want_tbl[lo_col * rpc : hi_col * rpc]
            np.testing.assert_array_equal(got_rows, want_rows, err_msg=f"shard {shard}")
        got = sharded.tp_turbo_streaming_search(
            tsh, sbwt.device_index, codes, lengths, mesh
        )
        np.testing.assert_array_equal(np.asarray(got), ref, err_msg=f"arity {arity}")


def test_build_turbo_sharded_exceeds_per_device_budget(sbwt, batch):
    """The configuration the sharded build exists for: an aggregate table
    bigger than any single device's (declared) budget, never materialized
    on one device.  Each shard must fit the budget while the total does
    not."""
    from sbwt_tpu.ops.turbo import turbo_streaming_jit
    from sbwt_tpu.parallel import sharded
    from sbwt_tpu.ops.search import streaming_search_jit

    codes, lengths = batch
    mesh = sharded.make_mesh(n_data=1, n_model=8)
    tsh = sharded.build_turbo_sharded(sbwt.device_index, mesh, arity=3)
    total_bytes = tsh.tbl.size * 4
    per_shard_bytes = total_bytes // 8
    declared_budget = per_shard_bytes * 2  # any one device can hold 2 shards, not 8
    assert per_shard_bytes <= declared_budget < total_bytes
    for db_shard in tsh.tbl.addressable_shards:
        assert db_shard.data.size * 4 <= declared_budget
    ref = np.asarray(streaming_search_jit(sbwt.device_index, codes, lengths))
    got = sharded.tp_turbo_streaming_search(
        tsh, sbwt.device_index, codes, lengths, mesh
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_turbo_int32_ceiling_guards(sbwt):
    """build_turbo and the TP shard placement must refuse configurations
    whose flat row index col * 4^arity + sub would overflow int32
    (ops/turbo.py check_turbo_index_range) instead of silently wrapping."""
    import dataclasses

    import pytest as _pytest

    from sbwt_tpu.ops.turbo import build_turbo, check_turbo_index_range
    from sbwt_tpu.parallel import sharded

    check_turbo_index_range(2**25 - 1, 3)  # fits
    with _pytest.raises(ValueError, match="int32"):
        check_turbo_index_range(2**25, 3)
    with _pytest.raises(ValueError, match="int32"):
        check_turbo_index_range(2**27, 2)
    check_turbo_index_range(2**30, 1)  # arity 1 indexes by bare column

    fake_big = dataclasses.replace(sbwt.device_index, n_nodes=2**26)
    with _pytest.raises(ValueError, match="int32"):
        build_turbo(fake_big, arity=3)

    # per-shard guard: 8 shards of 2^25 columns at arity 3 would each
    # overflow; the sharded build must refuse before allocating
    mesh = sharded.make_mesh(n_data=1, n_model=8)
    fake_huge = dataclasses.replace(sbwt.device_index, n_nodes=2**28)
    with _pytest.raises(ValueError, match="shard"):
        sharded.build_turbo_sharded(fake_huge, mesh, arity=3)
