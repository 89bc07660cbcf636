"""Multi-host layer tests (single-process degenerate mode on the virtual
8-device CPU mesh; the cross-process wiring is jax.distributed config).
"""
import numpy as np
import jax

from sbwt_tpu.models.sbwt import SBWT
from sbwt_tpu.parallel import multihost, sharded
from sbwt_tpu.utils.dna import encode_query

SEQS = ["CCCGTGATGGCTAGCTAGCTGATCGATCGTACGTACGTAGCTAGCATCG" * 2, "TAATGCTGTAGCAAAGGCTTAC"]
K = 7


def _batch(n=16, L=96, seed=5):
    rng = np.random.default_rng(seed)
    codes = np.full((n, L), -1, dtype=np.int8)
    lengths = np.zeros(n, dtype=np.int32)
    for i in range(n):
        if rng.random() < 0.5:
            s = SEQS[0][: int(rng.integers(30, L))]
        else:
            s = "".join(rng.choice(list("ACGT"), size=int(rng.integers(30, L))))
        codes[i, : len(s)] = encode_query(s)
        lengths[i] = len(s)
    return codes, lengths


def test_my_read_slice_partition():
    items = list(range(10))
    got = [multihost.my_read_slice(items, process_id=p, n=4) for p in range(4)]
    assert [x for part in got for x in part] == items
    assert max(len(p) for p in got) - min(len(p) for p in got) <= 3


def test_global_batch_roundtrip():
    mesh = multihost.global_mesh()
    codes, _ = _batch()
    g = multihost.global_batch_from_local(codes, mesh)
    assert g.shape == codes.shape
    assert np.array_equal(multihost.local_shard(g), codes)


def test_distributed_streaming_matches_single_device():
    sbwt = SBWT.build(SEQS, K, precalc_k=3)
    codes, lengths = _batch()
    want = sbwt.streaming_search_batch(codes, lengths)
    mesh = multihost.global_mesh()
    index = multihost.replicate_index_global(sbwt.device_index, mesh)
    ans = multihost.distributed_streaming_search(index, codes, lengths, mesh)
    assert np.array_equal(multihost.local_shard(ans), want)


def test_distributed_turbo_matches_single_device():
    from sbwt_tpu.ops.turbo import build_turbo

    sbwt = SBWT.build(SEQS, K, precalc_k=3)
    codes, lengths = _batch()
    want = sbwt.streaming_search_batch(codes, lengths)
    mesh = multihost.global_mesh()
    turbo = build_turbo(sbwt.device_index)
    ans = multihost.distributed_turbo_streaming_search(
        turbo, sbwt.device_index, codes, lengths, mesh
    )
    assert np.array_equal(multihost.local_shard(ans), want)


def test_all_hosts_agree_single_process():
    assert multihost.all_hosts_agree(12345)


def test_init_multihost_single_process_noop():
    multihost.init_multihost(num_processes=1)


def test_local_shard_dedups_model_axis_replicas():
    """P('data', None)-sharded arrays on a (data, model>1) mesh replicate
    each row range across the model axis; local_shard must return every
    range exactly once."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sharded.make_mesh(n_data=4, n_model=2)
    x = np.arange(32, dtype=np.int32).reshape(16, 2)
    g = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", None)))
    assert np.array_equal(multihost.local_shard(g), x)
