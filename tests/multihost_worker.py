"""Worker process for the real multi-process multihost test.

Each process: joins the jax.distributed cluster, loads the index from
disk, reads ONLY its own slice of the query files, runs the distributed
streaming search over the global (cross-process) mesh, and writes its
local shard of the answers — the full multihost flow from the module
docstring of sbwt_tpu/parallel/multihost.py, with no step faked.

Usage: multihost_worker.py <pid> <nproc> <port> <index> <outdir> <pad> <qfiles...>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
index_path, outdir, pad = sys.argv[4], sys.argv[5], int(sys.argv[6])
qfiles = sys.argv[7:]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from sbwt_tpu.parallel import multihost, sharded  # noqa: E402
from sbwt_tpu.io import seqio  # noqa: E402
from sbwt_tpu.io.serialize import load  # noqa: E402
from sbwt_tpu.utils.dna import encode_query  # noqa: E402

multihost.init_multihost(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()

sbwt = load(index_path)  # every host loads its own copy from disk
assert multihost.all_hosts_agree(sbwt.number_of_subsets())

# ---- host-local input: only this host's slice of the query files --------
mine = multihost.my_read_slice(qfiles)
reads = []
for qf in mine:
    reads.extend(s.decode() for s in seqio.read_sequences(qf))
L = 120
codes = np.full((len(reads), L), -1, dtype=np.int8)
lengths = np.zeros(len(reads), dtype=np.int32)
for i, r in enumerate(reads):
    enc = encode_query(r)[:L]
    codes[i, : len(enc)] = enc
    lengths[i] = len(enc)

mesh = multihost.global_mesh()
index = multihost.replicate_index_global(sbwt.device_index, mesh)

# ---- DP: global batch assembled from process-local shards ---------------
ans = multihost.distributed_streaming_search(
    index,
    np.ascontiguousarray(codes),
    lengths,
    mesh,
)
# local_shard returns this host's contiguous row ranges; pad rows (from
# global_batch_from_local's equalization) answer all -1 and are dropped
# by row count.
local = multihost.local_shard(ans)[: len(reads)]

with open(os.path.join(outdir, f"dp_out_{pid}.txt"), "w") as f:
    for i in range(len(reads)):
        n_ans = lengths[i] - sbwt.k + 1
        f.write("".join(f"{int(v)} " for v in local[i, : max(0, n_ans)]) + "\n")

# ---- TP: row-sharded index across the global model axis -----------------
mesh_tp = multihost.global_mesh(n_model=2)
g_codes = multihost.global_batch_from_local(codes, mesh_tp, pad_to=pad)
g_lens = multihost.global_batch_from_local(lengths, mesh_tp, pad_to=pad)
tp_index = sharded.shard_index_rows(sbwt.device_index, mesh_tp)
tp_ans = sharded.tp_streaming_search(tp_index, g_codes, g_lens, mesh_tp)
tp_local = multihost.local_shard(tp_ans)[: len(reads)]

with open(os.path.join(outdir, f"tp_out_{pid}.txt"), "w") as f:
    for i in range(len(reads)):
        n_ans = lengths[i] - sbwt.k + 1
        f.write("".join(f"{int(v)} " for v in tp_local[i, : max(0, n_ans)]) + "\n")

print(f"worker {pid} done: {len(reads)} reads", flush=True)
