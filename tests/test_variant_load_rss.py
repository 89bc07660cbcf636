"""Compressed-variant payloads carry their rank-structure metadata.

Loading an rrr-matrix structure at 100M columns must NOT materialize the
full 4n bool matrix to recompute base counts (the round-3 design decoded
every compressed vector on load — an O(n) transient the packed
plain-matrix path had already eliminated).  Verified with a hard
RLIMIT_AS cap in a subprocess: the metadata-carrying payload loads and
answers ranks inside the cap; the legacy payload (no base array) needs
~1.2 GB more for the bool decode and must NOT fit (guarding that the cap
actually discriminates).
"""
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_GEN = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.environ["REPO"])
    import numpy as np
    import jax; jax.config.update("jax_platforms", "cpu")
    from sbwt_tpu.models.subsetrank import MatrixRank
    n = int(sys.argv[1])
    rng = np.random.default_rng(1)
    bits = rng.random((4, n)) < 0.1
    mr = MatrixRank.from_bits(bits, "rrr")
    p = {k: np.asarray(v) for k, v in mr.payload().items()}
    np.savez(sys.argv[2], **p)
    del p["base"]  # legacy pre-round-4 payload shape
    np.savez(sys.argv[3], **p)
    pos = rng.integers(0, n, size=64)
    c = rng.integers(0, 4, size=64)
    r = np.array([int(bits[cc, :pp].sum()) for cc, pp in zip(c, pos)])
    np.savez(sys.argv[4], pos=pos, c=c, r=r)
    """
)

_LOAD = textwrap.dedent(
    """
    import resource, sys, os
    limit = int(sys.argv[1])
    resource.setrlimit(resource.RLIMIT_AS, (limit, limit))
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.environ["REPO"])
    import numpy as np
    import jax; jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sbwt_tpu.models.subsetrank import struct_from_payload
    d = np.load(sys.argv[2])
    mr = struct_from_payload("rrr-matrix", {k: d[k] for k in d.files})
    t = np.load(sys.argv[3])
    r = np.asarray(mr.rank(jnp.asarray(t["c"]), jnp.asarray(t["pos"])))
    assert np.array_equal(r, t["r"]), "rank mismatch after load"
    print("maxrss_mb", resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024)
    """
)


@pytest.mark.slow
def test_rrr_matrix_load_100m_columns_under_rss_cap(tmp_path):
    n = 100_000_000
    cap = 1600 * (1 << 20)  # new path needs ~370 MB RSS; legacy ~1.6 GB
    gen = str(tmp_path / "gen.py")
    load = str(tmp_path / "load.py")
    with open(gen, "w") as f:
        f.write(_GEN)
    with open(load, "w") as f:
        f.write(_LOAD)
    pay, legacy, truth = (
        str(tmp_path / "p.npz"), str(tmp_path / "l.npz"), str(tmp_path / "t.npz")
    )
    env = dict(os.environ)
    env["REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the test session forces 8 virtual CPU devices; 8 allocator arenas
    # would blow the subprocess address-space cap for reasons unrelated to
    # the load path under test
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, gen, str(n), pay, legacy, truth],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    ok = subprocess.run(
        [sys.executable, load, str(cap), pay, truth],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert ok.returncode == 0, ok.stderr[-3000:]

    # the legacy payload must NOT fit: proves the cap is tight enough that
    # an O(n) bool materialization would have failed the test above
    bad = subprocess.run(
        [sys.executable, load, str(cap), legacy, truth],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert bad.returncode != 0, "legacy bool-decode path unexpectedly fit the cap"
