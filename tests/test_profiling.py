"""Profiling/observability utilities (utils/profiling.py)."""
import io
import time

import numpy as np

from sbwt_tpu.utils.profiling import ProgressPrinter, ThroughputMeter, annotate


def test_throughput_meter_two_views():
    m = ThroughputMeter()
    with m.measure(1000):
        time.sleep(0.01)
    assert m.n_queries == 1000
    assert m.us_per_query_device() >= 10  # 10ms / 1000
    assert m.us_per_query_total() >= m.us_per_query_device()
    assert m.queries_per_sec_device() > 0


def test_progress_printer_monotone_to_100():
    buf = io.StringIO()
    p = ProgressPrinter(37, stream=buf)
    for _ in range(37):
        p.job_done()
    out = buf.getvalue()
    assert "0%" in out and "100%" in out


def test_annotate_usable_without_device():
    with annotate("test-span"):
        pass


def test_trace_writes_dir(tmp_path):
    import jax
    import jax.numpy as jnp

    from sbwt_tpu.utils.profiling import trace

    d = str(tmp_path / "trace")
    with trace(d):
        jax.block_until_ready(jnp.arange(8) * 2)
    import os

    assert os.path.isdir(d)
