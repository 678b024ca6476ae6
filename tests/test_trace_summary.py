"""Trace summarizer: aggregation + device-pid detection on a
synthetic chrome trace, and end-to-end on a real jax.profiler trace."""

import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))
from trace_summary import load_events, summarize  # noqa: E402


def test_summarize_synthetic(tmp_path):
    ev = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 10.0},
        {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 30.0},
        {"ph": "X", "pid": 1, "name": "copy.2", "dur": 5.0},
        {"ph": "X", "pid": 2, "name": "host_thing", "dur": 99.0},
        {"ph": "X", "pid": 1, "name": "$file.py:3 frame",
         "dur": 1000.0},                      # frame noise: dropped
        {"ph": "B", "pid": 1, "name": "open_span"},  # non-X: dropped
    ]
    p = tmp_path / "t.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": ev}, f)
    rows, dev = summarize(load_events(str(p)))
    assert dev == {1}
    table = {name: (tot, cnt) for name, tot, cnt, _ in rows}
    assert table == {"fusion.1": (40.0, 2), "copy.2": (5.0, 1)}
    # host events included with device_only=False
    rows2, _ = summarize(load_events(str(p)), device_only=False)
    assert any(n == "host_thing" for n, *_ in rows2)


def test_summarize_real_trace(tmp_path):
    import jax
    import jax.numpy as jnp
    from arcquant_tpu.utils.timing import profile_trace
    d = str(tmp_path / "trace")
    with profile_trace(d):
        x = jnp.ones((128, 128), jnp.float32)
        f = jax.jit(lambda a: (a @ a).sum())
        for _ in range(3):
            float(f(x))
    rows, _ = summarize(load_events(d))
    assert rows, "no events parsed from a real profiler trace"
    assert all(cnt >= 1 and tot >= 0 for _, tot, cnt, _ in rows)
