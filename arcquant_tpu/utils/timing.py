"""Timing and profiling harnesses.

TPU replacement for the reference's NVTX ranges + CUDA-event timing
(modeling_arc.py:202-206, kernels/bench.py:32-41, SURVEY.md §5):
jax.profiler traces for kernel-level inspection, and a fetch-forced
two-length scan harness for latency (block_until_ready does not wait
through the axon TPU tunnel; a host value fetch does, at ~32 ms per
round trip — so ops are timed as the difference of two long
serially-dependent on-device loops).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def measure_roundtrip(repeats: int = 5) -> float:
    """Host<->device fetch round-trip latency (subtract from one-shot
    wall-clock measurements)."""
    s = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1)
    float(jnp.sum(f(s)))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jnp.sum(f(s)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_op(f: Callable, x0, *rest, n1: int = 64, n2: int = 576,
             repeats: int = 5) -> float:
    """Per-op latency via two-length scan difference.

    Each scan step's input depends on the previous step's FULL output
    (sum-coupled) so XLA cannot slice or hoist the op; the constant
    dispatch+fetch overhead cancels in the length difference."""
    def mkloop(length):
        @jax.jit
        def loop(x, *rest):
            def body(xc, _):
                y = f(xc, *rest)
                d = (jnp.sum(y.astype(jnp.float32)) * 1e-18).astype(
                    xc.dtype)
                return xc + d, None
            xo, _ = jax.lax.scan(body, x, None, length=length)
            return xo
        return loop

    l1, l2 = mkloop(n1), mkloop(n2)
    float(jnp.sum(l1(x0, *rest)))
    float(jnp.sum(l2(x0, *rest)))

    def t(loop):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(jnp.sum(loop(x0, *rest)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(l2) - t(l1)) / (n2 - n1)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/arcquant_trace"):
    """jax.profiler trace context (view with tensorboard / xprof) —
    the TPU analog of the reference's NVTX ranges."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
