#!/usr/bin/env python
"""Headline benchmark: fused NVFP4 dequant-GEMM vs bf16 GEMM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol mirrors the reference's kernel latency harness
(kernels/bench.py:13-43: decode-shape GEMM, quantize excluded from
timing). vs_baseline is the speedup over a plain bf16 jnp.dot with the
same logical shape.

Timing notes (hard-won on this environment):
  - block_until_ready does NOT wait for execution through the axon
    TPU tunnel; only a host fetch of a value does, and one fetch
    round-trip costs ~32 ms. Each measurement therefore runs a long
    serially-dependent scan inside ONE jit and is timed as the
    difference between two scan lengths, which cancels the constant
    dispatch+fetch overhead.
  - Each scan step's input depends on the previous step's FULL output
    (sum-coupled); consuming a single element lets XLA slice the
    whole GEMM away (it can, and does).
"""

import json
import time

import jax
import jax.numpy as jnp


def bench_op(f, x0, *rest, n1=64, n2=576):
    """Per-op latency via two-length scan difference (see module
    docstring)."""
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
    float(jnp.sum(l1(x0, *rest)))   # compile + warm
    float(jnp.sum(l2(x0, *rest)))

    def t(loop):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(loop(x0, *rest)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(l2) - t(l1)) / (n2 - n1)


def main():
    from arcquant_tpu.quant import packing
    from arcquant_tpu.kernels import gemm, quantize as qk

    on_tpu = jax.default_backend() == "tpu"
    # Decode-bound GEMM shape: M small, N=K=4096 (reference
    # kernels/bench.py uses N=K=4096).
    m, n, k = (32, 4096, 4096) if on_tpu else (8, 256, 512)
    ke = 0
    n1, n2 = (64, 576) if on_tpu else (2, 6)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                          jnp.bfloat16) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)

    pw = packing.pack_weight_arc(w, ridx, ke, fmt="w8")
    xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
    xa = xa.astype(jnp.bfloat16)
    wT = w.T.copy()

    # Two production decode paths, bit-exact (tests/test_kernels.py
    # test_dma_stream_matches_fused), selected by ARC_GEMM_DMA_M: the
    # auto-pipelined fused kernel and the manual-DMA-streamed kernel.
    # Measure both in ONE process (cross-process chip-state variance
    # is 10-20%) and report the faster.
    import os
    import sys
    os.environ[gemm._DMA_M_ENV] = "0"
    t_fused = bench_op(
        lambda xx: gemm.gemm_dequant(xx, pw, gx), xa, n1=n1, n2=n2)
    try:
        os.environ[gemm._DMA_M_ENV] = "64"
        t_dma = bench_op(
            lambda xx: gemm.gemm_dequant(xx, pw, gx), xa, n1=n1, n2=n2)
    except Exception as e:                      # noqa: BLE001
        print(f"dma path failed: {type(e).__name__}: {e}"[:200],
              file=sys.stderr)
        t_dma = float("inf")
    finally:
        os.environ[gemm._DMA_M_ENV] = "0"
    print(f"fused {t_fused*1e6:.2f} us, dma {t_dma*1e6:.2f} us",
          file=sys.stderr)
    t_quant = min(t_fused, t_dma)
    t_base = bench_op(
        lambda xx: jnp.dot(xx, wT, preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16), x, n1=n1, n2=n2)

    speedup = t_base / t_quant
    print(json.dumps({
        "metric": "nvfp4_gemm_decode_latency",
        "value": round(t_quant * 1e6, 2),
        "unit": "us",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
