#!/usr/bin/env python
"""Headline benchmark: fused NVFP4 dequant-GEMM vs bf16 GEMM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol mirrors the reference's kernel latency harness
(kernels/bench.py:13-43: decode-shape GEMM, quantize excluded from
timing) on the target hardware. vs_baseline is the speedup over a
plain bf16 jnp.dot with the same logical shape — the quantized
kernel's reason to exist (weights stream at 4.5 bits/elem vs 16).
"""

import json
import time

import jax
import jax.numpy as jnp


def _bench(fn, *args, warmup=3, iters=20, inner=32):
    """Per-op latency with dispatch overhead amortized: `inner` ops are
    chained inside one jit via scan over distinct inputs (so the weight
    stream — the quantity under test — re-runs every iteration)."""
    import jax.numpy as jnp

    x0 = args[0]
    xs = jnp.stack([x0 + i * 1e-6 for i in range(inner)])
    rest = args[1:]

    @jax.jit
    def loop(xs, *rest):
        def body(carry, x):
            y = fn(x, *rest)
            return carry + y[0, 0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return out

    for _ in range(warmup):
        jax.block_until_ready(loop(xs, *rest))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(xs, *rest)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * inner)


def main():
    from arcquant_tpu.quant import packing
    from arcquant_tpu.kernels import gemm, quantize as qk

    on_tpu = jax.default_backend() == "tpu"
    # Decode-bound GEMM shape (qwen2.5-7b o_proj-scale): M small,
    # N=K=4096 (reference kernels/bench.py uses N=K=4096).
    m, n, k = (32, 4096, 4096) if on_tpu else (8, 256, 512)
    ke = 0

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k), jnp.bfloat16) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)

    pw = packing.pack_weight_arc(w, ridx, ke)
    xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
    x_de = gemm.deinterleave_x(xa.astype(jnp.bfloat16))

    quant_fn = jax.jit(lambda xd, gs: gemm.gemm_dequant(xd, pw, gs))
    base_fn = jax.jit(
        lambda a, b: jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16))

    t_quant = _bench(quant_fn, x_de, gx)
    t_base = _bench(base_fn, x, w)

    speedup = t_base / t_quant
    print(json.dumps({
        "metric": "nvfp4_gemm_decode_latency",
        "value": round(t_quant * 1e6, 2),
        "unit": "us",
        "vs_baseline": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
