#!/usr/bin/env python
"""Prefill component budget at qwen2.5-7b bs=4 x 1024 shapes.

Times each per-layer component of the prefill step in isolation (two-
length-scan harness) so the 14/28-layer prefill can be attributed:
activation quantize sites, the four GEMMs (XLA-dispatch path vs the
fused Pallas kernel vs plain bf16), flash attention, norms, KV append.

The weight dequant of the XLA path is loop-INVARIANT inside the scan,
so `optimization_barrier` ties the codes to the carry — without it
XLA hoists the dequant out and the measurement lies.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.quant import packing
from arcquant_tpu.kernels import gemm, quantize as qk
from arcquant_tpu.kernels.attention import flash_attention
from arcquant_tpu.utils.timing import bench_op


def main():
    cfg = get_model_config("qwen2.5-7b")
    b, t = 4, 1024
    m = b * t
    key = jax.random.PRNGKey(0)
    d, qs, kvs, inter = (cfg.hidden_size, cfg.q_size, cfg.kv_size,
                         cfg.intermediate_size)

    total = {}

    def rec(name, f, x0, *rest, mult=1, n1=4, n2=20):
        dt = bench_op(f, x0, *rest, n1=n1, n2=n2)
        print(f"{name:34s} {dt*1e3:9.3f} ms  x{mult:2d} ="
              f" {dt*1e3*mult:8.2f} ms", flush=True)
        total[name] = dt * mult
        return dt

    x = jax.random.normal(key, (m, d), jnp.bfloat16)
    ridx_d = jnp.arange(d, dtype=jnp.int32)
    ridx_i = jnp.arange(inter, dtype=jnp.int32)

    # --- activation quantize sites (the ENGINE's actual four) ---
    wnorm_d = jnp.ones((d,), jnp.bfloat16)
    rec("rmsnormq d=3584 (attn/mlp_in)", lambda xx: qk.
        rmsnorm_quantize_x(xx, wnorm_d, 1e-6, ridx_d, 0,
                           per_row=True)[0], x, mult=2)
    rec("quantize_x d=3584 (o_in)", lambda xx: qk.quantize_x_arc(
        xx, ridx_d, 0, per_row=True)[0], x, mult=1)
    xi = jax.random.normal(key, (m, inter), jnp.bfloat16)
    rec("quantize_x d=18944", lambda xx: qk.quantize_x_arc(
        xx, ridx_i, 0, per_row=True)[0], xi, mult=0)
    # down_in: fused silu-gu kernel vs the defused XLA-product path
    # (VERDICT r5: the r4 trace shows ~2.34 ms/layer in _actq_call at
    # prefill M — 6x the 0.38 ms gu-read floor; attribute it)
    gu = jax.random.normal(key, (m, 2 * inter), jnp.bfloat16)
    os.environ["ARC_SILU_GU_DEFUSE_M"] = "0"
    qk._silu_gu_defuse_m.cache_clear()
    rec("silu-gu fused (down_in)", lambda g: qk.silu_mul_quantize_gu(
        g, ridx_i, 0, per_row=True)[0], gu, mult=1)
    os.environ["ARC_SILU_GU_DEFUSE_M"] = str(1 << 30)
    qk._silu_gu_defuse_m.cache_clear()
    rec("silu-gu DEFUSED (down_in)", lambda g: qk.silu_mul_quantize_gu(
        g, ridx_i, 0, per_row=True)[0], gu, mult=0)
    os.environ.pop("ARC_SILU_GU_DEFUSE_M")
    qk._silu_gu_defuse_m.cache_clear()
    rec("XLA silu*mul alone", lambda g: (
        jax.nn.silu(g[:, :inter].astype(jnp.float32))
        * g[:, inter:].astype(jnp.float32)).astype(g.dtype),
        gu, mult=0)

    # --- the four GEMMs, three ways ---
    shapes = {"qkv": (qs + 2 * kvs, d), "o": (d, qs),
              "gateup": (2 * inter, d), "down": (d, inter)}
    for name, (n, k) in shapes.items():
        w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                              jnp.bfloat16) * 0.02
        ridx = jnp.arange(k, dtype=jnp.int32)
        pw = packing.pack_weight_arc(w, ridx, 0, fmt="w8",
                                     w_scale="channel")
        xa, gx = qk.quantize_x_arc(
            jax.random.normal(key, (m, k), jnp.bfloat16), ridx, 0,
            kq=pw.kq, per_row=True)
        xa = xa.astype(jnp.bfloat16)
        wT = w.T.copy()

        def xla_path(xx, codes, pw=pw, gx=gx):
            codes = jax.lax.optimization_barrier((xx, codes))[1]
            pw2 = pw._replace(codes=codes)
            return gemm.gemm_dequant(xx, pw2, gx)

        os.environ["ARC_GEMM_XLA_M"] = "512"
        rec(f"{name} XLA-dispatch N={n} K={k}", xla_path, xa, pw.codes)
        os.environ["ARC_GEMM_XLA_M"] = "0"
        rec(f"{name} fused-kernel", xla_path, xa, pw.codes)
        os.environ["ARC_GEMM_XLA_M"] = "512"
        rec(f"{name} bf16 dot", lambda xx, wT: jnp.dot(
            xx, wT, preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16), x if k == d else xi, wT)

    # --- attention ---
    q4 = jax.random.normal(key, (b, t, cfg.num_heads, cfg.head_dim),
                           jnp.bfloat16)
    k4 = jax.random.normal(key, (b, t, cfg.num_kv_heads, cfg.head_dim),
                           jnp.bfloat16)
    rec("flash attention", lambda qq: flash_attention(qq, k4, k4),
        q4, mult=1)

    # --- norms ---
    wnorm = jnp.ones((d,), jnp.bfloat16)
    x3 = x.reshape(b, t, d)
    rec("rms_norm", lambda xx: llama.rms_norm(xx, wnorm, cfg.rms_eps),
        x3, mult=2)

    per_layer = (total.get("rmsnormq d=3584 (attn/mlp_in)", 0)
                 + total.get("quantize_x d=3584 (o_in)", 0)
                 + total.get("silu-gu fused (down_in)", 0)
                 + sum(v for k2, v in total.items()
                       if "XLA-dispatch" in k2)
                 + total.get("flash attention", 0))
    print(f"\nper-layer (quant path, XLA GEMMs): {per_layer*1e3:.2f} "
          f"ms -> x14 = {per_layer*14*1e3:.1f} ms")
    bf = (sum(v for k2, v in total.items() if "bf16 dot" in k2)
          + total.get("flash attention", 0)
          + total.get("rms_norm", 0))
    print(f"per-layer (bf16):                  {bf*1e3:.2f} ms "
          f"-> x14 = {bf*14*1e3:.1f} ms")


if __name__ == "__main__":
    main()
