#!/usr/bin/env python
"""On-chip A/B for the single-GEMM megakernels (attn_in norm+quantize
+qkv and o_in quantize+o) at qwen2.5-7b decode shapes: bit-exactness
vs the two-op chain, then timings."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from arcquant_tpu.kernels import gemm, mlp_fused
from arcquant_tpu.kernels import quantize as qk
from arcquant_tpu.quant import packing
from arcquant_tpu.utils.timing import bench_op


def main():
    d, n_qkv, n_o = 3584, 4608, 3584
    m = 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x2 = jax.random.normal(ks[0], (m, d), jnp.bfloat16)
    ridx = jnp.arange(d, dtype=jnp.int32)
    w_qkv = jax.random.normal(ks[1], (n_qkv, d), jnp.bfloat16) * 0.02
    b_qkv = jax.random.normal(ks[2], (n_qkv,), jnp.bfloat16)
    w_o = jax.random.normal(ks[3], (n_o, d), jnp.bfloat16) * 0.02
    pw_qkv = packing.pack_weight_arc(w_qkv, ridx, 0, bias=b_qkv,
                                     fmt="w8", w_scale="channel")
    pw_o = packing.pack_weight_arc(w_o, ridx, 0, fmt="w8",
                                   w_scale="channel")
    norm_w = (1.0 + 0.1 * jax.random.normal(
        jax.random.PRNGKey(5), (d,))).astype(jnp.bfloat16)
    eps = 1e-6

    def qkv_chain(xx):
        xa, gx = qk.rmsnorm_quantize_x(xx, norm_w, eps, ridx, 0,
                                       kq=pw_qkv.kq, per_row=True)
        return gemm.gemm_dequant(xa, pw_qkv, gx)

    def qkv_mega(xx):
        return mlp_fused.gemm_w8_actq_fused(
            xx, pw_qkv, d, norm_w=norm_w, norm_eps=eps)[0]

    def o_chain(xx):
        xa, gx = qk.quantize_x_arc(xx, ridx, 0, kq=pw_o.kq,
                                   per_row=True)
        return gemm.gemm_dequant(xa, pw_o, gx)

    def o_mega(xx):
        return mlp_fused.gemm_w8_actq_fused(xx, pw_o, d)[0]

    for name, chain, mega in (("qkv(norm)", qkv_chain, qkv_mega),
                              ("o(plain)", o_chain, o_mega)):
        a = jax.jit(chain)(x2)
        b = jax.jit(mega)(x2)
        exact = bool(jnp.all(a == b))
        diff = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"{name}: ON-CHIP bit-exact={exact} (max|d|={diff:.1e})",
              flush=True)
        tc = bench_op(chain, x2, n1=64, n2=320)
        tm = bench_op(mega, x2, n1=64, n2=320)
        print(f"{name}: chain {tc*1e6:7.2f} us | megakernel "
              f"{tm*1e6:7.2f} us | {tc/tm:.3f}x", flush=True)


if __name__ == "__main__":
    main()
