#!/usr/bin/env python
"""Decode MLP megakernel A/B at qwen2.5-7b shapes.

Times the three-op production chain (gemm -> XLA silu*mul -> Pallas
act-quantize -> gemm) against kernels/mlp_fused.mlp_w8_fused at decode
batches, and cross-checks bit-exactness ON CHIP before timing.

  python -m benchmarks.mlp_lab [--ms 4,16]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", default="4,16")
    ap.add_argument("--d", type=int, default=3584)
    ap.add_argument("--f", type=int, default=18944)
    args = ap.parse_args()
    d, f = args.d, args.f

    key = jax.random.PRNGKey(0)
    w_gu = jax.random.normal(key, (2 * f, d), jnp.bfloat16) * 0.02
    w_dn = jax.random.normal(jax.random.PRNGKey(1), (d, f),
                             jnp.bfloat16) * 0.02
    ridx1 = jnp.arange(d, dtype=jnp.int32)
    ridx2 = jnp.arange(f, dtype=jnp.int32)
    pw_gu = packing.pack_weight_arc(w_gu, ridx1, 0, fmt="w8",
                                    w_scale="channel")
    pw_dn = packing.pack_weight_arc(w_dn, ridx2, 0, fmt="w8",
                                    w_scale="channel")
    print(f"kq1={pw_gu.kq} n1={pw_gu.n} kq2={pw_dn.kq} n2={pw_dn.n}",
          flush=True)

    for m in (int(s) for s in args.ms.split(",")):
        x = jax.random.normal(jax.random.PRNGKey(2), (m, d))
        xa1, gs1 = qk.quantize_x_arc(x, ridx1, 0, kq=pw_gu.kq,
                                     per_row=True)
        xa1 = xa1.astype(jnp.bfloat16)

        def chain(xx):
            gu = gemm.gemm_dequant(xx, pw_gu, gs1)
            prod = (jax.nn.silu(gu[:, :f].astype(jnp.float32))
                    * gu[:, f:].astype(jnp.float32)).astype(gu.dtype)
            xa2, gx2 = qk.quantize_x_arc(prod, ridx2, 0, kq=pw_dn.kq,
                                         per_row=True)
            return gemm.gemm_dequant(xa2, pw_dn, gx2)

        def mega(xx):
            return mlp_fused.mlp_w8_fused(xx, gs1, pw_gu, pw_dn, f)[0]

        ok = mlp_fused.mlp_fused_ok(pw_gu, pw_dn, m, f, True, 0)
        print(f"M={m}: dispatch gate (bk check) -> {ok}", flush=True)
        a = jax.jit(chain)(xa1)
        b = jax.jit(mega)(xa1)
        exact = bool(jnp.all(a == b))
        diff = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"M={m}: ON-CHIP bit-exact={exact} (max|d|={diff:.3e})",
              flush=True)

        # norm-mode (phase A inside): vs external rmsnorm quantize +
        # quantized-mode megakernel — the 1-ulp variance-reduce
        # question is ON-CHIP only (CPU parity already pinned)
        norm_w = (1.0 + 0.1 * jax.random.normal(
            jax.random.PRNGKey(5), (d,))).astype(jnp.bfloat16)
        x2 = jax.random.normal(jax.random.PRNGKey(6), (m, d),
                               jnp.bfloat16)

        def ext_then_mega(xx):
            a1, g1 = qk.rmsnorm_quantize_x(xx, norm_w, 1e-6, ridx1, 0,
                                           kq=pw_gu.kq, per_row=True)
            return mlp_fused.mlp_w8_fused(a1, g1, pw_gu, pw_dn, f)[0]

        def norm_mega(xx):
            return mlp_fused.mlp_w8_fused(
                xx, None, pw_gu, pw_dn, f, norm_w=norm_w,
                norm_eps=1e-6)[0]

        na = jax.jit(ext_then_mega)(x2)
        nb = jax.jit(norm_mega)(x2)
        nexact = bool(jnp.all(na == nb))
        ndiff = float(jnp.max(jnp.abs(
            na.astype(jnp.float32) - nb.astype(jnp.float32))))
        print(f"M={m}: NORM-mode bit-exact={nexact} "
              f"(max|d|={ndiff:.3e})", flush=True)

        t_chain = bench_op(chain, xa1, n1=32, n2=160)
        t_mega = bench_op(mega, xa1, n1=32, n2=160)
        t_ext = bench_op(ext_then_mega, x2, n1=32, n2=160)
        t_norm = bench_op(norm_mega, x2, n1=32, n2=160)
        print(f"M={m}: chain {t_chain*1e6:8.2f} us | megakernel "
              f"{t_mega*1e6:8.2f} us | {t_chain/t_mega:.3f}x",
              flush=True)
        print(f"M={m}: ext-norm+mega {t_ext*1e6:8.2f} us | norm-mode "
              f"{t_norm*1e6:8.2f} us | {t_ext/t_norm:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
