#!/usr/bin/env python
"""GEMM latency sweep over M — port of the reference's kernel latency
harness (kernels/bench.py:13-43: agemm.matmul timed for M in
{8..4096}, N=K=4096, quantize excluded).

Usage: python benchmarks/bench_gemm.py [--n 4096] [--k 4096]
       [--fmt w8] [--ke 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--fmt", default="w8", choices=["w4", "w8"])
    ap.add_argument("--ke", type=int, default=0)
    ap.add_argument("--ms", type=int, nargs="*",
                    default=[8, 16, 32, 64, 128, 256, 512, 1024, 2048,
                             4096])
    args = ap.parse_args()

    from arcquant_tpu.quant import packing
    from arcquant_tpu.kernels import gemm, quantize as qk
    from arcquant_tpu.utils.timing import bench_op

    n, k, ke = args.n, args.k, args.ke
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                          jnp.bfloat16) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)
    pw = packing.pack_weight_arc(w, ridx, ke, fmt=args.fmt)
    wT = w.T.copy()

    print(f"# N={n} K={k} KE={ke} fmt={args.fmt}")
    print(f"# {'M':>6} {'quant_us':>10} {'bf16_us':>10} {'speedup':>8}")
    for m in args.ms:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k),
                              jnp.bfloat16)
        xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
        xa = xa.astype(jnp.bfloat16)
        n2 = max(96, min(576, (1 << 24) // max(m, 1)))
        tq = bench_op(lambda xx: gemm.gemm_dequant(xx, pw, gx), xa,
                      n1=n2 // 3, n2=n2)
        tb = bench_op(
            lambda xx: jnp.dot(xx, wT,
                               preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16), x, n1=n2 // 3, n2=n2)
        print(f"  {m:>6} {tq*1e6:>10.2f} {tb*1e6:>10.2f} "
              f"{tb/tq:>8.2f}")


if __name__ == "__main__":
    main()
