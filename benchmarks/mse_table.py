#!/usr/bin/env python
"""Algorithm-level MSE table — port of the reference's fake-quant
experiment harness (kernels/fake.py:64-216): linear-layer output MSE
of NVFP4+ARC at increasing compensated-channel counts k, against
FP32 / INT8 / INT4 / W4A16 / plain-NVFP4 baselines, on a synthetic
outlier-tail activation distribution.

Usage: python benchmarks/mse_table.py [--m 128] [--n 4096] [--k 4096]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def synthetic_outliers(key, m, k, frac=0.0625, scale=20.0):
    """Gaussian activations with a planted outlier tail in the last
    frac*k channels (reference kernels/main.py:14-18)."""
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (m, k), jnp.float32)
    n_out = int(k * frac)
    boost = jax.random.normal(k2, (m, n_out), jnp.float32) * scale
    return x.at[:, -n_out:].add(boost)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--ks", type=int, nargs="*",
                    default=[0, 64, 128, 256, 512, 1024, 2048])
    args = ap.parse_args()

    from arcquant_tpu.quant import arc, numerics as N

    m, n, k = args.m, args.n, args.k
    x = synthetic_outliers(jax.random.PRNGKey(0), m, k)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                          jnp.float32) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)   # outliers at end
    y_true = x @ w.T

    def mse(y):
        return float(jnp.mean((y - y_true) ** 2))

    def int8_qdq(t):
        s = jnp.max(jnp.abs(t)) / 127.0
        return jnp.round(t / s).clip(-127, 127) * s

    rows = []
    rows.append(("fp32", mse(y_true)))
    rows.append(("int8 (w8a8 per-tensor)",
                 mse(int8_qdq(x) @ int8_qdq(w).T)))
    rows.append(("int4 (w4a4 group128)",
                 mse(N.int4_group_qdq(x) @ N.int4_group_qdq(w).T)))
    rows.append(("w4a16 (nvfp4 weights)",
                 mse(x @ N.quantize_tensor_qdq(w, "NVFP4").T)))
    rows.append(("nvfp4 w4a4",
                 mse(N.quantize_tensor_qdq(x, "NVFP4")
                     @ N.quantize_tensor_qdq(w, "NVFP4").T)))
    for ke in args.ks:
        if ke > k:
            continue
        rows.append((f"nvfp4+arc k={ke}",
                     mse(arc.arc_linear_fake(x, w, ridx, ke))))

    width = max(len(r[0]) for r in rows)
    print(f"# M={m} N={n} K={k}, outlier tail 6.25% x20")
    for name, v in rows:
        print(f"  {name:<{width}}  {v:12.6f}")


if __name__ == "__main__":
    main()
