#!/usr/bin/env python
"""Root-cause lab: why does the fused silu-gu act-quantize cost
~41 us at decode shapes (M=4, F=18944) when the plain kernel at
K=3584 costs ~4 us (results/r4/decode_profile2.log)?

Hypotheses probed (all select_num=0, per_row=True, bf16 in):
  A. width: the plain kernel at K=18944 already costs ~proportional
     (then the qdq chain per-element cost dominates, not silu)
  B. exp: jax.nn.silu's exp lowers expensively in Mosaic (probe the
     silu_mul mode with silu monkeypatched to identity — timing only,
     numerics meaningless)
  C. de-fuse: XLA silu*mul (tiny [4, F] elementwise) feeding the
     plain Pallas kernel beats the fused silu_mul mode at decode
     shapes (if B holds, this is the no-new-kernel fix; the fused
     mode stays for prefill where it saves HBM passes)

Run from the repo root (cwd, no PYTHONPATH — axon breaks under it).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from arcquant_tpu.kernels import quantize as qk
from arcquant_tpu.utils.timing import bench_op


def main():
    b, f = 4, 18944
    key = jax.random.PRNGKey(0)
    gu = jax.random.normal(key, (b, 2 * f), jnp.bfloat16)
    ridx = jnp.arange(f, dtype=jnp.int32)
    prod = (jax.nn.silu(gu[:, :f].astype(jnp.float32))
            * gu[:, f:].astype(jnp.float32)).astype(jnp.bfloat16)

    def t(name, fn, x0, *rest):
        dt = bench_op(fn, x0, *rest)
        print(f"{name:44s} {dt*1e6:9.2f} us", flush=True)
        return dt

    # current engine path
    t("silu_mul_gu fused [pallas]",
      lambda g: qk.silu_mul_quantize_gu(g, ridx, 0, per_row=True)[0],
      gu)
    # A: plain kernel at the same width
    t("plain actq K=18944 [pallas]",
      lambda p: qk.quantize_x_arc(p, ridx, 0, per_row=True)[0], prod)
    t("plain actq K=3584 [pallas]",
      lambda p: qk.quantize_x_arc(p, jnp.arange(3584, dtype=jnp.int32),
                                  0, per_row=True)[0],
      jax.random.normal(key, (b, 3584), jnp.bfloat16))
    # C: XLA silu*mul feeding the plain kernel (fusion boundary incl.)
    t("XLA silu*mul -> plain actq [defused]",
      lambda g: qk.quantize_x_arc(
          (jax.nn.silu(g[:, :f].astype(jnp.float32))
           * g[:, f:].astype(jnp.float32)).astype(g.dtype),
          ridx, 0, per_row=True)[0], gu)
    # XLA silu*mul alone (the de-fused path's added producer cost)
    t("XLA silu*mul alone",
      lambda g: (jax.nn.silu(g[:, :f].astype(jnp.float32))
                 * g[:, f:].astype(jnp.float32)).astype(g.dtype), gu)
    # B: exp cost inside the kernel — monkeypatch silu to identity
    # (timing-only; numbers are NOT numerics-valid)
    real_silu = jax.nn.silu
    try:
        jax.nn.silu = lambda x: x
        try:
            qk._actq_call.clear_cache()
        except AttributeError:
            pass
        t("silu_mul_gu fused, silu=identity [timing]",
          lambda g: qk.silu_mul_quantize_gu(g, ridx, 0,
                                            per_row=True)[0], gu)
    finally:
        jax.nn.silu = real_silu
        try:
            qk._actq_call.clear_cache()
        except AttributeError:
            pass


if __name__ == "__main__":
    main()
