"""Activation quantization ops for the kernel path.

TPU replacement for the reference's fused reorder+quantize CUDA
kernels (kernels/src/reorder.cu:69-205, rmsnorm.cu:69-171, down.cu).
Unlike the CUDA kernels, no runtime channel *reorder/gather of the
main K range* is needed: the packed weight keeps original channel
order and only the ARC residual columns are gathered (SURVEY.md §7
design delta 1). The ops here are elementwise + small-group reductions
that XLA fuses well on the VPU; the output layout matches the fused
dequant-GEMM contract (kernels/gemm.py).

Numerics are identical to quant.arc.arc_quantize_x_qdq (the golden
path): residuals are computed from the already-rounded q(x)
(reference reorder.cu:157-160), and the global scale stays an epilogue
scalar.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..quant import numerics as N
from ..quant import packing


@functools.lru_cache()
def _actq_chunk() -> int:
    """Column-chunk width for the activation qdq. At K=18944 the
    single fused XLA region spills f32 intermediates to HBM (42 ps/
    elem vs 15 at K=3584 — round-3 prefill profile: 3.3 ms of the
    8 ms/layer prefill gap is this one site); group qdq is column-
    independent, so chunking to ~K=4736 restores per-chunk fusion
    bit-exactly. 0 disables."""
    return int(os.environ.get("ARC_ACTQ_CHUNK", "8192"))


def _nvfp4_qdq_scaled(xs: jax.Array) -> jax.Array:
    """Group qdq of pre-scaled values (f32 in, f32 out)."""
    shape = xs.shape
    g = xs.reshape(shape[:-1] + (shape[-1] // 16, 16))
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    scale = jnp.clip(absmax / N.E2M1_MAX, N.UE4M3_MIN, N.UE4M3_MAX)
    scale = scale.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    q = N.quantize_e2m1(g / scale) * scale
    return q.reshape(shape)


def quantize_x_arc(x: jax.Array, reorder_index: jax.Array,
                   select_num: int, kq: int | None = None,
                   per_row: bool = False):
    """Quantize an activation matrix for the fused dequant-GEMM.

    Args:
      x: [M, K] activations (bf16/f32), K % 16 == 0.
      reorder_index: [K] ascending-importance channel order.
      select_num: KE (static int, multiple of 64).
      kq: padded augmented length; defaults to pad_kq(K, select_num)
          which matches pack_weight_arc.
    Returns:
      (xa [M, kq] bf16 qdq values in scaled units, gx f32 scalar)
    """
    m, k = x.shape
    if kq is None:
        kq = packing.pad_kq(k, select_num)
    gx = N.nvfp4_global_scale(x, per_row=per_row)
    chunk = _actq_chunk()
    if chunk and k > chunk and m >= 256:
        # split to <=chunk-wide column blocks at group (16) boundaries;
        # qdq(x[:, c]/gx) per chunk == qdq(x/gx)[:, c] exactly
        n_c = -(-k // chunk)
        cw = -(-(k // n_c) // 16) * 16
        qx = jnp.concatenate(
            [_nvfp4_qdq_scaled(x[:, s:min(s + cw, k)].astype(jnp.float32)
                               / gx)
             for s in range(0, k, cw)], axis=1)
    else:
        qx = _nvfp4_qdq_scaled(x.astype(jnp.float32) / gx)
    parts = [qx]
    if select_num:
        idx = reorder_index[-select_num:].astype(jnp.int32)
        # take-then-subtract == subtract-then-take (elementwise), so the
        # full-width err tensor is never materialized
        err = (jnp.take(x, idx, axis=1).astype(jnp.float32) / gx
               - jnp.take(qx, idx, axis=1).astype(jnp.float32))
        parts.append(_nvfp4_qdq_scaled(err))
    pad = kq - k - select_num
    if pad:
        parts.append(jnp.zeros((m, pad), jnp.float32))
    xa = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return xa.astype(jnp.bfloat16), gx


def rmsnorm_quantize_x(x: jax.Array, norm_w: jax.Array, eps: float,
                       reorder_index: jax.Array, select_num: int,
                       kq: int | None = None, per_row: bool = False):
    """Fused RMSNorm + ARC quantize (reference rmsnorm.cu:69-171 /
    modeling_arc.py:222-227): y = x * w * rsqrt(mean(x²)+eps), then
    quantize. Returns ((xa, gx), normed) — normed is NOT returned by
    the reference kernel either; only the quantized tuple flows on."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps) * norm_w.astype(jnp.float32)
    return quantize_x_arc(normed, reorder_index, select_num, kq, per_row)


def silu_mul_quantize_x(gate: jax.Array, up: jax.Array,
                        reorder_index: jax.Array, select_num: int,
                        kq: int | None = None, per_row: bool = False):
    """Fused silu(gate)*up + ARC quantize — the reference re-quantizes
    the MLP product with a separate kernel launch
    (qLlamaLayer.py:436-441); here it is one fused XLA region."""
    prod = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    return quantize_x_arc(prod, reorder_index, select_num, kq, per_row)
