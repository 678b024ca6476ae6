"""Augmented Residual Channels (ARC) — reference fake-quant ops.

ARC appends the quantized *residual* of outlier activation channels as
extra K-columns of the same quantized GEMM, and duplicates the matching
weight columns, so outlier compensation costs zero extra kernel
launches (reference: model/quantize.py:219-268, kernels/fake.py:78-134).

Given reorder_index (ascending per-channel importance — outliers LAST,
reference utilize.py:22-64) and select_num = KE (a multiple of 64):

  activations:  x_aug = [ qdq(x) , qdq(x - qdq(x))[:, top_KE] ]
  weights:      w_aug = [ qdq(w) , qdq(w)[:, top_KE] ]
  GEMM:         y = x_aug @ w_aug.T * (global_x * global_w)

because for the outlier channels (q(x) + q(x - q(x))) · q(w) recovers
x·q(w) to second order.

Layout note: we use the *simplified* augmented layout
[all K groups][KE residual groups] rather than the reference CUDA
kernel's interleaved (outlier, residual) pair layout (reorder.cu:
136-198) — we control both sides of the GEMM, and the flat layout
shards and tiles cleanly on TPU (SURVEY.md §7 design delta 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import numerics as N


def top_channels(reorder_index: jax.Array, select_num: int) -> jax.Array:
    """The `select_num` most-important channels (reorder_index is
    ascending-importance, so they sit at the end; reference
    quantize.py:240, :264)."""
    if select_num == 0:
        return jnp.zeros((0,), jnp.int32)
    return reorder_index[-select_num:].astype(jnp.int32)


def arc_quantize_x_qdq(x: jax.Array, reorder_index: jax.Array,
                       select_num: int, quant_type: str = "NVFP4",
                       per_row: bool = False, gs_reduce=None):
    """Fake-quantize an activation matrix with ARC residual append.

    Args:
      x: [M, K] activations.
      reorder_index: [K] ascending-importance channel permutation.
      select_num: KE, number of outlier channels (0 disables ARC).
    Returns:
      (x_aug [M, K+KE] quantize-dequantized values in *scaled units*
       (global scale NOT folded in), global_scale f32)

    Matches reference fake_reorder_quantize_x (quantize.py:243-268) up
    to scale placement: the residual is computed from the
    *already-rounded* q(x). Like the reference's real kernel path
    (qLinearLayer.py:69), the global scales of x and w are applied at
    the GEMM epilogue — the reference's fake path is inconsistent
    about this between its select_num==0 and >0 branches
    (quantize.py:262 vs :268); we use the kernel-path convention
    everywhere.
    """
    if quant_type == "NVFP4":
        gs = N.nvfp4_global_scale(x, per_row=per_row)
        if gs_reduce is not None:
            # cross-shard scale agreement (e.g. lax.pmax over an ep
            # axis): sharded callers must quantize on the same grid as
            # the unsharded computation
            gs = gs_reduce(gs)
    else:
        gs = jnp.float32(1.0)
    xs = x.astype(jnp.float32) / gs
    qx = N.group_qdq(xs, quant_type)
    if select_num == 0:
        return qx, gs
    idx = top_channels(reorder_index, select_num)
    err = xs - qx
    qerr = N.group_qdq(err[:, idx], quant_type)
    return jnp.concatenate([qx, qerr], axis=1), gs


def arc_quantize_w_qdq(w: jax.Array, reorder_index: jax.Array,
                       select_num: int, quant_type: str = "NVFP4",
                       per_channel: bool = False):
    """Fake-quantize a weight matrix with ARC column duplication.

    Args:
      w: [N, K] weights (out_features, in_features).
    Returns:
      (w_aug [N, K+KE] qdq values WITHOUT the global scale folded in,
       global_scale f32)

    Matches reference fake_reorder_quantize_w (quantize.py:219-241):
    outlier weight columns are simply re-quantized duplicates. Note the
    weight qdq values stay in "scaled" units; the caller applies the
    global scale at GEMM epilogue (qLinearLayer.py:69-71).

    per_channel=True uses one global scale per OUTPUT channel
    (returned as [N]) — finer than the reference's per-tensor scale.
    """
    if quant_type == "NVFP4":
        if per_channel:
            gs = N.nvfp4_global_scale(w, per_row=True)[:, 0]  # [N]
        else:
            gs = N.nvfp4_global_scale(w)
    else:
        gs = jnp.float32(1.0)
    ws = w.astype(jnp.float32) / (gs[:, None] if gs.ndim else gs)
    qw = N.group_qdq(ws, quant_type)
    if select_num == 0:
        return qw.astype(w.dtype), gs
    idx = top_channels(reorder_index, select_num)
    qwk = N.group_qdq(ws[:, idx], quant_type)
    aug = jnp.concatenate([qw, qwk], axis=1)
    return aug.astype(w.dtype), gs


def arc_linear_fake(x: jax.Array, w: jax.Array, reorder_index: jax.Array,
                    select_num: int, quant_type: str = "NVFP4",
                    bias: jax.Array | None = None,
                    per_row: bool = False,
                    per_channel: bool = False) -> jax.Array:
    """End-to-end fake-quant ARC linear: y = x_aug @ w_aug.T * scales.

    This is the golden semantic the fused Pallas quantize+GEMM pipeline
    must match (kernel parity tests), and the accuracy-eval path for
    formats without a packed kernel.
    """
    x2 = x.reshape(-1, x.shape[-1])
    xa, gx = arc_quantize_x_qdq(x2, reorder_index, select_num,
                                quant_type, per_row=per_row)
    wa, gw = arc_quantize_w_qdq(w, reorder_index, select_num,
                                quant_type, per_channel=per_channel)
    gw2 = gw.reshape(1, -1) if gw.ndim else gw
    y = jnp.dot(xa.astype(jnp.float32), wa.astype(jnp.float32).T,
                preferred_element_type=jnp.float32) * gx * gw2
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(x.shape[:-1] + (w.shape[0],)).astype(x.dtype)


def average_bits(k: int, select_num: int) -> float:
    """Effective bits/element of NVFP4+ARC: 4.5 * (K + KE) / K
    (4 code bits + 8/16 scale bits; reference utilize.py:477)."""
    return 4.5 * (k + select_num) / k
