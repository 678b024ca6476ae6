"""Calibration pipeline: activation statistics → channel reorder
indices → ARC outlier-channel counts.

TPU re-design of the reference pipeline (reorder_indices.py:40-97,
utilize.py:80-252 get_act_stats, :22-64 get_reorder_index,
:388-500 search_select_proportions). The reference's GPU↔CPU
layer-swap Catcher trick becomes a per-layer jitted capture function:
the full model never materializes more than one layer's activations
per step, and the per-site statistics are reduced *inside* the jit so
raw activations never leave the device.

Metrics (utilize.py:89-116):
  max     — per-channel ∞-norm over tokens, running max over samples
  hessian — diag(2/n · XᵀX), accumulated over samples
  score   — per-channel L2 of the NVFP4 quantization error, running
            max over samples

Reorder index: ascending argsort of the stat — outliers land at the
END (utilize.py:42).

Select proportions (utilize.py:458-481): per token-row, threshold =
0.125 · row-max (signed); ratio = fraction of entries above threshold;
select_num = ceil(K · ratio / 64) · 64. (The reference permutes
channels before counting, which is a no-op for the count — we skip
the permute.)
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..config import ModelConfig, OUTLIER_THRESHOLD, SELECT_NUM_MULTIPLE
from ..models import llama
from ..models.quantized import QUANT_SITES, SiteCalib
from ..quant import numerics as N

METRICS = ("max", "hessian", "score")


def site_activations(cfg: ModelConfig, p, x, cos, sin):
    """Forward one decoder layer, also returning the activation at
    each of the four quantization sites (model-parity with
    llama.layer_forward)."""
    sites = {}
    h = llama.rms_norm(x, p["attn_norm"], cfg.rms_eps)
    sites["attn_in"] = h
    b, t, _ = x.shape
    q = llama.linear(p["q"], h).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = llama.linear(p["k"], h).reshape(b, t, cfg.num_kv_heads,
                                        cfg.head_dim)
    v = llama.linear(p["v"], h).reshape(b, t, cfg.num_kv_heads,
                                        cfg.head_dim)
    q, k = llama.apply_rope(q, k, cos, sin)
    kk = llama.repeat_kv(k, cfg.num_kv_groups)
    vv = llama.repeat_kv(v, cfg.num_kv_groups)
    attn = llama.dense_attention(q, kk, vv, causal=True)
    attn = attn.reshape(b, t, cfg.q_size)
    sites["o_in"] = attn
    x = x + llama.linear(p["o"], attn)
    h = llama.rms_norm(x, p["mlp_norm"], cfg.rms_eps)
    sites["mlp_in"] = h
    gate = llama.linear(p["gate"], h)
    up = llama.linear(p["up"], h)
    inter = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(x.dtype)
    sites["down_in"] = inter
    x = x + llama.linear(p["down"], inter)
    return x, sites


def _site_stat(acts: jax.Array, metric: str, nsamples: int) -> jax.Array:
    """Per-channel statistic of one site's activations [B, T, K]."""
    a = acts.reshape(-1, acts.shape[-1]).astype(jnp.float32)
    if metric == "hessian":
        return (2.0 / nsamples) * jnp.sum(a * a, axis=0)
    if metric == "score":
        err = a - N.nvfp4_qdq(a)
        return jnp.sqrt(jnp.sum(err * err, axis=0))
    return jnp.max(jnp.abs(a), axis=0)


def _site_outlier_count(acts: jax.Array) -> jax.Array:
    """Fraction of entries above 0.125 · per-row signed max
    (utilize.py:472-474)."""
    a = acts.reshape(-1, acts.shape[-1]).astype(jnp.float32)
    thresh = jnp.max(a, axis=-1, keepdims=True) * OUTLIER_THRESHOLD
    return jnp.mean(a > thresh)


def _accumulate(old, new, metric):
    if old is None:
        return new
    return old + new if metric == "hessian" else jnp.maximum(old, new)


def compute_calibration(cfg: ModelConfig, params, tokens: jax.Array,
                        metric: str = "max",
                        select_batch: int | None = None):
    """Run the full calibration pipeline.

    Args:
      tokens: [S, T] calibration token ids.
      metric: act-stat metric (max / hessian / score).
      select_batch: how many samples feed the select-proportion count
        (reference uses 32 of the 128, reorder_indices.py:83).
    Returns:
      (calib: list over layers of {site: SiteCalib},
       stats: list over layers of {site: [K] f32},
       avg_bits: float)
    """
    if metric not in METRICS:
        raise ValueError(f"metric {metric!r} not in {METRICS}")
    s, t = tokens.shape
    nsel = min(select_batch or s, s)

    @jax.jit
    def embed(toks):
        return params["embed"][toks]

    @jax.jit
    def layer_step(p, x, cos, sin):
        x_out, sites = site_activations(cfg, p, x, cos, sin)
        stats = {k: _site_stat(v, metric, s) for k, v in sites.items()}
        fracs = {k: _site_outlier_count(v[:nsel]) for k, v in sites.items()}
        return x_out, stats, fracs

    positions = jnp.arange(t)[None, :].repeat(s, 0)
    cos, sin = llama.rope_cos_sin(cfg, positions)
    x = embed(tokens)

    per_layer_stats: List[Dict[str, jax.Array]] = []
    per_layer_fracs: List[Dict[str, float]] = []
    for p in params["layers"]:
        x, stats, fracs = layer_step(p, x, cos, sin)
        per_layer_stats.append(stats)
        per_layer_fracs.append({k: float(v) for k, v in fracs.items()})

    calib = []
    total_elems, total_bits = 0, 0.0
    for stats, fracs in zip(per_layer_stats, per_layer_fracs):
        layer_calib = {}
        for site in QUANT_SITES:
            stat = stats[site]
            k = stat.shape[0]
            order = jnp.argsort(stat).astype(jnp.int32)  # ascending
            sel = math.ceil(k * fracs[site] / SELECT_NUM_MULTIPLE) \
                * SELECT_NUM_MULTIPLE
            sel = min(sel, k)
            layer_calib[site] = SiteCalib(order, sel)
            total_elems += k
            total_bits += 4.5 * (k + sel)
        calib.append(layer_calib)
    avg_bits = total_bits / max(total_elems, 1)
    return calib, per_layer_stats, avg_bits
