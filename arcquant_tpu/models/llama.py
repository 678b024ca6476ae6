"""Functional JAX decoder for the Llama / Qwen2 model families.

From-scratch TPU-first implementation (no torch, no HF modeling code):
params are plain pytrees (nested dicts of jax arrays), every forward is
a pure function, and all shapes are static so the whole step jits onto
the MXU. Covers both families the reference supports — Llama
(reference model/qLlamaLayer.py) and Qwen2 (model/qQwenLayer.py; the
only architectural deltas are QKV biases and rope theta, which are
config-driven here instead of duplicated 400-line files).

This module is the *bf16 baseline* path; the quantized layer forwards
live in arcquant_tpu/models/quantized.py and share these helpers.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_linear(key, n_out, n_in, bias, dtype):
    std = 1.0 / math.sqrt(n_in)
    p = {"w": jax.random.normal(key, (n_out, n_in), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((n_out,), dtype)
    return p


def init_layer_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> Params:
    ks = jax.random.split(key, 8)
    qb = cfg.qkv_bias
    p = {
        "attn_norm": jnp.ones((cfg.hidden_size,), dtype),
        "mlp_norm": jnp.ones((cfg.hidden_size,), dtype),
        "q": _init_linear(ks[0], cfg.q_size, cfg.hidden_size, qb, dtype),
        "k": _init_linear(ks[1], cfg.kv_size, cfg.hidden_size, qb, dtype),
        "v": _init_linear(ks[2], cfg.kv_size, cfg.hidden_size, qb, dtype),
        "o": _init_linear(ks[3], cfg.hidden_size, cfg.q_size, False, dtype),
    }
    if cfg.num_experts:
        from . import moe
        p["moe"] = moe.init_moe_params(cfg, ks[7], dtype)
        return p
    p["gate"] = _init_linear(ks[4], cfg.intermediate_size,
                             cfg.hidden_size, False, dtype)
    p["up"] = _init_linear(ks[5], cfg.intermediate_size,
                           cfg.hidden_size, False, dtype)
    p["down"] = _init_linear(ks[6], cfg.hidden_size,
                             cfg.intermediate_size, False, dtype)
    return p


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 2)
    params: Params = {
        "embed": jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
        "final_norm": jnp.ones((cfg.hidden_size,), dtype),
        "layers": [init_layer_params(cfg, keys[i + 1], dtype)
                   for i in range(cfg.num_layers)],
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = jax.random.normal(
            keys[-1], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, p["w"].T, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def rope_inv_freq(cfg: ModelConfig) -> jax.Array:
    """Rotary inverse frequencies, with optional Llama-3.1 scaling."""
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32)
                                    / d))
    if cfg.rope_scaling_factor is not None:
        # llama3-style NTK frequency interpolation
        low = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
        high = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
        wavelen = 2 * jnp.pi / inv
        smooth = jnp.clip(
            (cfg.rope_original_max_pos / wavelen - cfg.rope_low_freq_factor)
            / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor),
            0.0, 1.0)
        scaled = inv / cfg.rope_scaling_factor
        mid = (1 - smooth) * scaled + smooth * inv
        inv = jnp.where(wavelen > low, scaled,
                        jnp.where(wavelen < high, inv, mid))
    return inv


def rope_cos_sin(cfg: ModelConfig,
                 positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions: [..., head_dim]."""
    inv = rope_inv_freq(cfg)
    freqs = positions.astype(jnp.float32)[..., None] * inv  # [..., d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array,
               sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """q/k: [B, T, H, Dh]; cos/sin: [B, T, Dh] or [T, Dh].

    Rotate-half convention (reference qLlamaLayer.py:30-60)."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, T, Hkv, Dh] -> [B, T, Hkv*n_rep, Dh] (GQA head expansion,
    reference qLlamaLayer.py:62-71)."""
    if n_rep == 1:
        return x
    b, t, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :],
                            (b, t, h, n_rep, d)).reshape(b, t, h * n_rep, d)


def dense_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    causal: bool = True,
                    mask: Optional[jax.Array] = None) -> jax.Array:
    """Plain full attention. q: [B, Tq, H, Dh]; k/v: [B, Tk, H, Dh].

    Used by the accuracy-eval path (reference uses torch SDPA,
    qLlamaLayer.py:347-354); the serving path uses the Pallas flash
    kernels instead."""
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    scale = 1.0 / math.sqrt(dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal:
        qi = jnp.arange(tq)[:, None] + (tk - tq)
        ki = jnp.arange(tk)[None, :]
        cmask = qi >= ki
        logits = jnp.where(cmask[None, None], logits, -jnp.inf)
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# bf16 layer / model forward
# ---------------------------------------------------------------------------

def attention_block(cfg: ModelConfig, p: Params, x: jax.Array,
                    cos: jax.Array, sin: jax.Array,
                    kv_cache: Optional[Tuple[jax.Array, jax.Array]] = None,
                    cache_len: Optional[jax.Array] = None):
    """Self-attention with optional dense KV cache.

    kv_cache: (k_cache, v_cache) of shape [B, Tmax, Hkv, Dh];
    cache_len: current length (tokens already in cache).
    Returns (out [B,T,D], new_kv_cache)."""
    b, t, _ = x.shape
    q = linear(p["q"], x).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = linear(p["k"], x).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = linear(p["v"], x).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)

    if kv_cache is not None:
        kc, vc = kv_cache
        kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype),
                                          (0, cache_len, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype),
                                          (0, cache_len, 0, 0))
        tmax = kc.shape[1]
        pos = jnp.arange(tmax)
        valid = pos < (cache_len + t)
        kk = repeat_kv(kc.astype(q.dtype), cfg.num_kv_groups)
        vv = repeat_kv(vc.astype(q.dtype), cfg.num_kv_groups)
        qi = jnp.arange(t)[:, None] + cache_len
        cmask = (qi >= pos[None, :]) & valid[None, :]
        out = dense_attention(q, kk, vv, causal=False,
                              mask=cmask[None, None])
        new_cache = (kc, vc)
    else:
        kk = repeat_kv(k, cfg.num_kv_groups)
        vv = repeat_kv(v, cfg.num_kv_groups)
        out = dense_attention(q, kk, vv, causal=True)
        new_cache = None

    out = out.reshape(b, t, cfg.q_size)
    return linear(p["o"], out), new_cache


def mlp_block(cfg: ModelConfig, p: Params, x: jax.Array) -> jax.Array:
    gate = linear(p["gate"], x)
    up = linear(p["up"], x)
    return linear(p["down"], jax.nn.silu(gate.astype(jnp.float32))
                  .astype(x.dtype) * up)


def layer_forward(cfg: ModelConfig, p: Params, x: jax.Array,
                  cos: jax.Array, sin: jax.Array,
                  kv_cache=None, cache_len=None):
    h = rms_norm(x, p["attn_norm"], cfg.rms_eps)
    attn, new_cache = attention_block(cfg, p, h, cos, sin, kv_cache,
                                      cache_len)
    x = x + attn
    h = rms_norm(x, p["mlp_norm"], cfg.rms_eps)
    if "moe" in p:
        from . import moe
        x = x + moe.moe_block(cfg, p["moe"], h)
    else:
        x = x + mlp_block(cfg, p, h)
    return x, new_cache


def model_forward(cfg: ModelConfig, params: Params, tokens: jax.Array,
                  positions: Optional[jax.Array] = None) -> jax.Array:
    """Full forward (no cache): tokens [B, T] -> logits [B, T, V]."""
    b, t = tokens.shape
    if positions is None:
        positions = jnp.arange(t)[None, :].repeat(b, 0)
    x = params["embed"][tokens]
    cos, sin = rope_cos_sin(cfg, positions)
    for p in params["layers"]:
        x, _ = layer_forward(cfg, p, x, cos, sin)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    head = params.get("lm_head", params["embed"])
    return jnp.dot(x, head.T, preferred_element_type=jnp.float32)
