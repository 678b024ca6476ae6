"""Mixture-of-experts FFN (Mixtral / Qwen-MoE families), TPU-first.

The reference (pdh930105/ARCQuant) is dense-only; MoE is the natural
extension of its W4 capacity story — expert weights dominate memory, so
NVFP4+ARC quantization and expert parallelism compose here. Everything
is static-shape and MXU-batched:

- **dense mode** (small T, e.g. decode): every expert runs on every
  token as ONE batched einsum over the stacked expert weights
  [E, F, D]; outputs are combined with the (top-k-masked) router
  weights. Exact, no dispatch tensors, E/k× FLOP overhead — the right
  trade below ~hundreds of tokens where expert GEMMs would be
  launch-bound anyway.
- **dispatch mode** (large T, e.g. prefill): GShard-style capacity
  dispatch — a one-hot [T*k, E*C] matrix routes tokens into per-expert
  slots, the expert FFN runs as batched [E, C, *] einsums, and the
  transpose of the same one-hot combines. All shapes static; XLA sees
  three big matmuls. Tokens beyond an expert's capacity are dropped
  (contribute 0 — the residual stream carries them), standard MoE
  semantics; capacity=T is exact.

Quantized experts reuse the ARC machinery unchanged: activations are
quantized ONCE before routing (dispatch is a copy, so qdq commutes
with it), expert weights are fake-quantized per expert via vmap over
`arc_quantize_w_qdq`, and the silu(g)*u intermediate is re-quantized
per expert (the per-layer "down_in" site, shared across experts). The
router and the Qwen-MoE shared-expert gate stay bf16 — tiny and
accuracy-critical, like norms/embeddings (reference model_utils.py
swaps only the big linears).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig

Params = Dict[str, Any]

# Below this many tokens the all-experts dense mode wins (expert GEMMs
# at capacity C = T*k/E would starve the MXU); above it, capacity
# dispatch. Shared with the ep-sharded path.
DENSE_MODE_MAX_T = 256
CAPACITY_FACTOR = 1.25


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_moe_params(cfg: ModelConfig, key, dtype=jnp.bfloat16) -> Params:
    """Stacked expert weights: gate/up [E, F, D], down [E, D, F].

    The leading E axis is the expert-parallel sharding axis
    (parallel/ep.py) and the batch axis of the expert einsums."""
    e, d, f = cfg.num_experts, cfg.hidden_size, cfg.moe_intermediate_size
    ks = jax.random.split(key, 8)
    sd, sf = 1.0 / math.sqrt(d), 1.0 / math.sqrt(f)
    p: Params = {
        "router": {"w": jax.random.normal(ks[0], (e, d), dtype) * sd},
        "gate": {"w": jax.random.normal(ks[1], (e, f, d), dtype) * sd},
        "up": {"w": jax.random.normal(ks[2], (e, f, d), dtype) * sd},
        "down": {"w": jax.random.normal(ks[3], (e, d, f), dtype) * sf},
    }
    if cfg.shared_expert_size:
        fs = cfg.shared_expert_size
        p["sgate"] = {"w": jax.random.normal(ks[4], (fs, d), dtype) * sd}
        p["sup"] = {"w": jax.random.normal(ks[5], (fs, d), dtype) * sd}
        p["sdown"] = {"w": jax.random.normal(ks[6], (d, fs), dtype)
                      * (1.0 / math.sqrt(fs))}
        p["shared_gate"] = {"w": jax.random.normal(ks[7], (1, d), dtype)
                            * sd}
    return p


# ---------------------------------------------------------------------------
# Routing
# ---------------------------------------------------------------------------

def route(cfg: ModelConfig, router_w: jax.Array,
          x2: jax.Array) -> jax.Array:
    """Top-k router: x2 [T, D] -> combine weights [T, E] f32 (zeros off
    the top-k; optionally renormalized). Softmax over the FULL expert
    set first (Mixtral/Qwen-MoE order), f32 throughout."""
    logits = jnp.dot(x2.astype(jnp.float32),
                     router_w.T.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                 # [T, E]
    k = cfg.num_experts_per_tok
    wk, _ = jax.lax.top_k(probs, k)                         # [T, k]
    thresh = wk[:, -1:]                                     # kth largest
    cw = jnp.where(probs >= thresh, probs, 0.0)
    if cfg.norm_topk_prob:
        cw = cw / jnp.sum(cw, axis=-1, keepdims=True)
    return cw


# ---------------------------------------------------------------------------
# Stacked-expert linear (bf16 or ARC-qdq), shared by both modes
# ---------------------------------------------------------------------------

def _stacked_linear(qp: Params, x: jax.Array, gx,
                    spec: str) -> jax.Array:
    """Apply per-expert weights along the last dim of x.

    spec: einsum with operands (x, w) where w is [E, out, in] — e.g.
    'tk,efk->tef' (dense mode) or 'eck,efk->ecf' (dispatch mode).
    Quantized weights ({"w_aug", "gs"}) expect x already in scaled
    units with global act scale gx (scalar, [T,1], or [E,C,1])."""
    if "w_aug" in qp:
        y = jnp.einsum(spec, x.astype(jnp.bfloat16), qp["w_aug"],
                       preferred_element_type=jnp.float32)
        gs = qp["gs"]                                   # [E, out] / [E, 1]
        e_leading = spec.split("->")[1][0] == "e"
        y = y * (gs[:, None, :] if e_leading else gs[None, :, :])
        if isinstance(gx, jax.Array) and gx.ndim == 2:  # per-row [T, 1]
            gx = gx[:, :, None] if e_leading else gx[:, None, :]
        return (y * gx).astype(jnp.bfloat16)
    return jnp.einsum(spec, x, qp["w"],
                      preferred_element_type=jnp.float32
                      ).astype(x.dtype)


def _a16_pad(x: jax.Array, select_num: int, kernel_pack: bool):
    """W4A16 site activation: exact bf16, unit scale, zero ARC
    residual slots, padded to the weight's augmented width (packed kq
    when the weight is a PackedWeight / a dequantized pack; K+KE for
    unpadded qdq stacks)."""
    k = x.shape[-1]
    if kernel_pack:
        from ..quant import packing
        width = packing.pad_kq(k, select_num)
    else:
        width = k + select_num
    pad = [(0, 0)] * (x.ndim - 1) + [(0, width - k)]
    return jnp.pad(x.astype(jnp.bfloat16), pad), jnp.float32(1.0)


def _qx_kernel(x2: jax.Array, c, qcfg: QuantConfig):
    """Kernel-path site quantizer honoring act_bits (kq-padded)."""
    if qcfg.act_bits == 16:
        return _a16_pad(x2, c.select_num, kernel_pack=True)
    from ..kernels import quantize as qk
    return qk.quantize_x_arc(x2, c.reorder_index, c.select_num,
                             per_row=qcfg.act_scale == "row")


def _quantize_inter(inter: jax.Array, calib, qcfg: Optional[QuantConfig],
                    gs_reduce=None):
    """Re-quantize the silu(g)*u intermediate for the down projection.
    inter: [..., F] with leading batch dims; returns (aug, gscale).
    gs_reduce: optional cross-shard reduction of the TENSOR scale (EP
    shards see only local experts' intermediates; per-row scales are
    shard-local by construction and never reduced)."""
    if qcfg is None or qcfg.quant_type == "BF16":
        return inter, jnp.float32(1.0)
    if qcfg.act_bits == 16:
        # unit scale on every shard — cross-shard agreement is trivial
        return _a16_pad(inter, calib.select_num, kernel_pack=False)
    from ..quant import arc
    per_row = qcfg.act_scale == "row"
    lead = inter.shape[:-1]
    flat = inter.reshape(-1, inter.shape[-1])
    xa, gi = arc.arc_quantize_x_qdq(flat, calib.reorder_index,
                                    calib.select_num, qcfg.quant_type,
                                    per_row=per_row,
                                    gs_reduce=None if per_row
                                    else gs_reduce)
    xa = xa.reshape(*lead, xa.shape[-1])
    if isinstance(gi, jax.Array) and gi.ndim == 2:      # [T_flat, 1]
        gi = gi.reshape(*lead, 1)
    return xa, gi


# ---------------------------------------------------------------------------
# Expert FFN: dense mode
# ---------------------------------------------------------------------------

def _ffn_dense(p: Params, xa: jax.Array, gx, cw: jax.Array,
               calib_down=None, qcfg=None, taps=None,
               gs_reduce=None) -> jax.Array:
    """All experts on all tokens; combine with cw [T, E]."""
    gate = _stacked_linear(p["gate"], xa, gx, "tk,efk->tef")
    up = _stacked_linear(p["up"], xa, gx, "tk,efk->tef")
    inter = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(jnp.bfloat16)  # [T, E, F]
    if taps is not None:
        # calibration: only ROUTED (token, expert) rows count toward
        # the down_in site statistics
        taps["down_in"] = inter * (cw > 0)[:, :, None].astype(inter.dtype)
    # per-expert requant wants E leading: [E, T, F]
    inter = inter.transpose(1, 0, 2)
    ia, gi = _quantize_inter(inter, calib_down, qcfg, gs_reduce)
    y = _stacked_linear(p["down"], ia, gi, "etk,edk->etd")   # [E, T, D]
    return jnp.einsum("etd,te->td", y.astype(jnp.float32),
                      cw).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Expert FFN: capacity-dispatch mode
# ---------------------------------------------------------------------------

def _ffn_dispatch(p: Params, xa: jax.Array, gx, cw: jax.Array,
                  capacity: int, k: int,
                  calib_down=None, qcfg=None, taps=None,
                  gs_reduce=None, requant=None) -> jax.Array:
    """GShard one-hot dispatch. cw [T, E] with <= k nonzeros per row;
    exact when no expert receives more than `capacity` tokens
    (overflow tokens drop to 0, standard MoE semantics)."""
    t, e = cw.shape
    k = min(e, k)
    # assignments: top-k of the combine matrix (rows have <= k nonzero)
    w_l, a_l = jax.lax.top_k(cw, k)                     # [T, k]
    e_flat = a_l.reshape(-1)                            # [T*k]
    w_flat = w_l.reshape(-1).astype(jnp.float32)
    se = jax.nn.one_hot(e_flat, e, dtype=jnp.int32)     # [T*k, E]
    pos = jnp.cumsum(se, axis=0) - se
    mypos = jnp.sum(pos * se, axis=1)                   # rank in expert
    keep = (mypos < capacity) & (w_flat > 0)
    slot = jnp.where(keep, e_flat * capacity + mypos, e * capacity)
    # [T, k, E*C] one-hot; contracting t (and k) dispatches tokens
    # into expert slots as ONE matmul — no gather/scatter.
    disp = jax.nn.one_hot(slot, e * capacity,
                          dtype=jnp.bfloat16).reshape(t, k, -1)
    xin = jnp.einsum("tks,td->sd", disp, xa.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)             # [E*C, Dk]
    xin = xin.reshape(e, capacity, -1)
    gxd = gx
    if isinstance(gx, jax.Array) and gx.ndim == 2:      # per-row scale
        gxd = jnp.einsum("tks,td->sd", disp.astype(jnp.float32),
                         gx.astype(jnp.float32)
                         ).reshape(e, capacity, 1)
    gate = _stacked_linear(p["gate"], xin, gxd, "eck,efk->ecf")
    up = _stacked_linear(p["up"], xin, gxd, "eck,efk->ecf")
    inter = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(jnp.bfloat16)
    if taps is not None:
        # [E, C, F]: unrouted capacity slots are zero rows (harmless
        # for max/hessian/score statistics)
        taps["down_in"] = inter
    ia, gi = (requant or _quantize_inter)(inter, calib_down, qcfg,
                                          gs_reduce)
    y = _stacked_linear(p["down"], ia, gi, "eck,edk->ecd")  # [E, C, D]
    # combine = transpose of dispatch, weighted by the router probs
    comb = disp.astype(jnp.float32) * w_flat.reshape(t, k, 1)
    return jnp.einsum("tks,sd->td", comb,
                      y.reshape(e * capacity, -1).astype(jnp.float32)
                      ).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# Full MoE block
# ---------------------------------------------------------------------------

def moe_ffn(cfg: ModelConfig, p: Params, xa: jax.Array, gx,
            cw: jax.Array, capacity: Optional[int] = None,
            calib_down=None, qcfg=None, taps=None) -> jax.Array:
    """Routed-expert FFN on (possibly quantized) activations.

    xa [T, Dk] (scaled units if quantized), cw [T, E] combine weights
    (<= num_experts_per_tok nonzeros per row). Mode is picked
    statically from T (dense below DENSE_MODE_MAX_T)."""
    t = xa.shape[0]
    k = cfg.num_experts_per_tok
    if capacity is None:
        capacity = max(1, int(math.ceil(
            t * k / cw.shape[1] * CAPACITY_FACTOR)))
    if "gateup_pk" in p:
        if t <= DENSE_MODE_MAX_T:
            return _ffn_dense_packed(p, xa, gx, cw, calib_down, qcfg,
                                     taps)
        return _ffn_dispatch_packed(p, xa, gx, cw, capacity, k,
                                    calib_down, qcfg, taps)
    if t <= DENSE_MODE_MAX_T:
        return _ffn_dense(p, xa, gx, cw, calib_down, qcfg, taps)
    return _ffn_dispatch(p, xa, gx, cw, capacity, k, calib_down, qcfg,
                         taps)


def moe_block(cfg: ModelConfig, p: Params, x: jax.Array,
              layer_calib=None, qcfg: Optional[QuantConfig] = None,
              capacity: Optional[int] = None, taps=None) -> jax.Array:
    """Drop-in replacement for mlp_block on MoE configs.

    x [B, T, D] -> [B, T, D]. Routing is always bf16/f32 on the raw
    activations; expert GEMMs run quantized when qcfg says so. The
    Qwen-MoE shared expert (dense FFN + sigmoid gate on the raw
    hidden state) is added outside the routed sum."""
    b, t, d = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * t, d)
    cw = route(cfg, p["router"]["w"], x2)

    if qcfg is not None and qcfg.quant_type != "BF16" \
            and "gateup_pk" in p:
        # packed experts (W4-at-rest): kernel quantizer, Kq-padded to
        # the packed layout
        c_in = layer_calib["mlp_in"]
        xa, gx = _qx_kernel(x2, c_in, qcfg)
        calib_down = layer_calib["down_in"]
    elif qcfg is not None and qcfg.quant_type != "BF16":
        # qdq stacks: unpadded qdq activation path (weights here are
        # unpadded w_aug stacks)
        c_in = layer_calib["mlp_in"]
        if qcfg.act_bits == 16:
            xa, gx = _a16_pad(x2, c_in.select_num, kernel_pack=False)
        else:
            from ..quant import arc
            xa, gx = arc.arc_quantize_x_qdq(
                x2, c_in.reorder_index, c_in.select_num,
                qcfg.quant_type, per_row=qcfg.act_scale == "row")
        calib_down = layer_calib["down_in"]
    else:
        xa, gx, calib_down, qcfg = x2, jnp.float32(1.0), None, None

    y = moe_ffn(cfg, p, xa, gx, cw, capacity, calib_down, qcfg, taps)

    if "sgate" in p:
        sy = _shared_expert(p, x2, xa, gx, layer_calib, qcfg, taps)
        gate = jax.nn.sigmoid(jnp.dot(
            x2.astype(jnp.float32), p["shared_gate"]["w"].T
            .astype(jnp.float32)))                       # [T, 1]
        y = y + (sy.astype(jnp.float32) * gate).astype(y.dtype)
    return y.reshape(b, t, d).astype(dtype)


def _shared_expert(p: Params, x2: jax.Array, xa: jax.Array, gx,
                   layer_calib, qcfg, taps=None) -> jax.Array:
    """Qwen-MoE always-on expert: a plain (possibly quantized) FFN."""
    from . import quantized as Q
    if qcfg is None:
        gate = jnp.dot(x2, p["sgate"]["w"].T,
                       preferred_element_type=jnp.float32)
        up = jnp.dot(x2, p["sup"]["w"].T,
                     preferred_element_type=jnp.float32)
        inter = (jax.nn.silu(gate) * up).astype(x2.dtype)
        if taps is not None:
            taps["sdown_in"] = inter
        return jnp.dot(inter, p["sdown"]["w"].T,
                       preferred_element_type=jnp.float32
                       ).astype(x2.dtype)
    gate = Q._q_linear(p["sgate"], xa, gx, qcfg, jnp.bfloat16)
    up = Q._q_linear(p["sup"], xa, gx, qcfg, jnp.bfloat16)
    inter = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(jnp.bfloat16)
    sc = layer_calib["sdown_in"]
    if not isinstance(p["sdown"], dict):
        # packed sdown: kernel quantizer (Kq-padded to the pack)
        ia, gi = _qx_kernel(inter, sc, qcfg)
    else:
        ia, gi = _quantize_inter(inter, sc, qcfg)
    return Q._q_linear(p["sdown"], ia, gi, qcfg, jnp.bfloat16)


# ---------------------------------------------------------------------------
# Quantization (load-time)
# ---------------------------------------------------------------------------

def quantize_moe_params(p: Params, layer_calib,
                        qcfg: QuantConfig) -> Params:
    """ARC-quantize the stacked expert weights (vmap over E) and the
    shared expert; router / shared gate stay bf16.

    MoE experts always take the qdq path (even under
    qcfg.use_kernels): per-expert activations are capacity-C slices
    (C = T*k/E), far below the fused Pallas GEMM's efficient M range,
    while the stacked [E, F, D] einsum batches all experts into one
    MXU-shaped contraction — the TPU-right formulation."""
    from ..quant import arc
    out: Params = {"router": p["router"]}
    if qcfg.quant_type == "BF16":
        return dict(p)
    per_ch = qcfg.w_scale == "channel"

    def qstack(w, calib):
        def one(wi):
            wa, gs = arc.arc_quantize_w_qdq(
                wi, calib.reorder_index, calib.select_num,
                qcfg.quant_type, per_channel=per_ch)
            return wa.astype(jnp.bfloat16), jnp.atleast_1d(gs)
        wa, gs = jax.vmap(one)(w)
        if gs.ndim == 1 or gs.shape[-1] == 1:           # tensor scale
            gs = gs.reshape(gs.shape[0], 1)
        return {"w_aug": wa, "gs": gs.astype(jnp.float32)}

    out["gate"] = qstack(p["gate"]["w"], layer_calib["mlp_in"])
    out["up"] = qstack(p["up"]["w"], layer_calib["mlp_in"])
    out["down"] = qstack(p["down"]["w"], layer_calib["down_in"])
    if "sgate" in p:
        from .quantized import _quantize_linear_fake
        out["sgate"] = _quantize_linear_fake(
            p["sgate"], layer_calib["mlp_in"], qcfg.quant_type, per_ch)
        out["sup"] = _quantize_linear_fake(
            p["sup"], layer_calib["mlp_in"], qcfg.quant_type, per_ch)
        out["sdown"] = _quantize_linear_fake(
            p["sdown"], layer_calib["sdown_in"], qcfg.quant_type,
            per_ch)
        out["shared_gate"] = p["shared_gate"]
    return out


# ---------------------------------------------------------------------------
# Packed experts (W4-at-rest; single-chip engine capacity mode)
# ---------------------------------------------------------------------------

def _ffn_dense_packed(p: Params, xa: jax.Array, gx, cw: jax.Array,
                      calib_down=None, qcfg=None, taps=None) -> jax.Array:
    """Dense (decode) mode over PACKED experts: ONE fused dequant-GEMM
    for all experts' gate+up (big-concat N = E·2F), one BATCHED fused
    GEMM for down (leading-E grid). Weights stream compressed from HBM
    — this is the W4 capacity story for MoE (reference nvfp4.cu:10-121
    analog, batched the TPU way)."""
    from ..kernels import gemm as gk
    from ..kernels import quantize as qk
    t = xa.shape[0]
    e = cw.shape[1]
    gu = gk.gemm_dequant(xa, p["gateup_pk"], gx,
                         out_dtype=jnp.bfloat16)        # [T, E*2F]
    f = gu.shape[1] // (2 * e)
    gu = gu.reshape(t, e, 2, f)
    inter = (jax.nn.silu(gu[:, :, 0].astype(jnp.float32))
             * gu[:, :, 1].astype(jnp.float32)).astype(jnp.bfloat16)
    if taps is not None:
        taps["down_in"] = inter * (cw > 0)[:, :, None].astype(inter.dtype)
    inter_e = inter.transpose(1, 0, 2).reshape(e * t, f)
    ia, gi = _qx_kernel(inter_e, calib_down, qcfg)
    ia = ia.reshape(e, t, -1)
    if isinstance(gi, jax.Array) and gi.ndim == 2:
        gi = gi.reshape(e, t, 1)
    y = gk.gemm_dequant_batched(ia, p["down_pk"], gi,
                                out_dtype=jnp.float32)  # [E, T, D]
    return jnp.einsum("etd,te->td", y, cw).astype(jnp.bfloat16)


def _ffn_dispatch_packed(p: Params, xa: jax.Array, gx, cw: jax.Array,
                         capacity: int, k: int, calib_down=None,
                         qcfg=None, taps=None) -> jax.Array:
    """Dispatch (prefill) mode over PACKED experts: dequantize each
    expert stack ONCE to bf16 (Pallas one-pass decode — the M-dispatch
    design of the dense prefill path, amortized over capacity·E rows)
    and run the standard GShard dispatch einsums. Weights stay W4 at
    rest; the bf16 scratch is per-layer transient."""
    from ..kernels import gemm as gk
    from ..kernels import quantize as qk
    gpk, dpk = p["gateup_pk"], p["down_pk"]
    e = cw.shape[1]
    kq = gpk.kq
    f = gpk.n // (2 * e)
    w4 = gpk.codes.dtype == jnp.uint8
    wgu = gk.dequant_weight(gpk).reshape(kq, e, 2, f)
    gsv = gpk.global_scale.astype(jnp.float32)
    gsv = (jnp.broadcast_to(gsv.reshape(1, 1, 1), (e, 2, f))
           if gsv.ndim == 0 else gsv.reshape(e, 2, f))
    wd = gk.dequant_weight(dpk)                     # [E, Kq_f, D]
    gsd = dpk.global_scale.astype(jnp.float32)
    gsd = (jnp.broadcast_to(gsd.reshape(1, 1), (e, wd.shape[-1]))
           if gsd.ndim <= 1 else gsd)
    p_tmp = {
        "gate": {"w_aug": wgu[:, :, 0].transpose(1, 2, 0),
                 "gs": gsv[:, 0]},
        "up": {"w_aug": wgu[:, :, 1].transpose(1, 2, 0),
               "gs": gsv[:, 1]},
        "down": {"w_aug": wd.transpose(0, 2, 1), "gs": gsd},
    }

    # w4 dequant returns split-half k order; dispatch permutes token
    # ROWS only, so pre-splitting the activations keeps contraction
    # order consistent for gate/up, and the requant closure does the
    # same for down
    xa2 = gk.split_even_odd(xa) if w4 else xa

    def requant(inter, calib, _qcfg, gs_reduce=None):
        lead = inter.shape[:-1]
        flat = inter.reshape(-1, inter.shape[-1])
        ia, gi = _qx_kernel(flat, calib, qcfg)
        if w4:
            ia = gk.split_even_odd(ia)
        ia = ia.reshape(*lead, ia.shape[-1])
        if isinstance(gi, jax.Array) and gi.ndim == 2:
            gi = gi.reshape(*lead, 1)
        return ia, gi

    return _ffn_dispatch(p_tmp, xa2, gx, cw, capacity, k, calib_down,
                         qcfg, taps, requant=requant)


def quantize_moe_params_packed(p: Params, layer_calib,
                               qcfg: QuantConfig) -> Params:
    """Pack the expert stacks into the fused-GEMM byte formats
    (W4-at-rest — the qdq stacks of quantize_moe_params keep bf16
    memory, which defeats the MoE capacity story):

      gateup_pk — ONE PackedWeight, N order per expert [gate_e; up_e]
                  (N = E·2F): dense decode mode is a single fused GEMM
      down_pk   — stacked codes [E, Kq_f, D]: batched fused GEMM

    Per-CHANNEL weight scales always (one tensor scale across experts
    would degrade accuracy, same rationale as the fused qkv/gate-up
    packs). Shared expert packs as plain linears. EP/TP shard the qdq
    stacks (quantize_moe_params); packed-EP sharding (down_pk's E
    axis, gateup_pk N blocks) is future work."""
    from ..quant import packing
    out: Params = {"router": p["router"]}
    fmt = qcfg.weight_fmt
    c_in, c_dn = layer_calib["mlp_in"], layer_calib["down_in"]
    e = p["gate"]["w"].shape[0]
    gus, dns = [], []
    for ei in range(e):
        w_cat = jnp.concatenate([p["gate"]["w"][ei], p["up"]["w"][ei]],
                                axis=0)
        gus.append(packing.pack_weight_arc(
            w_cat, c_in.reorder_index, c_in.select_num, fmt=fmt,
            w_scale="channel"))
        dns.append(packing.pack_weight_arc(
            p["down"]["w"][ei], c_dn.reorder_index, c_dn.select_num,
            fmt=fmt, w_scale="channel"))
    cls = type(gus[0])
    out["gateup_pk"] = cls(
        codes=jnp.concatenate([g.codes for g in gus], axis=1),
        scales=jnp.concatenate([g.scales for g in gus], axis=1),
        global_scale=jnp.concatenate(
            [g.global_scale.reshape(-1) for g in gus]),
        bias=None)
    out["down_pk"] = cls(
        codes=jnp.stack([d.codes for d in dns]),
        scales=jnp.stack([d.scales for d in dns]),
        global_scale=jnp.stack(
            [d.global_scale.reshape(-1) for d in dns]),
        bias=None)
    if "sgate" in p:
        from .quantized import _quantize_linear_packed
        out["sgate"] = _quantize_linear_packed(
            p["sgate"], c_in, fmt, "channel")
        out["sup"] = _quantize_linear_packed(
            p["sup"], c_in, fmt, "channel")
        out["sdown"] = _quantize_linear_packed(
            p["sdown"], layer_calib["sdown_in"], fmt, "channel")
        out["shared_gate"] = p["shared_gate"]
    return out
