"""Tensor-parallel quantized forward via shard_map + Pallas kernels.

Greenfield TPU design (the reference has NO tensor parallelism —
SURVEY.md §2.3): Megatron-style sharding of the quantized decoder
layer over the mesh "tp" axis, with the ARC-augmented layout made
shard-local so no channel ever crosses a shard boundary:

  column-parallel  q/k/v/gate/up : weight N-dim sharded; activations
    replicated; each device runs the fused dequant-GEMM on its shard
    (attention heads land shard-local; requires tp | num_kv_heads).
  row-parallel     o/down        : weight K-dim sharded; each shard
    owns BOTH its slice of the plain channels and the ARC residual
    duplicates of the outlier channels that live in that slice, so
    quantize(x_local) + residual-append stays local; partial GEMM
    outputs combine with one psum over ICI.

ARC channel selection under TP: the global top-KE selection
(utilize.py:472-477) is re-balanced to KE/tp per shard — each shard
compensates its own most-important channels (equal shapes on every
device ⇒ one compiled program). The activation global scale for
row-parallel sites is the true global max via lax.pmax (2 scalar
collectives per layer, noise vs the GEMMs).

Everything here runs INSIDE shard_map, so the Pallas kernels see only
local shards. Communication bill (MEASURED, not asserted — single-
chip hardware cannot time ICI, but the compiled HLO can be counted:
benchmarks/tp_collectives.py, results in BASELINE.md): 2 all-reduces
per layer (o + down psums, [B, D] f32) plus the per-row scale pmax
reductions; whether XLA's latency-hiding scheduler overlaps them with
compute is a multi-chip measurement this environment cannot make.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from ..models import llama
from ..models.quantized import SiteCalib
from ..quant import packing, numerics as N
from ..kernels import gemm as gk

Params = Dict[str, Any]


class TPContext(NamedTuple):
    mesh: Mesh
    tp: int


# ---------------------------------------------------------------------------
# Host-side param sharding (one-time, at load)
# ---------------------------------------------------------------------------

def _local_perm(reorder_index: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Restrict a global ascending-importance permutation to channels
    [lo, hi), re-based to local indices (stays ascending)."""
    ridx = np.asarray(reorder_index)
    mask = (ridx >= lo) & (ridx < hi)
    return (ridx[mask] - lo).astype(np.int32)


def _stack_packed(pws):
    """Stack per-shard packed weights along a new leading tp axis."""
    cls = type(pws[0])
    fields = {}
    for name in pws[0]._fields:
        vals = [getattr(p, name) for p in pws]
        if vals[0] is None:
            fields[name] = None
        else:
            fields[name] = jnp.stack(vals)
    return cls(**fields)


def shard_linear_col(w, bias, calib: SiteCalib, tp: int, fmt: str):
    """Column-parallel: shard out_features; calib stays global. All
    shards quantize on the full tensor's global scale (bit-identical
    to the unsharded pack)."""
    n = w.shape[0]
    assert n % tp == 0, (n, tp)
    ns = n // tp
    gs = N.nvfp4_global_scale(w)
    pws = [packing.pack_weight_arc(
        w[i * ns:(i + 1) * ns], calib.reorder_index, calib.select_num,
        bias=None if bias is None else bias[i * ns:(i + 1) * ns],
        fmt=fmt, global_scale=gs) for i in range(tp)]
    return _stack_packed(pws)


def shard_linear_row(w, bias, calib: SiteCalib, tp: int, fmt: str,
                     w_scale: str = "tensor", exact: bool = False):
    """Row-parallel: shard in_features with per-shard ARC selection.

    The global scale (tensor scalar or per-channel [N] vector) is
    computed over the FULL weight and passed to every shard, so the
    quantization grid is identical to the unsharded pack.

    exact=False (default): each shard selects its own top KE/tp local
    channels — cheap (everything stays shard-local) but a different
    channel set + residual grouping than the single-device pack.

    exact=True (QuantConfig.tp_exact_arc): keep the GLOBAL top-KE set
    and its 16-element residual grouping. The residual block (the
    last KE augmented columns, in global ascending-importance order)
    is partitioned group-aligned across shards: shard i's pack
    duplicates residual chunk i's channels from the FULL weight
    (wherever they live), and at run time the activation residual is
    rebuilt exactly via scatter + psum (_quantize_x_rowshard_exact).
    Bit-identical numerics to the unsharded pack; requires
    (KE/tp) % 16 == 0.

    Returns (stacked packed weight, residual index array [tp, *],
    residual POSITION array [tp, *] (exact mode; else None),
    per-shard select count, replicated bias or None)."""
    n, k = w.shape
    assert k % tp == 0 and (k // tp) % 16 == 0, (k, tp)
    ks = k // tp
    ridx = np.asarray(calib.reorder_index)
    if w_scale == "channel":
        gs = N.nvfp4_global_scale(w, per_row=True)[:, 0]
    else:
        gs = N.nvfp4_global_scale(w)

    if exact and calib.select_num and tp > 1:
        ke = calib.select_num
        assert (ke // tp) % 16 == 0, (
            f"exact-ARC TP needs (select_num/tp) % 16 == 0, got "
            f"select_num={ke} tp={tp}")
        kc = ke // tp
        top = ridx[-ke:]                    # global residual order
        pws, idx_rows, pos_rows = [], [], []
        for i in range(tp):
            chunk = top[i * kc:(i + 1) * kc]
            pws.append(packing.pack_weight_arc(
                w[:, i * ks:(i + 1) * ks], None, kc, bias=None,
                fmt=fmt, global_scale=gs,
                aug_cols=w[:, chunk]))
            lo, hi = i * ks, (i + 1) * ks
            own = np.nonzero((top >= lo) & (top < hi))[0]
            idx_rows.append(top[own] - lo)  # local channel ids
            pos_rows.append(own)            # positions in [0, KE)
        mo = max(len(r) for r in idx_rows)
        idx = np.zeros((tp, mo), np.int32)
        pos = np.full((tp, mo), ke, np.int32)   # ke = drop sentinel
        for i in range(tp):
            idx[i, :len(idx_rows[i])] = idx_rows[i]
            pos[i, :len(pos_rows[i])] = pos_rows[i]
        return (_stack_packed(pws), jnp.asarray(idx),
                jnp.asarray(pos), kc, bias)

    sel = (calib.select_num // tp) // 64 * 64 if tp > 1 else \
        calib.select_num
    pws, idx_rows = [], []
    for i in range(tp):
        perm = _local_perm(ridx, i * ks, (i + 1) * ks)
        pws.append(packing.pack_weight_arc(
            w[:, i * ks:(i + 1) * ks], jnp.asarray(perm), sel,
            bias=None, fmt=fmt, global_scale=gs))
        idx_rows.append(perm[-sel:] if sel else
                        np.zeros((0,), np.int32))
    idx = jnp.asarray(np.stack(idx_rows)) if sel else \
        jnp.zeros((tp, 0), jnp.int32)
    return _stack_packed(pws), idx, None, sel, bias


def shard_layer_params_tp(cfg: ModelConfig, layer_p: Params,
                          layer_calib: Dict[str, SiteCalib],
                          qcfg: QuantConfig, tp: int) -> Params:
    """Quantize+shard one decoder layer for tp-way tensor parallelism.

    Output pytree: packed weights with a leading [tp] axis (to be
    placed with P('tp') sharding), norms replicated."""
    fmt = qcfg.weight_fmt
    out: Params = {"attn_norm": layer_p["attn_norm"],
                   "mlp_norm": layer_p["mlp_norm"]}
    for proj in ("q", "k", "v"):
        out[proj] = shard_linear_col(
            layer_p[proj]["w"], layer_p[proj].get("b"),
            layer_calib["attn_in"], tp, fmt)
    for proj in ("gate", "up"):
        out[proj] = shard_linear_col(
            layer_p[proj]["w"], layer_p[proj].get("b"),
            layer_calib["mlp_in"], tp, fmt)
    exact = getattr(qcfg, "tp_exact_arc", False)
    o_pw, o_idx, o_pos, o_sel, _ = shard_linear_row(
        layer_p["o"]["w"], None, layer_calib["o_in"], tp, fmt,
        qcfg.w_scale, exact=exact)
    d_pw, d_idx, d_pos, d_sel, _ = shard_linear_row(
        layer_p["down"]["w"], None, layer_calib["down_in"], tp, fmt,
        qcfg.w_scale, exact=exact)
    out["o"] = o_pw
    out["down"] = d_pw
    out["o_idx"] = o_idx
    out["down_idx"] = d_idx
    if o_pos is not None:
        out["o_pos"] = o_pos
    if d_pos is not None:
        out["down_pos"] = d_pos
    out["_o_sel"] = o_sel        # static ints, popped before jit
    out["_down_sel"] = d_sel
    out["_o_ke"] = layer_calib["o_in"].select_num
    out["_down_ke"] = layer_calib["down_in"].select_num
    return out


def shard_model_params_tp(cfg: ModelConfig, params: Params, calib,
                          qcfg: QuantConfig, mesh: Mesh) -> Params:
    """Shard the whole model onto `mesh` ("tp" axis). Embeds/norms/
    lm_head replicated (vocab sharding: future work)."""
    tp = mesh.shape["tp"]
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P("tp"))

    def place(tree, sharded_leading_tp: bool):
        sh = shard0 if sharded_leading_tp else repl
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

    out: Params = {
        "embed": place(params["embed"], False),
        "final_norm": place(params["final_norm"], False),
    }
    if "lm_head" in params:
        out["lm_head"] = place(params["lm_head"], False)
    layers = []
    sels: List[Dict[str, int]] = []
    for li, lp in enumerate(params["layers"]):
        slp = shard_layer_params_tp(cfg, lp, calib[li], qcfg, tp)
        sels.append({"o": slp.pop("_o_sel"),
                     "down": slp.pop("_down_sel"),
                     "_o_ke": slp.pop("_o_ke"),
                     "_down_ke": slp.pop("_down_ke")})
        placed = {}
        for k, v in slp.items():
            if k in ("attn_norm", "mlp_norm"):
                placed[k] = place(v, False)
            else:
                placed[k] = place(v, True)
        layers.append(placed)
    out["layers"] = layers
    out["_row_sels"] = sels      # static metadata (host-side)
    return out


# ---------------------------------------------------------------------------
# Device-side forward (runs inside shard_map)
# ---------------------------------------------------------------------------

def _unstack(pw):
    """Strip the local leading tp axis (size 1 inside shard_map)."""
    cls = type(pw)
    return cls(*[None if v is None else v[0] for v in pw])


def _nvfp4_qdq_scaled(xs):
    shape = xs.shape
    g = xs.reshape(shape[:-1] + (shape[-1] // 16, 16))
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    scale = jnp.clip(absmax * N.INV_E2M1_MAX, N.UE4M3_MIN,
                     N.UE4M3_MAX)
    scale = scale.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    q = N.e2m1_decode(N.e2m1_encode_scaled(g, scale)) * scale
    return q.reshape(shape)


def _quantize_x_global(x2, calib: SiteCalib, kq: int,
                       per_row: bool = False):
    """Replicated activation quantize (column-parallel sites) — same
    numerics as kernels.quantize.quantize_x_arc (per_row honours
    QuantConfig.act_scale="row": scales then do not depend on batch
    composition/padding, so TP serving matches the single-chip
    engine's grids row-for-row)."""
    from ..kernels.quantize import quantize_x_arc
    return quantize_x_arc(x2, calib.reorder_index, calib.select_num,
                          kq, per_row=per_row)


def _row_gmax(x_local, per_row: bool):
    """Activation absmax over the FULL (tp-sharded) K dim: scalar, or
    per-row [M, 1] when per_row (elementwise pmax across shards)."""
    if per_row:
        local = jnp.max(jnp.abs(x_local), axis=-1,
                        keepdims=True).astype(jnp.float32)
    else:
        local = jnp.max(jnp.abs(x_local)).astype(jnp.float32)
    return jax.lax.pmax(local, "tp")


def _quantize_x_rowshard(x_local, idx_local, sel: int, kq: int,
                         per_row: bool = False):
    """Row-parallel activation quantize: x_local [M, Ks] is this
    shard's slice; global scale via pmax over tp."""
    m, ks = x_local.shape
    gmax = _row_gmax(x_local, per_row)
    gx = jnp.maximum(gmax * N.INV_NVFP4_GLOBAL_DIV, 1e-12)
    xs = x_local.astype(jnp.float32) / gx
    qx = _nvfp4_qdq_scaled(xs)
    parts = [qx]
    if sel:
        err = xs - qx
        parts.append(_nvfp4_qdq_scaled(jnp.take(err, idx_local, axis=1)))
    pad = kq - ks - sel
    if pad:
        parts.append(jnp.zeros((m, pad), jnp.float32))
    xa = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return xa.astype(jnp.bfloat16), gx


def _quantize_x_rowshard_exact(x_local, own_idx, own_pos, sel_chunk: int,
                               ke: int, kq: int,
                               per_row: bool = False):
    """Exact-ARC row-parallel activation quantize: rebuild the GLOBAL
    residual block (the single-device quantize_x_arc's last-KE
    columns, same channel set, order, and 16-grouping) via scatter +
    psum, then take this shard's group-aligned chunk. Bit-identical
    to the unsharded path.

    own_idx/own_pos: [mo] local channel ids owned by this shard that
    belong to the global top-KE, and their positions within [0, KE)
    (padded with pos=KE → dropped by the scatter)."""
    m, ks = x_local.shape
    gmax = _row_gmax(x_local, per_row)
    gx = jnp.maximum(gmax * N.INV_NVFP4_GLOBAL_DIV, 1e-12)
    xs = x_local.astype(jnp.float32) / gx
    qx = _nvfp4_qdq_scaled(xs)
    err = xs - qx
    blk = jnp.zeros((m, ke), jnp.float32).at[:, own_pos].set(
        jnp.take(err, own_idx, axis=1), mode="drop")
    blk = jax.lax.psum(blk, "tp")
    i = jax.lax.axis_index("tp")
    chunk = jax.lax.dynamic_slice_in_dim(blk, i * sel_chunk, sel_chunk,
                                         axis=1)
    resq = _nvfp4_qdq_scaled(chunk)
    parts = [qx, resq]
    pad = kq - ks - sel_chunk
    if pad:
        parts.append(jnp.zeros((m, pad), jnp.float32))
    return jnp.concatenate(parts, axis=1).astype(jnp.bfloat16), gx


def quantize_x_row_site(x_local, p: Params, name: str,
                        sels: Dict[str, Any], kq: int,
                        per_row: bool = False):
    """Dispatch a row-parallel site's activation quantize: exact-ARC
    (global set, scatter+psum) when the pack carries position arrays,
    else the per-shard re-balanced path."""
    pos_key = f"{name}_pos"
    if pos_key in p:
        return _quantize_x_rowshard_exact(
            x_local, p[f"{name}_idx"][0], p[pos_key][0],
            sels[name], sels[f"_{name}_ke"], kq, per_row=per_row)
    return _quantize_x_rowshard(x_local, p[f"{name}_idx"][0],
                                sels[name], kq, per_row=per_row)


def tp_quant_layer_forward(cfg: ModelConfig, p: Params, x, cos, sin,
                           layer_calib: Dict[str, SiteCalib],
                           row_sels: Dict[str, int],
                           qcfg: QuantConfig, tp: int):
    """One decoder layer, executed per-shard inside shard_map.
    x: replicated [B, T, D]."""
    b, t, d = x.shape
    hq_l = cfg.num_heads // tp
    hkv_l = cfg.num_kv_heads // tp

    dt = x.dtype
    h = llama.rms_norm(x, p["attn_norm"], cfg.rms_eps)
    x2 = h.reshape(b * t, d)
    q_pw = _unstack(p["q"])
    xa, gx = _quantize_x_global(x2, layer_calib["attn_in"], q_pw.kq)
    q = gk.gemm_dequant(xa, q_pw, gx, out_dtype=dt).reshape(
        b, t, hq_l, cfg.head_dim)
    k = gk.gemm_dequant(xa, _unstack(p["k"]), gx, out_dtype=dt).reshape(
        b, t, hkv_l, cfg.head_dim)
    v = gk.gemm_dequant(xa, _unstack(p["v"]), gx, out_dtype=dt).reshape(
        b, t, hkv_l, cfg.head_dim)
    q, k = llama.apply_rope(q, k, cos, sin)
    kk = llama.repeat_kv(k, hq_l // hkv_l)
    vv = llama.repeat_kv(v, hq_l // hkv_l)
    attn = llama.dense_attention(q, kk, vv, causal=True)
    attn2 = attn.reshape(b * t, hq_l * cfg.head_dim)   # local K-shard

    o_pw = _unstack(p["o"])
    oa, go = quantize_x_row_site(attn2, p, "o", row_sels, o_pw.kq)
    o_part = gk.gemm_dequant(oa, o_pw, go, out_dtype=jnp.float32)
    o = jax.lax.psum(o_part, "tp").astype(x.dtype).reshape(b, t, d)
    x = x + o

    h = llama.rms_norm(x, p["mlp_norm"], cfg.rms_eps)
    x2 = h.reshape(b * t, d)
    g_pw = _unstack(p["gate"])
    xa, gx = _quantize_x_global(x2, layer_calib["mlp_in"], g_pw.kq)
    # bf16 gate/up outputs (same rounding grid as the single-chip
    # path — the tp_exact_arc bit-parity contract) + f32 silu·up
    gate = gk.gemm_dequant(xa, g_pw, gx, out_dtype=dt)
    up = gk.gemm_dequant(xa, _unstack(p["up"]), gx, out_dtype=dt)
    inter = (jax.nn.silu(gate.astype(jnp.float32))
             * up.astype(jnp.float32)).astype(dt)

    d_pw = _unstack(p["down"])
    ia, gi = quantize_x_row_site(inter, p, "down", row_sels, d_pw.kq)
    d_part = gk.gemm_dequant(ia, d_pw, gi, out_dtype=jnp.float32)
    dn = jax.lax.psum(d_part, "tp").astype(x.dtype).reshape(b, t, d)
    return x + dn


def tp_quant_model_forward(cfg: ModelConfig, qparams: Params, calib,
                           qcfg: QuantConfig, mesh: Mesh,
                           tokens) -> jax.Array:
    """Full sharded quantized forward (no cache): tokens [B, T] →
    logits [B, T, V]. Batch replicated over tp (add dp later)."""
    tp = mesh.shape["tp"]
    row_sels = qparams["_row_sels"]
    layers = qparams["layers"]

    pw_spec = jax.tree.map(lambda _: P("tp"),
                           [{k: v for k, v in lp.items()
                             if k not in ("attn_norm", "mlp_norm")}
                            for lp in layers])
    norm_spec = [{k: P() for k in ("attn_norm", "mlp_norm")}
                 for _ in layers]
    layer_specs = [dict(ns, **ps) for ns, ps in zip(norm_spec, pw_spec)]

    def fwd(embed, final_norm, head, layer_params, toks):
        b, t = toks.shape
        positions = jnp.arange(t)[None, :].repeat(b, 0)
        cos, sin = llama.rope_cos_sin(cfg, positions)
        x = embed[toks]
        for li, lp in enumerate(layer_params):
            x = tp_quant_layer_forward(cfg, lp, x, cos, sin, calib[li],
                                       row_sels[li], qcfg, tp)
        x = llama.rms_norm(x, final_norm, cfg.rms_eps)
        return jnp.dot(x, head.T, preferred_element_type=jnp.float32)

    head = qparams.get("lm_head", qparams["embed"])
    f = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(), layer_specs, P()),
        out_specs=P(), check_vma=False)
    return jax.jit(f)(qparams["embed"], qparams["final_norm"], head,
                      layers, tokens)
