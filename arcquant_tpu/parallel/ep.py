"""Expert parallelism for MoE layers via shard_map over an "ep" axis.

Greenfield TPU design (the reference pdh930105/ARCQuant is dense-only
and single-GPU — SURVEY.md §2.3): the stacked expert weights
[E, F, D] are sharded on the leading expert axis (E/ep per device);
tokens are REPLICATED across ep (and sharded across dp when the mesh
has one). Each shard:

  1. runs the (tiny, replicated) router on the full token block,
  2. slices the combine matrix to its local experts,
  3. runs the local expert FFN (dense or capacity-dispatch mode from
     models/moe.py, unchanged — quantized or bf16),
  4. psums the [T, D] partial output over "ep".

This is the all-reduce EP formulation: communication is ONE [T, D]
psum per MoE layer, independent of E and k — the right trade on a TPU
mesh where tokens-per-device is modest (inference) and ICI all-reduce
is cheap relative to an a2a token shuffle + capacity re-balance. The
alternative all_to_all dispatch (tokens sharded, shuffled to expert
owners) only wins when T per device is huge; see ring.py for the
analogous design-note pattern.

The Qwen-MoE shared expert is computed redundantly on every ep shard
(it is dense and token-replicated ⇒ identical everywhere) and added
AFTER the psum, so it is counted exactly once.

Exactness: slicing the combine matrix AFTER the global softmax/top-k
(route() runs on the full E) keeps routing bit-identical to the
single-device path; only the summation order of the <=k expert
contributions changes (f32 psum).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from ..models import moe

Params = Dict[str, Any]

# Stacked expert tensors carry E on axis 0; everything else replicates.
_EXPERT_STACKED = ("gate", "up", "down")


def moe_param_specs(p: Params, ep_axis: str = "ep") -> Params:
    """PartitionSpec tree for one layer's MoE params: expert stacks
    sharded on E, router/shared-expert replicated."""
    specs: Params = {}
    for name, sub in p.items():
        if name in _EXPERT_STACKED:
            specs[name] = {k: P(ep_axis) for k in sub}
        else:
            specs[name] = {k: P() for k in sub} if isinstance(sub, dict) \
                else P()
    return specs


def shard_moe_params(p: Params, mesh: Mesh, ep_axis: str = "ep") -> Params:
    """Host-side one-time placement of a layer's MoE params."""
    specs = moe_param_specs(p, ep_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        p, specs, is_leaf=lambda x: isinstance(x, P))


def ep_moe_block(cfg: ModelConfig, p_local: Params, x: jax.Array,
                 ep_axis: str = "ep", layer_calib=None,
                 qcfg: Optional[QuantConfig] = None,
                 capacity: Optional[int] = None) -> jax.Array:
    """MoE block to be called INSIDE shard_map: p_local holds E/ep
    experts, x [B, T, D] is this shard's (dp-local, ep-replicated)
    token block. Returns the full combined output (post-psum).

    Mirrors moe.moe_block but with (a) the combine matrix sliced to
    the local expert range and (b) the routed sum psummed over ep."""
    b, t, d = x.shape
    dtype = x.dtype
    e_loc = p_local["gate"]["w" if "w" in p_local["gate"] else "w_aug"
                            ].shape[0]
    idx = jax.lax.axis_index(ep_axis)
    x2 = x.reshape(b * t, d)

    # Routing runs on the FULL expert set (router weights replicated)
    # so softmax normalization and top-k selection are global — then
    # each shard keeps only its columns.
    cw = moe.route(cfg, p_local["router"]["w"], x2)        # [T, E]
    cw_loc = jax.lax.dynamic_slice_in_dim(cw, idx * e_loc, e_loc,
                                          axis=1)          # [T, E/ep]

    if qcfg is not None and qcfg.quant_type != "BF16":
        c_in = layer_calib["mlp_in"]
        if qcfg.act_bits == 16:
            xa, gx = moe._a16_pad(x2, c_in.select_num,
                                  kernel_pack=False)
        else:
            from ..quant import arc
            xa, gx = arc.arc_quantize_x_qdq(
                x2, c_in.reorder_index, c_in.select_num,
                qcfg.quant_type, per_row=qcfg.act_scale == "row")
        calib_down = layer_calib["down_in"]
    else:
        xa, gx, calib_down, qcfg = x2, jnp.float32(1.0), None, None

    # Local-expert FFN: dispatch capacity stays the GLOBAL per-expert
    # capacity (load is per expert, not per shard).
    k_loc = min(cfg.num_experts_per_tok, e_loc)
    if capacity is None:
        import math
        capacity = max(1, int(math.ceil(
            b * t * cfg.num_experts_per_tok / cw.shape[1]
            * moe.CAPACITY_FACTOR)))
    # Tensor-scale grid agreement: the down_in re-quantize scale must
    # be the max over ALL experts' intermediates, not this shard's
    # local ones, to match the unsharded computation bit-for-bit.
    gs_red = lambda s: jax.lax.pmax(s, ep_axis)  # noqa: E731
    if b * t <= moe.DENSE_MODE_MAX_T:
        y = moe._ffn_dense(p_local, xa, gx, cw_loc, calib_down, qcfg,
                           gs_reduce=gs_red)
    else:
        y = moe._ffn_dispatch(p_local, xa, gx, cw_loc, capacity, k_loc,
                              calib_down, qcfg, gs_reduce=gs_red)
    y = jax.lax.psum(y.astype(jnp.float32), ep_axis)       # [T, D]

    if "sgate" in p_local:
        sy = moe._shared_expert(p_local, x2, xa, gx, layer_calib, qcfg)
        gate = jax.nn.sigmoid(jnp.dot(
            x2.astype(jnp.float32),
            p_local["shared_gate"]["w"].T.astype(jnp.float32)))
        y = y + sy.astype(jnp.float32) * gate
    return y.reshape(b, t, d).astype(dtype)


def make_ep_moe_forward(cfg: ModelConfig, mesh: Mesh,
                        dp_axis: str = "dp", ep_axis: str = "ep",
                        layer_calib=None,
                        qcfg: Optional[QuantConfig] = None,
                        capacity: Optional[int] = None):
    """Build a jittable dp×ep MoE block: tokens sharded over dp,
    experts over ep. `p` must be placed with shard_moe_params."""

    def fwd(p: Params, x: jax.Array) -> jax.Array:
        specs = moe_param_specs(p, ep_axis)
        f = shard_map(
            lambda pl, xl: ep_moe_block(cfg, pl, xl, ep_axis,
                                        layer_calib, qcfg, capacity),
            mesh=mesh,
            in_specs=(specs, P(dp_axis)),
            out_specs=P(dp_axis),
            check_vma=False)
        return f(p, x)

    return fwd
