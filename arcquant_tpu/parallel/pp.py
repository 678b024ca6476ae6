"""Pipeline parallelism: layer-staged quantized forward over a "pp"
mesh axis (GPipe-style microbatching).

Greenfield TPU design. The reference's only "pipeline" is a disabled
greedy layer->GPU placement with device-moving forward hooks and NO
micro-batching (parallel_utils.py:89-163, invocation commented out at
model/main.py:151-158) — sequential, one GPU busy at a time. Here the
decoder stack is split into pp contiguous stages; microbatches flow
stage-to-stage with `jax.lax.ppermute` over ICI, so all stages run
concurrently after the pipeline fills: M microbatches finish in
M + pp - 1 stage-steps instead of M * pp.

Mechanics (SPMD, inside one shard_map body — every stage runs the
same program):
  - layer params are stacked [pp, L/pp, ...] and sharded over "pp";
    each device iterates only its own L/pp layers per step.
  - the activation in flight arrives via ppermute from the previous
    stage; stage 0 instead injects microbatch `step` from the
    (replicated) embedded input.
  - the last stage runs final-norm + head and contributes its
    finished microbatch to a zero-initialized output buffer; a single
    psum over "pp" at the end merges the (disjoint) contributions.
  - bubble steps compute garbage that is simply never written out —
    branch-free, so one compiled program regardless of step.

This is the strategy for models whose layers do not fit one chip's
HBM even quantized (e.g. 72B-class at w4): combine with the tp axis
(mesh ("pp", "tp")) by nesting — each stage's layer forward is then
the tensor-parallel one. The serving engine keeps tp×dp as its
primary topology; pp is the capacity dimension.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from ..models import llama, quantized

Params = Dict[str, Any]


def stack_stage_params(cfg: ModelConfig, qparams: Params, calib: list,
                       pp: int, mesh: Mesh) -> Params:
    """Stack per-layer quantized params AND calibration indices into
    [pp, L/pp, ...] leading axes and shard the stage axis over "pp"
    (one-time, at load). Requires a uniform select_num per site
    across layers (select counts are compile-time constants; the
    calibrate.py pipeline can be run with uniform rounding for pp
    deployments). Returns the param pytree plus "_sels" (static)."""
    layers = qparams["layers"]
    l = len(layers)
    assert l % pp == 0, (l, pp)
    per = l // pp

    def stack(leaves):
        return jnp.stack(leaves).reshape((pp, per) + leaves[0].shape)

    # per-site select counts must be layer-uniform (they are static
    # under jit, and non-uniform counts also make packed layer shapes
    # unstackable) — check BEFORE stacking for a clear error
    sels = {}
    cal = {}
    for site in calib[0]:
        counts = {calib[i][site].select_num for i in range(l)}
        assert len(counts) == 1, (
            f"pp path needs a uniform select_num for site {site}; "
            f"got {sorted(counts)}")
        sels[site] = counts.pop()
        cal[site] = stack([calib[i][site].reorder_index
                           for i in range(l)])
    stacked = jax.tree.map(lambda *xs: stack(list(xs)), *layers)
    stacked["_calib_idx"] = cal
    sh = NamedSharding(mesh, P("pp"))
    repl = NamedSharding(mesh, P())
    out = {
        "embed": jax.device_put(qparams["embed"], repl),
        "final_norm": jax.device_put(qparams["final_norm"], repl),
        "stages": jax.tree.map(lambda x: jax.device_put(x, sh),
                               stacked),
        "_sels": sels,
    }
    if "lm_head" in qparams:
        out["lm_head"] = jax.device_put(qparams["lm_head"], repl)
    return out


def pp_quant_model_forward(cfg: ModelConfig, pparams: Params,
                           calib: list, qcfg: QuantConfig, mesh: Mesh,
                           tokens: jax.Array,
                           microbatches: int = 0) -> jax.Array:
    """Pipelined quantized forward (no cache): tokens [B, T] ->
    logits [B, T, V]. B must divide by `microbatches` (default pp)."""
    pp = mesh.shape["pp"]
    b, t = tokens.shape
    m = microbatches or min(pp, b)
    assert b % m == 0, (b, m)
    mb = b // m
    l_per = cfg.num_layers // pp
    head = pparams.get("lm_head", pparams["embed"])
    sels = pparams["_sels"]
    fwd_perm = [(j, j + 1) for j in range(pp - 1)]

    def body(embed, final_norm, head, stages, toks):
        s = jax.lax.axis_index("pp")
        positions = jnp.arange(t)[None, :].repeat(mb, 0)
        cos, sin = llama.rope_cos_sin(cfg, positions)
        x_in = embed[toks]                       # [B, T, D] replicated
        cal_idx = stages.pop("_calib_idx")       # site -> [1, L/pp, K]
        out = jnp.zeros((b, t, head.shape[0]), jnp.float32)
        carry = jnp.zeros((mb, t, x_in.shape[-1]), x_in.dtype)

        for step in range(m + pp - 1):
            if step < m:
                # stage 0 injects a fresh microbatch
                x = jnp.where(s == 0,
                              x_in[step * mb:(step + 1) * mb], carry)
            else:
                x = carry
            for li in range(l_per):
                lp = jax.tree.map(lambda a, li=li: a[0, li], stages)
                lc = {site: quantized.SiteCalib(
                    cal_idx[site][0, li], sels[site])
                    for site in cal_idx}
                x, _ = quantized.quant_layer_forward(
                    cfg, lp, x, cos, sin, lc, qcfg)
            done = step - (pp - 1)
            if 0 <= done < m:
                h = llama.rms_norm(x, final_norm, cfg.rms_eps)
                lg = jnp.dot(h, head.T,
                             preferred_element_type=jnp.float32)
                lg = jnp.where(s == pp - 1, lg, 0.0)
                out = jax.lax.dynamic_update_slice(
                    out, lg, (done * mb, 0, 0))
            if pp > 1:
                carry = jax.lax.ppermute(x, "pp", fwd_perm)
        return jax.lax.psum(out, "pp")

    stages = dict(pparams["stages"])
    lspec = jax.tree.map(lambda _: P("pp"), stages)
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P(), P(), lspec, P()),
                  out_specs=P(), check_vma=False)
    return jax.jit(f)(pparams["embed"], pparams["final_norm"], head,
                      stages, tokens)
