"""Pipeline-parallel serving engine: prefill + paged-int4 decode with
per-STAGE KV pools (round-2 VERDICT missing #3 / next #6).

pp is the CAPACITY dimension (pp.py:29-31): each device holds L/pp
layers' packed weights AND only those layers' KV pages, so a model
whose quantized weights + KV exceed one chip's HBM serves across pp
chips. Greenfield TPU design — the reference has nothing distributed
(SURVEY.md §2.3; its parallel_utils.py layer-placement is disabled).

Mechanics (SPMD, one shard_map body over the "pp" axis):
  - layer params are quantized FUSED (same packs as the single-chip
    engine — token-identical numerics), stacked [pp, L/pp, ...] and
    sharded over "pp"; each stage's KV pool likewise stacks [pp, ...]
    per stage-local layer.
  - a decode/prefill step is a RELAY of pp stage-steps: the activation
    ppermutes stage-to-stage; stage s does real work at relay step s
    (other steps compute garbage that is never written — appends are
    masked to the active stage, branch-free SPMD). Wall-clock per
    token = the full L-layer time (same as one big chip), capacity and
    HBM bandwidth scale with pp. Decode GEMMs are weight-bound, so
    relaying the FULL batch beats GPipe microbatching here (micro-
    batches would re-stream each stage's weights (m+pp-1)/pp times).
  - the last stage computes logits; one psum broadcasts them.

The layer-uniform select_num restriction of the no-cache pp forward
(pp.py:69-74) is DROPPED by bucketing: every layer's per-site select
is raised to the stack-wide maximum (selecting extra low-importance
channels only adds near-zero residuals — strictly more accurate, and
zero-scale padding keeps shapes exact), so real per-layer calibration
output stacks cleanly.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from ..engine.engine import (EngineConfig, InferenceEngine,
                             _attn_common, _o_proj, _mlp)
from ..models import llama, quantized
from ..cache import paged
from ..kernels.attention import flash_attention
from ..kernels.paged_decode import paged_decode

Params = Dict[str, Any]


def bucket_calib_uniform(calib: List[Dict[str, Any]]):
    """Raise every layer's per-site select_num to the maximum across
    layers (stacking needs uniform packed shapes; extra selected
    channels carry near-zero residuals, so accuracy only improves)."""
    out = []
    smax = {site: max(c[site].select_num for c in calib)
            for site in calib[0]}
    for c in calib:
        out.append({site: quantized.SiteCalib(
            c[site].reorder_index, smax[site])
            for site in calib[0]})
    return out


class PPInferenceEngine(InferenceEngine):
    """Pipeline-staged quantized serving engine (same public API as
    InferenceEngine: new_state / prefill / decode_step / decode_scan /
    generate)."""

    def __init__(self, cfg: ModelConfig, params, calib,
                 qcfg: QuantConfig, ecfg: EngineConfig, mesh: Mesh):
        pp = mesh.shape["pp"]
        assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
        assert qcfg.use_kernels and qcfg.quant_type == "NVFP4", \
            "PP engine supports the packed NVFP4 path"
        if ecfg.dynamic_pages:
            raise ValueError("PP engine: dynamic_pages not supported "
                             "yet (static per-stage pools)")
        self.mesh = mesh
        self.pp = pp
        self.l_per = cfg.num_layers // pp
        calib = bucket_calib_uniform(calib)

        qlayers = [quantized.quantize_layer_params_fused(
            lp, calib[i], qcfg) for i, lp in enumerate(params["layers"])]

        def stack(*xs):
            return jnp.stack(list(xs)).reshape(
                (pp, self.l_per) + xs[0].shape)

        stages = jax.tree.map(stack, *qlayers)
        # stacked per-site reorder indices ride along (sharded with
        # the stage axis); select counts are static + uniform
        # sites come from the calib itself (MoE configs carry extra
        # sites, e.g. the shared-expert down input)
        self._sels = {site: calib[0][site].select_num
                      for site in calib[0]}
        self._calib_idx = {
            site: stack(*[calib[i][site].reorder_index
                          for i in range(cfg.num_layers)])
            for site in calib[0]}
        sh = NamedSharding(mesh, P("pp"))
        repl = NamedSharding(mesh, P())
        self._calib_idx = jax.tree.map(
            lambda x: jax.device_put(x, sh), self._calib_idx)
        qparams = {
            "embed": jax.device_put(params["embed"], repl),
            "final_norm": jax.device_put(params["final_norm"], repl),
            "stages": jax.tree.map(lambda x: jax.device_put(x, sh),
                                   stages),
            "layers": [],      # base-class API compat (unused)
        }
        if "lm_head" in params:
            qparams["lm_head"] = jax.device_put(params["lm_head"], repl)
        super().__init__(cfg, qparams, calib, qcfg, ecfg,
                         quantize_params=False)
        self._sspec = jax.tree.map(lambda _: P("pp"),
                                   self.qparams["stages"])
        self._cidx_spec = jax.tree.map(lambda _: P("pp"),
                                       self._calib_idx)
        l = self.l_per
        self._cache_spec = paged.PagedKVCache(
            tuple(P("pp") for _ in range(l)),
            tuple(P("pp") for _ in range(l)))
        if "lm_head_packed" in self.qparams:
            self._head = self.qparams["lm_head_packed"]
        else:
            self._head = self.qparams.get("lm_head",
                                          self.qparams["embed"])
        self._head_spec = jax.tree.map(lambda _: P(), self._head)

    # -- state: per-stage pools ---------------------------------------------

    def new_state(self):
        """Each stage owns a FULL page pool for its L/pp layers:
        stage-local layer j's arrays stack [pp, pages, ...] so slice s
        holds global layer s*l_per + j. Total KV memory per chip =
        1/pp of the whole model's."""
        e = self.ecfg
        cfg1 = self.cfg.replace(num_layers=self.l_per)
        base = paged.init_cache(cfg1, e.total_pages(), e.page_size)
        codes_sh = NamedSharding(self.mesh, P("pp"))
        cache = paged.PagedKVCache(
            tuple(jax.device_put(
                jnp.broadcast_to(a[None], (self.pp,) + a.shape),
                codes_sh) for a in base.codes),
            tuple(jax.device_put(
                jnp.broadcast_to(a[None], (self.pp,) + a.shape),
                codes_sh) for a in base.params))
        pps = e.pages_per_seq
        pt = 1 + (jnp.arange(e.max_batch)[:, None] * pps
                  + jnp.arange(pps)[None, :]).astype(jnp.int32)
        return (cache, pt, jnp.zeros((e.max_batch,), jnp.int32))

    # -- relay bodies (run inside shard_map) --------------------------------

    def _stage_layers(self, stages, cidx, x, cos, sin, cache, pt,
                      append_pos, attn_lens, step: int, mode: str):
        """Run this stage's L/pp layers on x, masking appends to the
        active stage (s == step). mode: "prefill" (flash over the
        current chunk), "decode" (paged 1-token), or "verify"
        (paged flash-prefill over W tokens — attn_lens is
        (q_starts, kv_lens)). Returns (x, new local cache)."""
        cfg = self.cfg
        # hybrid prefill_act_bits: "prefill" quantizes with
        # qcfg_prefill; "decode"/"verify" with qcfg (verify must match
        # decode numerics for speculative token-identity)
        qcfg = self.qcfg_prefill if mode == "prefill" else self.qcfg
        s = jax.lax.axis_index("pp")
        b, t, d = x.shape
        dt = x.dtype
        ap = jnp.where(s == step, append_pos, -1)
        codes, params = list(cache.codes), list(cache.params)
        for j in range(self.l_per):
            p = jax.tree.map(lambda a, j=j: a[0, j], stages)
            lc = {site: quantized.SiteCalib(cidx[site][0, j],
                                            self._sels[site])
                  for site in cidx}
            q, k, v = _attn_common(cfg, p, x.reshape(b * t, -1), lc,
                                   qcfg, b, t, dt,
                                   norm_w=p["attn_norm"])
            q, k_r = llama.apply_rope(q, k, cos, sin)
            tmp = paged.PagedKVCache((codes[j][0],), (params[j][0],))
            tmp = paged.append_kv(tmp, 0, k_r, v, pt, ap)
            codes[j] = tmp.codes[0][None]
            params[j] = tmp.params[0][None]
            if mode == "decode":
                attn = paged_decode(q[:, 0], tmp, 0, pt,
                                    attn_lens)[:, None]
            elif mode == "verify":
                from ..kernels.paged_decode import paged_prefill
                starts, kv_lens = attn_lens
                attn = paged_prefill(q, tmp, 0, pt, starts, kv_lens)
            else:
                attn = flash_attention(q, k_r, v)
            x = x + _o_proj(cfg, p, attn.astype(dt), lc, qcfg, b, t, dt)
            x = x + _mlp(cfg, p, x, lc, qcfg,
                         norm_w=p["mlp_norm"])
        return x, paged.PagedKVCache(tuple(codes), tuple(params))

    def _relay(self, final_norm, head, stages, cidx, cache, pt, x,
               cos, sin, append_pos, attn_lens, last_idx, mode):
        """pp relay steps: activation ppermutes stage-to-stage; the
        last stage computes logits (psum-broadcast). last_idx=None
        (verify mode) returns every position's logits [B, T, V]."""
        pp = self.pp
        fwd = [(j, j + 1) for j in range(pp - 1)]
        s = jax.lax.axis_index("pp")
        cfg = self.cfg
        carry = x
        logits = None
        for step in range(pp):
            xs = x if step == 0 else carry
            xs, cache = self._stage_layers(
                stages, cidx, xs, cos, sin, cache, pt, append_pos,
                attn_lens, step, mode)
            if step == pp - 1:
                h = llama.rms_norm(xs, final_norm, cfg.rms_eps)
                if last_idx is None:
                    b, t, _ = h.shape
                    lg = self._head_logits_local(
                        head, h.reshape(b * t, -1)).reshape(b, t, -1)
                else:
                    last = jnp.take_along_axis(
                        h, last_idx[:, None, None].astype(jnp.int32)
                        .repeat(h.shape[-1], -1), axis=1)[:, 0]
                    lg = self._head_logits_local(head, last)
                logits = jnp.where(s == pp - 1, lg, 0.0)
            if pp > 1:
                carry = jax.lax.ppermute(xs, "pp", fwd)
        return jax.lax.psum(logits, "pp"), cache

    def _head_logits_local(self, head, last):
        if "lm_head_packed" in self.qparams:
            from ..kernels import gemm as gk
            xp = jnp.pad(last.astype(jnp.bfloat16),
                         ((0, 0), (0, head.kq - last.shape[-1])))
            return gk.gemm_dequant(xp, head, jnp.float32(1.0),
                                   out_dtype=jnp.float32)
        return jnp.dot(last, head.T, preferred_element_type=jnp.float32)

    def _prefill_local(self, embed, final_norm, head, stages, cidx,
                       cache, pt, toks, lens):
        cfg = self.cfg
        b, t = toks.shape
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        cos, sin = llama.rope_cos_sin(cfg, positions)
        append_pos = jnp.where(positions < lens[:, None], positions, -1)
        x = embed[toks]
        last_idx = jnp.maximum(lens - 1, 0)
        logits, cache = self._relay(
            final_norm, head, stages, cidx, cache, pt, x, cos, sin,
            append_pos, None, last_idx, "prefill")
        return logits, cache

    def _verify_local(self, embed, final_norm, head, stages, cidx,
                      cache, pt, toks, lens, start):
        """Speculative verify relay: W tokens per row append at
        absolute positions start..lens-1 and attend over the paged
        pool via the flash-prefill kernel; logits for ALL W positions
        (engine.verify_step contract)."""
        cfg = self.cfg
        b, t = toks.shape
        positions = start[:, None] + jnp.arange(t)[None, :]
        cos, sin = llama.rope_cos_sin(cfg, positions)
        append_pos = jnp.where(positions < lens[:, None], positions,
                               -1)
        kv_lens = jnp.minimum(lens, start + t)
        x = embed[toks]
        logits, cache = self._relay(
            final_norm, head, stages, cidx, cache, pt, x, cos, sin,
            append_pos, (start, kv_lens), None, "verify")
        return logits, cache

    def _decode_local(self, embed, final_norm, head, stages, cidx,
                      cache, pt, toks, seq_lens, act):
        cfg = self.cfg
        positions = seq_lens[:, None]
        cos, sin = llama.rope_cos_sin(cfg, positions)
        append_pos = jnp.where(act[:, None], positions, -1)
        new_lens = seq_lens + act.astype(jnp.int32)
        x = embed[toks[:, None]]
        last_idx = jnp.zeros_like(seq_lens)
        logits, cache = self._relay(
            final_norm, head, stages, cidx, cache, pt, x, cos, sin,
            append_pos, new_lens, last_idx, "decode")
        return logits, cache, new_lens

    # -- public steps --------------------------------------------------------

    def _common_specs(self):
        return (P(), P(), self._head_spec, self._sspec,
                self._cidx_spec, self._cache_spec, P())

    def _common_args(self, cache, pt):
        return (self.qparams["embed"], self.qparams["final_norm"],
                self._head, self.qparams["stages"], self._calib_idx,
                cache, pt)

    def prefill(self, state, tokens, lens, starts=None):
        if tokens.shape[1] > self.ecfg.max_seq_len:
            raise ValueError("prefill exceeds KV capacity")
        if starts is not None:
            raise ValueError("PP engine: prefix sharing (per-row "
                             "starts) not supported yet")
        cache, pt, seq_lens = state
        key = ("pp", tuple(tokens.shape))
        if key not in self._prefill_jit:
            f = shard_map(self._prefill_local, mesh=self.mesh,
                          in_specs=self._common_specs() + (P(), P()),
                          out_specs=(P(), self._cache_spec),
                          check_vma=False)
            self._prefill_jit[key] = jax.jit(f, donate_argnums=(5,))
        logits, cache = self._prefill_jit[key](
            *self._common_args(cache, pt), tokens,
            lens.astype(jnp.int32))
        lens = lens.astype(jnp.int32)
        return logits, (cache, pt, jnp.where(lens > 0, lens, seq_lens))

    def decode_step(self, state, tokens, active):
        cache, pt, seq_lens = state
        if self._decode_jit is None:
            f = shard_map(self._decode_local, mesh=self.mesh,
                          in_specs=self._common_specs() + (P(), P(),
                                                           P()),
                          out_specs=(P(), self._cache_spec, P()),
                          check_vma=False)
            self._decode_jit = jax.jit(f, donate_argnums=(5,))
        logits, cache, new_lens = self._decode_jit(
            *self._common_args(cache, pt), tokens, seq_lens, active)
        return logits, (cache, pt, new_lens)

    def verify_step(self, state, tokens, valid):
        """Speculative multi-token verify under pp (same contract as
        InferenceEngine.verify_step; logits relay through the last
        stage like every step, seq_lens unchanged — caller commits)."""
        cache, pt, seq_lens = state
        b, w = tokens.shape
        key = ("verify", b, w)
        if key not in self._prefill_jit:
            f = shard_map(self._verify_local, mesh=self.mesh,
                          in_specs=self._common_specs() + (P(), P(),
                                                           P()),
                          out_specs=(P(), self._cache_spec),
                          check_vma=False)
            self._prefill_jit[key] = jax.jit(f, donate_argnums=(5,))
        valid = jnp.asarray(valid, jnp.int32)
        logits, cache = self._prefill_jit[key](
            *self._common_args(cache, pt), tokens,
            seq_lens + valid, seq_lens)
        return logits, (cache, pt, seq_lens)

    def decode_scan(self, state, first_tokens, active, num_steps,
                    eos_id=None, sampling=None, seed=0):
        cache, pt, seq_lens = state
        if sampling is not None and sampling.is_greedy:
            sampling = None
        key = (num_steps, eos_id, sampling, seed if sampling else 0)
        if key not in self._scan_jit:
            def scan_local(embed, final_norm, head, stages, cidx,
                           cache, pt, first, seq_lens, act0):
                # every pp shard sees the SAME psum-broadcast logits
                # and must draw the same token: replicated key
                rk0 = jax.random.PRNGKey(seed)
                def body(carry, _):
                    cache, lens, toks, act, rk = carry
                    logits, cache, lens = self._decode_local(
                        embed, final_norm, head, stages, cidx, cache,
                        pt, toks, lens, act)
                    if sampling is None:
                        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    else:
                        from ..engine.sampling import sample_p
                        rk, sk = jax.random.split(rk)
                        nxt = sample_p(logits, sk, sampling)
                    nxt = jnp.where(act, nxt, toks)
                    if eos_id is not None:
                        act = act & (nxt != eos_id)
                    return (cache, lens, nxt, act, rk), nxt
                (cache2, lens2, _, _, _), toks = jax.lax.scan(
                    body, (cache, seq_lens, first, act0, rk0), None,
                    length=num_steps)
                return toks.T, cache2, lens2

            f = shard_map(scan_local, mesh=self.mesh,
                          in_specs=self._common_specs() + (P(), P(),
                                                           P()),
                          out_specs=(P(), self._cache_spec, P()),
                          check_vma=False)
            self._scan_jit[key] = jax.jit(f, donate_argnums=(5,))
        toks, cache, lens = self._scan_jit[key](
            *self._common_args(cache, pt), first_tokens, seq_lens,
            active)
        return toks, (cache, pt, lens)
