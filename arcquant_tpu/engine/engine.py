"""Inference engine: W4A4 quantized decoder serving on TPU.

TPU re-design of the reference's perf model + benchmark stack
(benchmarks/modeling_arc.py + benchmark_e2e_arc.py), upgraded from a
timing harness into a real serving engine:

  - prefill: fused rmsnorm+quantize → packed dequant-GEMMs → RoPE →
    Pallas flash attention over the (bf16) current chunk, while the
    post-RoPE K / V stream is quantized into the paged int4 pool
    (the reference prefills through bf16 flashinfer and *separately*
    maintains the latent i4 pool it never wires up — here there is one
    path, SURVEY.md §7 delta 5).
  - decode: one jitted step: quantize-append the new token's K/V, then
    the Pallas paged int4 flash-decode kernel (replaces
    batch_decode_i4, kernels/.../decode.cuh:492-689).
  - the KV cache pytree is donated through both steps, so pages update
    in place (the reference relies on mutable CUDA tensors; XLA gets
    the same effect from buffer donation).

Everything jits once per (batch, prefill_len) shape; no Python in the
token loop except the host-side page allocator (scheduler.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig, KV_PAGE_SIZE
from ..models import llama, quantized
from ..cache import paged
from ..kernels.attention import flash_attention
from ..kernels.paged_decode import paged_decode, paged_prefill


def _xla_options() -> Optional[dict]:
    """Per-jit XLA compiler options for the engine's step programs
    (env ARC_XLA_OPTS as JSON, e.g.
    '{"xla_tpu_sliced_prefetch_min_bytes": "1000000000"}').
    TPU-only flags cannot ride XLA_FLAGS here: the CLIENT process
    parses that env with a CPU jaxlib and aborts on unknown flags;
    per-compile options are forwarded to the remote TPU compiler."""
    import json
    s = os.environ.get("ARC_XLA_OPTS", "")
    return json.loads(s) if s else None


@dataclass(frozen=True)
class EngineConfig:
    max_batch: int = 8
    max_seq_len: int = 2048
    page_size: int = KV_PAGE_SIZE
    num_pages: int = 0          # 0 = auto: max_batch * max_seq pages
    # dynamic_pages=True: the page table starts empty (all-sink) and a
    # host-side PageAllocator (engine/scheduler.py) maps pages on
    # demand — the pool may then be SMALLER than max_batch*max_seq
    # (memory oversubscription; requests queue when the pool is full).
    # False: static layout, slot i owns pages [1+i*pps, 1+(i+1)*pps).
    dynamic_pages: bool = False
    # >0: prompts longer than this prefill in chunks of this many
    # tokens — each chunk attends directly over the int4 paged pool
    # (so arbitrarily long prompts use bounded activation memory).
    # 0 = single-shot only (reference behavior: kv_cache.py:174-188
    # just raises).
    prefill_chunk: int = 0
    # Refcounted prefix sharing (requires dynamic_pages): requests
    # whose prompt shares a page-aligned prefix with a cached one
    # reuse those pages (one copy in the pool) and prefill only the
    # suffix via the per-row-start paged flash-prefill.
    prefix_sharing: bool = False

    @property
    def pages_per_seq(self) -> int:
        return -(-self.max_seq_len // self.page_size)

    def __post_init__(self):
        # Static layout assigns pages 1..max_batch*pps; a smaller
        # explicit pool would make appends silently drop (mode='drop')
        # and decode read garbage pages (round-1 ADVICE). Dynamic mode
        # only needs one full sequence to fit.
        if self.prefix_sharing and not self.dynamic_pages:
            raise ValueError("prefix_sharing requires dynamic_pages "
                             "(the PageAllocator owns refcounts)")
        if self.dynamic_pages:
            need = self.pages_per_seq + 1
        else:
            need = self.max_batch * self.pages_per_seq + 1
        if self.num_pages and self.num_pages < need:
            raise ValueError(
                f"num_pages={self.num_pages} < {need} required "
                f"({'one sequence + sink' if self.dynamic_pages else 'max_batch*pages_per_seq+1 for the static page layout'})")

    def total_pages(self) -> int:
        if self.num_pages:
            return self.num_pages
        # +1 reserved sink page (page id 0 stays unused as scatter sink)
        return self.max_batch * self.pages_per_seq + 1


# ---------------------------------------------------------------------------
# Layer forwards shared by prefill and decode
# ---------------------------------------------------------------------------

def _norm_quantize(x2, norm_w, eps, site, qcfg):
    """rmsnorm + activation quantize for a site. On the NVFP4 kernel
    path this is ONE fused Pallas pass at prefill shapes (the norm is
    never written to HBM); every other configuration applies
    llama.rms_norm then the site quantize. The fused pass mimics
    rms_norm's rounding chain, but the variance SUM reduce is
    order-dependent across lowerings, so fused-vs-unfused can differ
    by one e2m1 step on ulp-boundary elements (tests/test_actq.py
    TestRmsnormFused pins the bound). Returns (xa, gx)."""
    if (qcfg.quant_type == "NVFP4" and qcfg.use_kernels
            and qcfg.act_bits == 4):
        from ..kernels import quantize as qk
        return qk.rmsnorm_quantize_x(
            x2, norm_w, eps, site.reorder_index, site.select_num,
            per_row=qcfg.act_scale == "row")
    x2 = llama.rms_norm(x2, norm_w, eps)
    return quantized._act_quantize(x2, site, qcfg)


def _single_gemm_fused_ok(pw, site, m, d, qcfg):
    """Gate for the quantize+GEMM single-launch megakernel at an
    engine site (attn_in/o_in): NVFP4 kernel path, row scales,
    select-free site, the external quantize would take the Pallas
    path (identical expressions), and the weight's k split is
    streamable."""
    if not (qcfg.quant_type == "NVFP4" and qcfg.use_kernels
            and qcfg.act_bits == 4 and qcfg.act_scale == "row"
            and site.select_num == 0 and hasattr(pw, "kq")):
        return False
    from ..kernels import mlp_fused
    from ..kernels.quantize import _actq_pallas_ok
    return (_actq_pallas_ok(m, d, pw.kq, True)
            and mlp_fused.gemm_actq_ok(pw, m, d, True, 0))


def _attn_common(cfg, p, x2, layer_calib, qcfg, b, t,
                 dtype=jnp.bfloat16, norm_w=None):
    """Quantize + fused QKV projection (one packed GEMM), split and
    reshaped to heads. Pass norm_w to fold the pre-attention rmsnorm
    into the quantize (x2 is then the PRE-norm residual stream).

    At decode shapes the whole site runs as ONE launch (rmsnorm +
    quantize + streamed qkv GEMM — kernels/mlp_fused.py
    gemm_w8_actq_fused, bit-exact vs the two-op chain)."""
    m, d = x2.shape
    if (norm_w is not None and _single_gemm_fused_ok(
            p["qkv"], layer_calib["attn_in"], m, d, qcfg)):
        from ..kernels import mlp_fused
        qkv, _ = mlp_fused.gemm_w8_actq_fused(
            x2, p["qkv"], d, out_dtype=dtype, norm_w=norm_w,
            norm_eps=cfg.rms_eps)
    else:
        if norm_w is None:
            xa, gx = quantized._act_quantize(
                x2, layer_calib["attn_in"], qcfg)
        else:
            xa, gx = _norm_quantize(x2, norm_w, cfg.rms_eps,
                                    layer_calib["attn_in"], qcfg)
        qkv = quantized._q_linear(p["qkv"], xa, gx, qcfg, dtype)
    qs, kvs = cfg.q_size, cfg.kv_size
    q = qkv[:, :qs].reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = qkv[:, qs:qs + kvs].reshape(b, t, cfg.num_kv_heads,
                                    cfg.head_dim)
    v = qkv[:, qs + kvs:].reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    return q, k, v


def _o_proj(cfg, p, attn, layer_calib, qcfg, b, t,
            dtype=jnp.bfloat16):
    attn2 = attn.reshape(b * t, cfg.q_size)
    if _single_gemm_fused_ok(p["o"], layer_calib["o_in"],
                             b * t, cfg.q_size, qcfg):
        from ..kernels import mlp_fused
        y, _ = mlp_fused.gemm_w8_actq_fused(
            attn2, p["o"], cfg.q_size, out_dtype=dtype)
        return y.reshape(b, t, -1)
    oa, go = quantized._act_quantize(attn2, layer_calib["o_in"], qcfg)
    return quantized._q_linear(p["o"], oa, go, qcfg,
                               dtype).reshape(b, t, -1)


def _mlp(cfg, p, x, layer_calib, qcfg, norm_w=None):
    if norm_w is not None and "moe" in p:
        x = llama.rms_norm(x, norm_w, cfg.rms_eps)
        norm_w = None
    if "moe" in p:
        # MoE layer: routed stacked-expert FFN (+ optional Qwen shared
        # expert). Decode sees B·1 tokens -> dense mode; prefill above
        # DENSE_MODE_MAX_T tokens -> capacity dispatch (models/moe.py).
        from ..models import moe
        return moe.moe_block(cfg, p["moe"], x, layer_calib, qcfg)
    b, t, d = x.shape
    dtype = x.dtype
    x2 = x.reshape(b * t, d)
    if (norm_w is not None and qcfg.quant_type == "NVFP4"
            and qcfg.use_kernels and qcfg.act_bits == 4
            and qcfg.act_scale == "row"
            and layer_calib["mlp_in"].select_num == 0):
        # norm-mode megakernel: rmsnorm + quantize fold INTO the MLP
        # megakernel (phase A) — one launch for the whole MLP. Gated
        # on the external path being the fused Pallas rmsnorm
        # quantize (identical expressions/block shape) so the fold
        # changes nothing numerically.
        from ..kernels import mlp_fused
        from ..kernels.quantize import _actq_pallas_ok
        f = p["gateup"].n // 2 if hasattr(p["gateup"], "n") else 0
        kq1 = p["gateup"].kq if hasattr(p["gateup"], "kq") else 0
        if (f and _actq_pallas_ok(b * t, d, kq1, True)
                and mlp_fused.mlp_fused_ok(
                    p["gateup"], p["down"], b * t, f, True,
                    layer_calib["down_in"].select_num)):
            out, _, _ = mlp_fused.mlp_w8_fused(
                x2, None, p["gateup"], p["down"], f, out_dtype=dtype,
                norm_w=norm_w, norm_eps=cfg.rms_eps)
            return out.reshape(b, t, d)
    if norm_w is None:
        xa, gx = quantized._act_quantize(x2, layer_calib["mlp_in"],
                                         qcfg)
    else:
        xa, gx = _norm_quantize(x2, norm_w, cfg.rms_eps,
                                layer_calib["mlp_in"], qcfg)
    if (qcfg.quant_type == "NVFP4" and qcfg.use_kernels
            and qcfg.act_bits == 4 and qcfg.act_scale == "row"):
        # decode-shape MLP megakernel: gateup GEMM + silu-mul +
        # act-quantize + down GEMM in ONE Pallas launch (weight codes
        # manually DMA-streamed, gu/xa2 never leave VMEM) — bit-exact
        # vs the chain below (tests/test_mlp_fused.py); gated off for
        # ARC-augmented down_in and non-512 k splits
        from ..kernels import mlp_fused
        f = p["gateup"].n // 2 if hasattr(p["gateup"], "n") else 0
        sel2 = layer_calib["down_in"].select_num
        if f and mlp_fused.mlp_fused_ok(
                p["gateup"], p["down"], b * t, f, True, sel2):
            out, _, _ = mlp_fused.mlp_w8_fused(
                xa, gx, p["gateup"], p["down"], f, out_dtype=dtype)
            return out.reshape(b, t, d)
        if (f and sel2 and hasattr(p["down"], "kq")
                and mlp_fused.gu_actq_ok(p["gateup"], b * t, f,
                                         p["down"].kq, True)):
            # ARC-augmented down_in: partial megakernel (gateup +
            # silu + quantize in one launch), residual injected from
            # the returned gu — the same column-local recompute
            # silu_mul_quantize_gu uses — then the ordinary down GEMM
            from ..kernels import quantize as qk
            xa2, gu, gx2 = mlp_fused.gateup_silu_quantize(
                xa, gx, p["gateup"], f, p["down"].kq, out_dtype=dtype)
            c2 = layer_calib["down_in"]
            idx = c2.reorder_index[-sel2:].astype(jnp.int32)
            g_cols = jnp.take(gu, idx, axis=1).astype(jnp.float32)
            u_cols = jnp.take(gu, idx + f, axis=1).astype(jnp.float32)
            prod_cols = (jax.nn.silu(g_cols) * u_cols).astype(gu.dtype)
            xa2 = qk._arc_residual_into(prod_cols, xa2, gx2, idx, f)
            return quantized._q_linear(p["down"], xa2, gx2, qcfg,
                                       dtype).reshape(b, t, d)
    # bf16 GEMM output + f32 silu·up mirrors the reference (half GEMM
    # out, float activation math, qLlamaLayer.py:422-443); an f32
    # gateup output materializes 2x the bytes of the widest activation
    # in the model (620 MB at bs=4 x 1024) for rounding the down_in
    # re-quantize immediately absorbs
    gu = quantized._q_linear(p["gateup"], xa, gx, qcfg, dtype)
    if (qcfg.quant_type == "NVFP4" and qcfg.use_kernels
            and qcfg.act_bits == 4):
        # fused silu-mul-quantize over the UNSLICED gateup output: one
        # HBM read of gu, no materialized product, GEMM-ready layout
        # (falls back internally below the Pallas M threshold —
        # numerics identical incl. the bf16 product round)
        from ..kernels import quantize as qk
        c = layer_calib["down_in"]
        ia, gi = qk.silu_mul_quantize_gu(
            gu, c.reorder_index, c.select_num,
            per_row=qcfg.act_scale == "row")
    else:
        gate, up = gu[:, :gu.shape[1] // 2], gu[:, gu.shape[1] // 2:]
        inter = (jax.nn.silu(gate.astype(jnp.float32))
                 * up.astype(jnp.float32)).astype(dtype)
        ia, gi = quantized._act_quantize(inter, layer_calib["down_in"],
                                         qcfg)
    return quantized._q_linear(p["down"], ia, gi, qcfg,
                               dtype).reshape(b, t, d)


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------

class InferenceEngine:
    """Quantized decoder engine over a paged int4 KV cache.

    Usage:
      eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
      state = eng.new_state()
      logits, state = eng.prefill(state, tokens, lens, slot_ids)
      logits, state = eng.decode_step(state, tokens, active_mask)
    """

    def __init__(self, cfg: ModelConfig, params, calib, qcfg: QuantConfig,
                 ecfg: EngineConfig, quantize_params: bool = True):
        self.cfg = cfg
        self.qcfg = qcfg
        # hybrid serving mode: per-phase activation precision (the
        # prefill forwards quantize with this, decode with qcfg)
        self.qcfg_prefill = (qcfg.replace(act_bits=qcfg.prefill_act_bits)
                             if qcfg.prefill_act_bits else qcfg)
        self.ecfg = ecfg
        self.calib = calib
        if quantize_params:
            self.qparams = {k: v for k, v in params.items()
                            if k != "layers"}
            self.qparams["layers"] = [
                quantized.quantize_layer_params_fused(lp, calib[i],
                                                      qcfg)
                for i, lp in enumerate(params["layers"])]
        else:
            self.qparams = params
        if (qcfg.quantize_lm_head and qcfg.quant_type == "NVFP4"
                and "lm_head_packed" not in self.qparams):
            from ..quant import packing
            head = self.qparams.get("lm_head", self.qparams["embed"])
            ridx = jnp.arange(head.shape[1], dtype=jnp.int32)
            # pack in row chunks: the f32 transients of a one-shot pack
            # of a 150k-vocab head spike ~6 GB
            from ..quant import numerics as N
            gs = (None if qcfg.w_scale == "channel"
                  else jnp.max(jnp.abs(head)).astype(jnp.float32)
                  * N.INV_NVFP4_GLOBAL_DIV)
            chunks = []
            step = 16384
            for i in range(0, head.shape[0], step):
                pw = packing.pack_weight_arc(
                    head[i:i + step], ridx, 0, fmt=qcfg.weight_fmt,
                    w_scale=qcfg.w_scale, global_scale=gs)
                # force materialization so the f32 pack transients of
                # successive chunks don't coexist (block_until_ready
                # does not wait through the axon tunnel; a fetch does)
                float(jnp.sum(pw.scales[0, :8].astype(jnp.float32)))
                chunks.append(pw)
            cls0 = type(chunks[0])
            self.qparams["lm_head_packed"] = cls0(
                codes=jnp.concatenate([c.codes for c in chunks], axis=1),
                scales=jnp.concatenate([c.scales for c in chunks],
                                       axis=1),
                global_scale=(jnp.concatenate(
                    [c.global_scale.reshape(-1) for c in chunks])
                    if qcfg.w_scale == "channel"
                    else chunks[0].global_scale),
                bias=None)
            # the bf16 head is never read again (untied checkpoints
            # free ~1 GB at 150k vocab; tied ones keep embed for the
            # token lookup)
            self.qparams.pop("lm_head", None)
        self._prefill_jit: Dict[Tuple[int, int], Any] = {}
        self._decode_jit = None
        self._scan_jit: Dict[Any, Any] = {}
        # Measured fused-vs-DMA decode dispatch (opt-in via
        # ARC_GEMM_AUTOTUNE=1): tune this engine's actual weight
        # shapes at the serving batch size BEFORE the first compile,
        # so gemm_dequant's trace-time lookup sees the winners.
        from ..kernels import autotune
        if autotune.should_autotune():
            autotune.autotune_engine(self.qparams, ecfg.max_batch)

    @classmethod
    def dummy(cls, cfg: ModelConfig, calib, qcfg: QuantConfig,
              ecfg: EngineConfig, seed: int = 0,
              dtype=jnp.bfloat16) -> "InferenceEngine":
        """Build an engine with random ("dummy") weights, quantizing
        layer-by-layer so the full bf16 model never materializes
        (reference analog: modeling_arc.py dummy-weight perf model,
        B=0/SFB=127 — here the weights are real random values so the
        GEMMs exercise realistic code/scale distributions)."""
        keys = jax.random.split(jax.random.PRNGKey(seed),
                                cfg.num_layers + 2)
        qlayers = []
        for i in range(cfg.num_layers):
            lp = llama.init_layer_params(cfg, keys[i + 1], dtype)
            qlp = quantized.quantize_layer_params_fused(lp, calib[i],
                                                        qcfg)
            qlp = jax.tree.map(
                lambda x: jax.block_until_ready(x)
                if hasattr(x, "block_until_ready") else x, qlp)
            del lp
            qlayers.append(qlp)
        qparams = {
            "embed": jax.random.normal(
                keys[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02,
            "final_norm": jnp.ones((cfg.hidden_size,), dtype),
            "layers": qlayers,
        }
        return cls(cfg, qparams, calib, qcfg, ecfg,
                   quantize_params=False)

    def _head_logits(self, qparams, x2d):
        """LM head: bf16 dot, or W4A16 packed GEMM when the head is
        quantized (exact activations: pad x to kq, unit act scale)."""
        if "lm_head_packed" in qparams:
            from ..kernels import gemm as gk
            pw = qparams["lm_head_packed"]
            xp = jnp.pad(x2d.astype(jnp.bfloat16),
                         ((0, 0), (0, pw.kq - x2d.shape[-1])))
            return gk.gemm_dequant(xp, pw, jnp.float32(1.0),
                                   out_dtype=jnp.float32)
        head = qparams.get("lm_head", qparams["embed"])
        return jnp.dot(x2d, head.T, preferred_element_type=jnp.float32)

    # -- state ------------------------------------------------------------

    def page_groups(self):
        """(n_groups, pages_per_group, slots_per_group) for the
        host-side PageAllocator: the single-chip engine has ONE page
        pool; dp-sharded engines override with per-dp-group local
        pools (scheduler.ContinuousBatcher builds one free list per
        group)."""
        return (1, self.ecfg.total_pages(), self.ecfg.max_batch)

    def new_state(self):
        """(cache, page_table, seq_lens). Static layout: slot i gets
        pages [1 + i*pps, 1 + (i+1)*pps); page 0 is the masked-scatter
        sink. Dynamic mode (ecfg.dynamic_pages): the table starts
        all-sink and the scheduler's PageAllocator fills rows in."""
        e = self.ecfg
        cache = paged.init_cache(self.cfg, e.total_pages(), e.page_size)
        pps = e.pages_per_seq
        if e.dynamic_pages:
            pt = jnp.zeros((e.max_batch, pps), jnp.int32)
        else:
            pt = 1 + (jnp.arange(e.max_batch)[:, None] * pps
                      + jnp.arange(pps)[None, :]).astype(jnp.int32)
        seq_lens = jnp.zeros((e.max_batch,), jnp.int32)
        return (cache, pt, seq_lens)

    # -- forward pieces ----------------------------------------------------

    def _prefill_forward(self, qparams, cache, page_table, tokens, lens):
        """tokens [B, T] (right-padded), lens [B] true lengths.
        Returns (last_logits [B, V], cache)."""
        cfg, qcfg, calib = self.cfg, self.qcfg_prefill, self.calib
        b, t = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        cos, sin = llama.rope_cos_sin(cfg, positions)
        x = qparams["embed"][tokens]
        dt = x.dtype
        append_pos = jnp.where(positions < lens[:, None], positions, -1)

        for li, p in enumerate(qparams["layers"]):
            lc = calib[li]
            q, k, v = _attn_common(cfg, p, x.reshape(b * t, -1), lc,
                                   qcfg, b, t, dt,
                                   norm_w=p["attn_norm"])
            q, k_r = llama.apply_rope(q, k, cos, sin)
            cache = paged.append_kv(cache, li, k_r, v, page_table,
                                    append_pos)
            attn = flash_attention(q, k_r, v)
            x = x + _o_proj(cfg, p, attn, lc, qcfg, b, t, dt)
            x = x + _mlp(cfg, p, x, lc, qcfg,
                         norm_w=p["mlp_norm"])

        x = llama.rms_norm(x, qparams["final_norm"], cfg.rms_eps)
        last = jnp.take_along_axis(
            x, jnp.maximum(lens - 1, 0)[:, None, None].astype(jnp.int32)
            .repeat(x.shape[-1], -1), axis=1)[:, 0]
        logits = self._head_logits(qparams, last)
        return logits, cache

    def _prefill_chunk_forward(self, qparams, cache, page_table,
                               tokens, lens, start, all_logits=False,
                               qcfg=None):
        """One prefill chunk with per-ROW origin `start` ([B] i32,
        TRACED): appends the chunk's K/V into the paged pool and
        attends directly over the int4 pool (prefix + this chunk) via
        the paged flash-prefill kernel. Returns (chunk-local last
        logits, cache).

        All K/V — including the current chunk's — round-trips through
        the int4 pool, exactly what decode later reads; chunked
        prefill is therefore numerics-consistent with decode, and
        start being data means ONE compile covers every chunk index
        and ragged (prefix-shared) batches (round-2 VERDICT #4/#7)."""
        cfg, calib = self.cfg, self.calib
        if qcfg is None:
            qcfg = self.qcfg_prefill
        b, t = tokens.shape
        start = jnp.broadcast_to(jnp.asarray(start, jnp.int32), (b,))
        positions = start[:, None] + jnp.arange(t)[None, :]
        cos, sin = llama.rope_cos_sin(cfg, positions)
        x = qparams["embed"][tokens]
        dt = x.dtype
        append_pos = jnp.where(positions < lens[:, None], positions, -1)
        # tokens now in cache per row (rows past their end keep lens)
        kv_lens = jnp.minimum(lens, start + t)

        for li, p in enumerate(qparams["layers"]):
            lc = calib[li]
            q, k, v = _attn_common(cfg, p, x.reshape(b * t, -1), lc,
                                   qcfg, b, t, dt,
                                   norm_w=p["attn_norm"])
            q, k_r = llama.apply_rope(q, k, cos, sin)
            cache = paged.append_kv(cache, li, k_r, v, page_table,
                                    append_pos)
            attn = paged_prefill(q, cache, li, page_table, start,
                                 kv_lens)
            x = x + _o_proj(cfg, p, attn.astype(dt), lc, qcfg, b, t, dt)
            x = x + _mlp(cfg, p, x, lc, qcfg,
                         norm_w=p["mlp_norm"])

        x = llama.rms_norm(x, qparams["final_norm"], cfg.rms_eps)
        if all_logits:
            # speculative verify wants every position's next-token
            # distribution, not just the last
            lg = self._head_logits(qparams, x.reshape(b * t, -1))
            return lg.reshape(b, t, -1), cache
        # chunk-local index of each row's last valid token (clamped;
        # the host keeps only rows whose last token is in this chunk)
        local_last = jnp.clip(lens - 1 - start, 0, t - 1)
        last = jnp.take_along_axis(
            x, local_last[:, None, None].astype(jnp.int32)
            .repeat(x.shape[-1], -1), axis=1)[:, 0]
        return self._head_logits(qparams, last), cache

    def _decode_forward(self, qparams, cache, page_table, seq_lens,
                        tokens, active):
        """One token per active slot. tokens [B] i32; active [B] bool.
        Returns (logits [B, V], cache, new_seq_lens)."""
        cfg, qcfg, calib = self.cfg, self.qcfg, self.calib
        b = tokens.shape[0]
        positions = seq_lens[:, None]                      # [B, 1]
        cos, sin = llama.rope_cos_sin(cfg, positions)
        x = qparams["embed"][tokens[:, None]]
        dt = x.dtype
        append_pos = jnp.where(active[:, None], positions, -1)
        new_lens = seq_lens + active.astype(jnp.int32)

        for li, p in enumerate(qparams["layers"]):
            lc = calib[li]
            q, k, v = _attn_common(cfg, p, x.reshape(b, -1), lc,
                                   qcfg, b, 1, dt,
                                   norm_w=p["attn_norm"])
            q, k_r = llama.apply_rope(q, k, cos, sin)
            cache = paged.append_kv(cache, li, k_r, v, page_table,
                                    append_pos)
            attn = paged_decode(q[:, 0], cache, li, page_table,
                                new_lens)[:, None]
            x = x + _o_proj(cfg, p, attn.astype(dt), lc, qcfg,
                            b, 1, dt)
            x = x + _mlp(cfg, p, x, lc, qcfg,
                         norm_w=p["mlp_norm"])

        x = llama.rms_norm(x[:, 0], qparams["final_norm"], cfg.rms_eps)
        logits = self._head_logits(qparams, x)
        return logits, cache, new_lens

    # -- public jitted steps ----------------------------------------------

    def prefill(self, state, tokens, lens, starts=None):
        """Prefill the batch. tokens [B, T] right-padded; lens [B]
        (0 = inactive slot). Returns (last_logits, new_state).

        Prompts longer than EngineConfig.prefill_chunk (when set)
        stream through _prefill_chunk_forward chunk by chunk — bounded
        activation memory for arbitrarily long prompts (the reference
        can only raise, kv_cache.py:174-188).

        starts (optional [B] i32): per-row ABSOLUTE origin of
        tokens[:, 0] — prefix sharing prefills only each request's
        suffix; the shared prefix pages must already be mapped in the
        page table and lens stay absolute (prefix + suffix)."""
        if tokens.shape[1] > self.ecfg.max_seq_len:
            # KV capacity hard error (reference kv_cache.py:174-188)
            raise ValueError(
                f"prefill length {tokens.shape[1]} exceeds KV capacity "
                f"max_seq_len={self.ecfg.max_seq_len}")
        if starts is not None:
            return self._prefill_suffix(state, tokens, lens, starts)
        c = self.ecfg.prefill_chunk
        if c and tokens.shape[1] > c:
            return self._prefill_chunked(state, tokens, lens, c)
        cache, pt, seq_lens = state
        key = tuple(tokens.shape)
        if key not in self._prefill_jit:
            def f(qparams, cache, pt, tokens, lens):
                logits, cache = self._prefill_forward(
                    qparams, cache, pt, tokens, lens)
                return logits, cache
            self._prefill_jit[key] = jax.jit(
                f, donate_argnums=(1,),
                compiler_options=_xla_options())
        logits, cache = self._prefill_jit[key](
            self.qparams, cache, pt, tokens, lens)
        # joining slots (lens>0) restart their sequence; others keep
        # their running length
        lens = lens.astype(jnp.int32)
        new_lens = jnp.where(lens > 0, lens, seq_lens)
        return logits, (cache, pt, new_lens)

    def _prefill_chunked(self, state, tokens, lens, c: int):
        """Host loop over prefill chunks. The chunk origin is TRACED
        data, so ONE compile covers every chunk index (round-2 VERDICT
        weak #7: keying on the raw start compiled a 16k prompt 32
        times)."""
        cache, pt, seq_lens = state
        b, t = tokens.shape
        t_pad = -(-t // c) * c
        if t_pad != t:
            tokens = jnp.pad(tokens, ((0, 0), (0, t_pad - t)))
        lens = lens.astype(jnp.int32)
        logits = None
        for start in range(0, t_pad, c):
            lg, cache = self._chunk_step(
                cache, pt,
                jax.lax.dynamic_slice_in_dim(tokens, start, c, axis=1),
                lens, jnp.full((b,), start, jnp.int32))
            # keep each row's logits from the chunk holding its last
            # valid token
            here = (lens - 1 >= start) & (lens - 1 < start + c)
            logits = lg if logits is None else jnp.where(
                here[:, None], lg, logits)
        new_lens = jnp.where(lens > 0, lens, seq_lens)
        return logits, (cache, pt, new_lens)

    def _prefill_suffix(self, state, tokens, lens, starts):
        """Per-row-origin (ragged) prefill: row b's tokens[b, i] sits
        at absolute position starts[b] + i. Chunks are origin-relative
        (c-aligned from each row's start), one compile total — the
        paged flash-prefill kernel takes the origins as data."""
        cache, pt, seq_lens = state
        b, t = tokens.shape
        c = self.ecfg.prefill_chunk or t
        t_pad = -(-t // c) * c
        if t_pad != t:
            tokens = jnp.pad(tokens, ((0, 0), (0, t_pad - t)))
        lens = lens.astype(jnp.int32)
        starts = jnp.asarray(starts, jnp.int32)
        logits = None
        for off in range(0, t_pad, c):
            origin = starts + off
            lg, cache = self._chunk_step(
                cache, pt,
                jax.lax.dynamic_slice_in_dim(tokens, off, c, axis=1),
                lens, origin)
            here = (lens - 1 >= origin) & (lens - 1 < origin + c)
            logits = lg if logits is None else jnp.where(
                here[:, None], lg, logits)
        new_lens = jnp.where(lens > 0, lens, seq_lens)
        return logits, (cache, pt, new_lens)

    def _chunk_step(self, cache, pt, toks, lens, start):
        """One jitted chunk step (the origin `start` [B] is traced, so
        this compiles once per (B, chunk) shape). TPInferenceEngine
        overrides with the shard_map'd body."""
        b, c = toks.shape
        key = ("chunk", b, c)
        if key not in self._prefill_jit:
            def f(qparams, cache, pt, toks, lens, start):
                return self._prefill_chunk_forward(
                    qparams, cache, pt, toks, lens, start)
            self._prefill_jit[key] = jax.jit(
                f, donate_argnums=(1,),
                compiler_options=_xla_options())
        return self._prefill_jit[key](self.qparams, cache, pt, toks,
                                      lens, start)

    def verify_step(self, state, tokens, valid):
        """Speculative-decode verify: a MULTI-token decode step.

        tokens [B, W] — per row, the last committed token followed by
        W-1 draft tokens (right-padded); valid [B] in 1..W = how many
        are real. Appends their KV at absolute positions
        seq_lens..seq_lens+valid-1, attends over the int4 pool via the
        paged flash-prefill kernel (exactly what plain decode reads),
        and returns logits for ALL W positions [B, W, V] plus the
        cache-updated state.

        seq_lens in the returned state are UNCHANGED: the caller
        commits the accepted length per row (engine/spec.py). Stale KV
        beyond the committed length is overwritten by later appends
        and never attended (kv_lens masks) — rollback is free because
        appends address absolute positions."""
        cache, pt, seq_lens = state
        b, w = tokens.shape
        key = ("verify", b, w)
        if key not in self._prefill_jit:
            def f(qparams, cache, pt, toks, lens, start):
                # verify must match DECODE numerics (token-identity
                # with plain decode), not the prefill phase's — in
                # hybrid prefill_act_bits mode the two differ
                return self._prefill_chunk_forward(
                    qparams, cache, pt, toks, lens, start,
                    all_logits=True, qcfg=self.qcfg)
            self._prefill_jit[key] = jax.jit(
                f, donate_argnums=(1,),
                compiler_options=_xla_options())
        valid = jnp.asarray(valid, jnp.int32)
        logits, cache = self._prefill_jit[key](
            self.qparams, cache, pt, tokens, seq_lens + valid,
            seq_lens)
        return logits, (cache, pt, seq_lens)

    def decode_step(self, state, tokens, active):
        """One decode step for every active slot.
        tokens [B] i32, active [B] bool. Returns (logits, new_state)."""
        cache, pt, seq_lens = state
        if self._decode_jit is None:
            def f(qparams, cache, pt, seq_lens, tokens, active):
                return self._decode_forward(qparams, cache, pt,
                                            seq_lens, tokens, active)
            self._decode_jit = jax.jit(f, donate_argnums=(1,),
                                       compiler_options=_xla_options())
        logits, cache, new_lens = self._decode_jit(
            self.qparams, cache, pt, seq_lens, tokens, active)
        return logits, (cache, pt, new_lens)

    def decode_scan(self, state, first_tokens, active, num_steps: int,
                    eos_id: Optional[int] = None,
                    sampling=None, seed: int = 0):
        """Run `num_steps` decode steps fully on-device (lax.scan over
        steps, sampling inside — zero host round-trips in the token
        loop). Greedy by default; `sampling` (a static
        sampling.SamplingParams) switches to on-device stochastic
        sampling with the PRNG key in the scan carry. Slots hitting
        eos_id go inactive.

        Returns (tokens [B, num_steps] i32 — the tokens produced at
        each step (repeats the last token after a slot retires),
        new_state)."""
        cache, pt, seq_lens = state
        if sampling is not None and sampling.is_greedy:
            sampling = None
        key = (num_steps, eos_id, sampling, seed if sampling else 0)
        if key not in self._scan_jit:
            def f(qparams, cache, pt, seq_lens, first_tokens, active):
                def body(carry, _):
                    cache, seq_lens, toks, act, rk = carry
                    logits, cache, seq_lens = self._decode_forward(
                        qparams, cache, pt, seq_lens, toks, act)
                    if sampling is None:
                        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                    else:
                        from .sampling import sample_p
                        rk, sk = jax.random.split(rk)
                        nxt = sample_p(logits, sk, sampling)
                    nxt = jnp.where(act, nxt, toks)
                    if eos_id is not None:
                        act = act & (nxt != eos_id)
                    return (cache, seq_lens, nxt, act, rk), nxt
                (cache2, lens2, _, _, _), toks = jax.lax.scan(
                    body, (cache, seq_lens, first_tokens, active,
                           jax.random.PRNGKey(seed)),
                    None, length=num_steps)
                return toks.T, cache2, lens2
            self._scan_jit[key] = jax.jit(
                f, donate_argnums=(1,),
                compiler_options=_xla_options())
        toks, cache, lens = self._scan_jit[key](
            self.qparams, cache, pt, seq_lens, first_tokens, active)
        return toks, (cache, pt, lens)

    # -- convenience -------------------------------------------------------

    def _pad_prompts(self, prompts):
        """Right-pad a prompt batch to [max_batch, T]. Accepts a list
        of 1D int sequences or a [B, T] array. Returns (tokens np
        [max_batch, T], lens np [max_batch], b = real batch)."""
        import numpy as np
        if isinstance(prompts, (list, tuple)):
            b = len(prompts)
            lens_b = [len(p) for p in prompts]
            t = max(max(lens_b), 1)
            toks = np.zeros((b, t), np.int32)
            for i, p in enumerate(prompts):
                toks[i, :len(p)] = np.asarray(p, np.int32)
        else:
            toks = np.asarray(prompts, np.int32)
            b = toks.shape[0]
            lens_b = [toks.shape[1]] * b
        e = self.ecfg
        assert b <= e.max_batch
        if b < e.max_batch:
            toks = np.pad(toks, ((0, e.max_batch - b), (0, 0)))
        lens = np.zeros((e.max_batch,), np.int32)
        lens[:b] = lens_b
        return toks, lens, b

    def _alloc_prompt_pages(self, state, lens, b: int,
                            max_new_tokens: int, margin: int = 0):
        """Dynamic-page mode: map each row's worst-case page span up
        front (prompt + generation + `margin` stale-append headroom —
        speculative verify writes up to window-1 uncommitted tokens
        past the committed length). No-op under the static layout."""
        e = self.ecfg
        if not e.dynamic_pages:
            return state
        from .scheduler import PageAllocator
        alloc = PageAllocator(e.total_pages())
        cache, pt, sl = state
        import numpy as np
        pt_np = np.zeros((e.max_batch, e.pages_per_seq), np.int32)
        for i in range(b):
            total = int(lens[i]) + max_new_tokens + margin
            need = -(-total // e.page_size)
            if need > e.pages_per_seq:
                raise ValueError(
                    f"prompt {i}: {int(lens[i])} + {max_new_tokens} "
                    f"new + margin {margin} tokens exceed "
                    f"pages_per_seq={e.pages_per_seq} * "
                    f"page_size={e.page_size}")
            pages = alloc.alloc(i, need)
            if pages is None:
                raise ValueError(
                    f"page pool exhausted at row {i}: "
                    f"{e.total_pages() - 1} usable pages; raise "
                    "num_pages or use ContinuousBatcher")
            pt_np[i, :need] = pages
        return (cache, jnp.asarray(pt_np), sl)

    def _sample(self, logits, sampling, rng_key):
        """argmax, or the jitted stochastic sampler (one compile per
        static SamplingParams). Returns ([B] i32 tokens, next key)."""
        if sampling is None or sampling.is_greedy:
            return jnp.argmax(logits, -1).astype(jnp.int32), rng_key
        skey = ("sample", sampling)
        if skey not in self._scan_jit:
            from .sampling import sample_p
            self._scan_jit[skey] = jax.jit(
                lambda lg, k: sample_p(lg, k, sampling))
        rng_key, sk = jax.random.split(rng_key)
        return self._scan_jit[skey](logits, sk), rng_key

    def generate(self, prompts, max_new_tokens: int,
                 eos_id: Optional[int] = None,
                 sampling=None, seed: int = 0):
        """Decode a batch of prompts (list of 1D int arrays or a
        [B, T] right-padded array + lens). Greedy by default;
        `sampling` (sampling.SamplingParams) enables on-device
        temperature/top-k/top-p sampling. Returns list of generated
        token lists. Simple single-batch path; use ContinuousBatcher
        for multi-request serving."""
        import numpy as np
        toks, lens, b = self._pad_prompts(prompts)
        e = self.ecfg
        # one-shot batch: allocate each row's worst-case page span up
        # front (the ContinuousBatcher owns incremental growth;
        # round-2 VERDICT weak #10 — generate() used to raise here)
        state = self._alloc_prompt_pages(self.new_state(), lens, b,
                                         max_new_tokens)
        logits, state = self.prefill(state, jnp.asarray(toks),
                                     jnp.asarray(lens))
        out = [[] for _ in range(b)]
        done = np.asarray(lens == 0)
        rk = jax.random.PRNGKey(seed)
        cur, rk = self._sample(logits, sampling, rk)
        for _ in range(max_new_tokens):
            cur_np = np.asarray(cur)
            for i in range(b):
                if not done[i]:
                    tok = int(cur_np[i])
                    if eos_id is not None and tok == eos_id:
                        done[i] = True
                    else:
                        out[i].append(tok)
            if done.all():
                break
            active = jnp.asarray(~done & (np.arange(e.max_batch) < b))
            logits, state = self.decode_step(state, cur, active)
            cur, rk = self._sample(logits, sampling, rk)
        return out
