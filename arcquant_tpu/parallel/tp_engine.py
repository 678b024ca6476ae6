"""Tensor-parallel serving engine: the InferenceEngine's prefill /
decode steps executed under shard_map over the mesh "tp" axis.

Sharding layout (greenfield TPU design; the reference has no
distributed serving at all — SURVEY.md §2.3):

  fused QKV / gate-up   column-parallel — each device owns
                        num_heads/tp query heads and num_kv_heads/tp
                        kv heads (per-projection slices are taken
                        BEFORE the fused concat so head boundaries
                        stay aligned)
  o / down              row-parallel with per-shard ARC residual
                        ownership + one psum per projection
  paged int4 KV pool    sharded over the kv-head axis — appends and
                        the Pallas flash-decode are fully shard-local
  embeddings / norms /
  lm_head / page table  replicated (hidden states replicated between
                        layers, as in Megatron)

The activation global scale for row-parallel sites uses lax.pmax so
quantization grids match the unsharded engine. requires
tp | num_kv_heads.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from ..engine.engine import EngineConfig, InferenceEngine
from ..models import llama
from ..models.quantized import SiteCalib
from ..cache import paged
from ..kernels import gemm as gk
from ..kernels.attention import flash_attention
from ..kernels.paged_decode import paged_decode
from . import tp as tpm

Params = Dict[str, Any]


def _shard_fused_col(layer_p, projs, calib: SiteCalib, tp: int,
                     qcfg: QuantConfig):
    """Column-parallel pack of a FUSED projection group: slice each
    projection's N range per shard, then concat, so every shard owns
    whole heads of each of q/k/v (or gate/up)."""
    from ..quant import packing, numerics as N

    def shard_slice(w, i):
        n = w.shape[0]
        ns = n // tp
        return w[i * ns:(i + 1) * ns]

    pws = []
    for i in range(tp):
        w = jnp.concatenate(
            [shard_slice(layer_p[pr]["w"], i) for pr in projs], axis=0)
        bs = [layer_p[pr].get("b") for pr in projs]
        b = (jnp.concatenate([shard_slice(x, i) for x in bs])
             if all(x is not None for x in bs) else None)
        gs = None
        if qcfg.w_scale == "channel":
            gs = N.nvfp4_global_scale(w, per_row=True)[:, 0]
        pws.append(packing.pack_weight_arc(
            w, calib.reorder_index, calib.select_num, bias=b,
            fmt=qcfg.weight_fmt, w_scale=qcfg.w_scale,
            global_scale=gs))
    return tpm._stack_packed(pws)


class TPInferenceEngine(InferenceEngine):
    """Tensor-parallel quantized serving engine.

    Same public API as InferenceEngine (new_state / prefill /
    decode_step / decode_scan / generate); internally every step runs
    under shard_map on `mesh`. Weights are quantized+sharded at
    construction; the KV pool lives sharded over kv heads.
    """

    def __init__(self, cfg: ModelConfig, params, calib,
                 qcfg: QuantConfig, ecfg: EngineConfig, mesh: Mesh):
        tp = mesh.shape["tp"]
        assert cfg.num_kv_heads % tp == 0, (
            f"tp={tp} must divide num_kv_heads={cfg.num_kv_heads}")
        assert qcfg.use_kernels and qcfg.quant_type == "NVFP4", \
            "TP engine supports the packed NVFP4 path"
        self.mesh = mesh
        self.tp = tp
        repl = NamedSharding(mesh, P())
        sh0 = NamedSharding(mesh, P("tp"))

        qlayers = []
        self._row_sels = []
        for li, lp in enumerate(params["layers"]):
            lc = calib[li]
            o_pw, o_idx, o_sel, _ = tpm.shard_linear_row(
                lp["o"]["w"], None, lc["o_in"], tp, qcfg.weight_fmt,
                qcfg.w_scale)
            d_pw, d_idx, d_sel, _ = tpm.shard_linear_row(
                lp["down"]["w"], None, lc["down_in"], tp,
                qcfg.weight_fmt, qcfg.w_scale)
            layer = {
                "attn_norm": jax.device_put(lp["attn_norm"], repl),
                "mlp_norm": jax.device_put(lp["mlp_norm"], repl),
                "qkv": jax.device_put(_shard_fused_col(
                    lp, ("q", "k", "v"), lc["attn_in"], tp, qcfg), sh0),
                "gateup": jax.device_put(_shard_fused_col(
                    lp, ("gate", "up"), lc["mlp_in"], tp, qcfg), sh0),
                "o": jax.device_put(o_pw, sh0),
                "down": jax.device_put(d_pw, sh0),
                "o_idx": jax.device_put(o_idx, sh0),
                "down_idx": jax.device_put(d_idx, sh0),
            }
            self._row_sels.append({"o": o_sel, "down": d_sel})
            qlayers.append(layer)
        qparams = {
            "embed": jax.device_put(params["embed"], repl),
            "final_norm": jax.device_put(params["final_norm"], repl),
            "layers": qlayers,
        }
        if "lm_head" in params:
            qparams["lm_head"] = jax.device_put(params["lm_head"], repl)
        super().__init__(cfg, qparams, calib, qcfg, ecfg,
                         quantize_params=False)

    # -- sharded state ------------------------------------------------------

    def new_state(self):
        e = self.ecfg
        cache = paged.init_cache(self.cfg, e.total_pages(), e.page_size)
        head_sh = NamedSharding(self.mesh, P(None, "tp"))
        cache = paged.PagedKVCache(*[
            tuple(jax.device_put(a, head_sh) for a in field)
            for field in cache])
        pps = e.pages_per_seq
        repl = NamedSharding(self.mesh, P())
        pt = 1 + (jnp.arange(e.max_batch)[:, None] * pps
                  + jnp.arange(pps)[None, :]).astype(jnp.int32)
        return (cache, jax.device_put(pt, repl),
                jax.device_put(jnp.zeros((e.max_batch,), jnp.int32),
                               repl))

    # -- sharded layer forward (runs inside shard_map) -----------------------

    def _tp_layer(self, p, x, cos, sin, lc, sels, cache_l, page_table,
                  append_pos, seq_lens_for_attn, is_decode: bool):
        """One decoder layer on the local shard. cache_l = per-layer
        local cache slices (6 arrays) or None for no-cache prefill.
        Returns (x, new cache_l)."""
        cfg, qcfg, tp = self.cfg, self.qcfg, self.tp
        b, t, d = x.shape
        dt = x.dtype
        hq_l = cfg.num_heads // tp
        hkv_l = cfg.num_kv_heads // tp
        qs_l = hq_l * cfg.head_dim
        kvs_l = hkv_l * cfg.head_dim

        h = llama.rms_norm(x, p["attn_norm"], cfg.rms_eps)
        x2 = h.reshape(b * t, d)
        qkv_pw = tpm._unstack(p["qkv"])
        xa, gx = tpm._quantize_x_global(x2, lc["attn_in"], qkv_pw.kq)
        qkv = gk.gemm_dequant(xa, qkv_pw, gx, out_dtype=dt)
        q = qkv[:, :qs_l].reshape(b, t, hq_l, cfg.head_dim)
        k = qkv[:, qs_l:qs_l + kvs_l].reshape(b, t, hkv_l, cfg.head_dim)
        v = qkv[:, qs_l + kvs_l:].reshape(b, t, hkv_l, cfg.head_dim)
        q, k_r = llama.apply_rope(q, k, cos, sin)

        kc, ks, km, vc, vs, vm = cache_l
        tmp_cache = paged.PagedKVCache((kc,), (ks,), (km,), (vc,),
                                       (vs,), (vm,))
        tmp_cache = paged.append_kv(tmp_cache, 0, k_r, v, page_table,
                                    append_pos)
        new_cache_l = tuple(f[0] for f in tmp_cache)

        if is_decode:
            attn = paged_decode(q[:, 0], tmp_cache, 0, page_table,
                                seq_lens_for_attn)[:, None]
        else:
            attn = flash_attention(q, k_r, v)
        attn2 = attn.astype(dt).reshape(b * t, qs_l)

        o_pw = tpm._unstack(p["o"])
        oa, go = tpm._quantize_x_rowshard(attn2, p["o_idx"][0],
                                          sels["o"], o_pw.kq)
        o_part = gk.gemm_dequant(oa, o_pw, go, out_dtype=jnp.float32)
        x = x + jax.lax.psum(o_part, "tp").astype(dt).reshape(b, t, d)

        h = llama.rms_norm(x, p["mlp_norm"], cfg.rms_eps)
        x2 = h.reshape(b * t, d)
        gu_pw = tpm._unstack(p["gateup"])
        xa, gx = tpm._quantize_x_global(x2, lc["mlp_in"], gu_pw.kq)
        gu = gk.gemm_dequant(xa, gu_pw, gx, out_dtype=jnp.float32)
        i_l = gu.shape[1] // 2
        inter = (jax.nn.silu(gu[:, :i_l]) * gu[:, i_l:]).astype(dt)
        d_pw = tpm._unstack(p["down"])
        ia, gi = tpm._quantize_x_rowshard(inter, p["down_idx"][0],
                                          sels["down"], d_pw.kq)
        d_part = gk.gemm_dequant(ia, d_pw, gi, out_dtype=jnp.float32)
        x = x + jax.lax.psum(d_part, "tp").astype(dt).reshape(b, t, d)
        return x, new_cache_l

    def _specs(self):
        """Layer param specs for shard_map."""
        lspec = []
        for lp in self.qparams["layers"]:
            s = {}
            for k in lp:
                s[k] = P() if k in ("attn_norm", "mlp_norm") else \
                    jax.tree.map(lambda _: P("tp"), lp[k])
            lspec.append(s)
        return lspec

    # -- public steps ---------------------------------------------------------

    def _sharded_forward(self, cache, page_table, tokens, lens,
                         is_decode, seq_lens=None, active=None):
        cfg = self.cfg
        layers = self.qparams["layers"]
        lspec = self._specs()
        cache_spec = jax.tree.map(lambda _: P(None, "tp"), cache)
        row_sels = self._row_sels

        def body(embed, final_norm, head, lparams, cache, pt, toks,
                 lens_or_seqlens, act):
            if is_decode:
                seq_lens_ = lens_or_seqlens
                b = toks.shape[0]
                positions = seq_lens_[:, None]
                append_pos = jnp.where(act[:, None], positions, -1)
                new_lens = seq_lens_ + act.astype(jnp.int32)
                x = embed[toks[:, None]]
                t = 1
            else:
                lens_ = lens_or_seqlens
                b, t = toks.shape
                positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
                append_pos = jnp.where(positions < lens_[:, None],
                                       positions, -1)
                new_lens = None
                x = embed[toks]
            cos, sin = llama.rope_cos_sin(cfg, positions)

            new_fields = [[] for _ in range(6)]
            for li, lp in enumerate(lparams):
                cache_l = tuple(field[li] for field in cache)
                x, ncl = self._tp_layer(
                    lp, x, cos, sin, self.calib[li], row_sels[li],
                    cache_l, pt, append_pos,
                    new_lens if is_decode else None, is_decode)
                for fi in range(6):
                    new_fields[fi].append(ncl[fi])
            new_cache = paged.PagedKVCache(
                *[tuple(f) for f in new_fields])

            x = llama.rms_norm(x, final_norm, cfg.rms_eps)
            if is_decode:
                last = x[:, 0]
            else:
                idx = jnp.maximum(lens_ - 1, 0)[:, None, None].astype(
                    jnp.int32).repeat(x.shape[-1], -1)
                last = jnp.take_along_axis(x, idx, axis=1)[:, 0]
            if head_is_packed:
                # quantized W4A16 head (qcfg.quantize_lm_head): the
                # parent __init__ packed it and popped 'lm_head'
                xp = jnp.pad(last.astype(jnp.bfloat16),
                             ((0, 0), (0, head.kq - last.shape[-1])))
                logits = gk.gemm_dequant(xp, head, jnp.float32(1.0),
                                         out_dtype=jnp.float32)
            else:
                logits = jnp.dot(last, head.T,
                                 preferred_element_type=jnp.float32)
            if is_decode:
                return logits, new_cache, new_lens
            return logits, new_cache

        out_cache_spec = cache_spec
        if is_decode:
            out_specs = (P(), out_cache_spec, P())
        else:
            out_specs = (P(), out_cache_spec)
        if "lm_head_packed" in self.qparams:
            head = self.qparams["lm_head_packed"]
            head_is_packed = True
        else:
            head = self.qparams.get("lm_head", self.qparams["embed"])
            head_is_packed = False
        head_spec = jax.tree.map(lambda _: P(), head)
        f = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(), head_spec, lspec, cache_spec, P(), P(),
                      P(), P()),
            out_specs=out_specs, check_vma=False)
        act = active if active is not None else \
            jnp.ones((tokens.shape[0],), bool)
        args = (self.qparams["embed"], self.qparams["final_norm"],
                head, layers, cache, page_table, tokens,
                seq_lens if is_decode else lens, act)
        return f, args

    def prefill(self, state, tokens, lens):
        if tokens.shape[1] > self.ecfg.max_seq_len:
            raise ValueError("prefill exceeds KV capacity")
        cache, pt, seq_lens = state
        key = ("p", tuple(tokens.shape))
        if key not in self._prefill_jit:
            f, _ = self._sharded_forward(cache, pt, tokens, lens,
                                         is_decode=False)
            self._prefill_jit[key] = jax.jit(f, donate_argnums=(4,))
        _, args = self._sharded_forward(cache, pt, tokens, lens,
                                        is_decode=False)
        logits, cache = self._prefill_jit[key](*args)
        lens = lens.astype(jnp.int32)
        return logits, (cache, pt, jnp.where(lens > 0, lens, seq_lens))

    def decode_step(self, state, tokens, active):
        cache, pt, seq_lens = state
        if self._decode_jit is None:
            f, _ = self._sharded_forward(cache, pt, tokens, None,
                                         is_decode=True,
                                         seq_lens=seq_lens,
                                         active=active)
            self._decode_jit = jax.jit(f, donate_argnums=(4,))
        _, args = self._sharded_forward(cache, pt, tokens, None,
                                        is_decode=True,
                                        seq_lens=seq_lens,
                                        active=active)
        logits, cache, new_lens = self._decode_jit(*args)
        return logits, (cache, pt, new_lens)

    def decode_scan(self, state, first_tokens, active, num_steps,
                    eos_id=None):
        """Host loop fallback (the sharded scan variant is future
        work); returns the same (tokens [B, n], state) contract."""
        toks_out = []
        cur = first_tokens
        act = active
        for _ in range(num_steps):
            logits, state = self.decode_step(state, cur, act)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            cur = jnp.where(act, nxt, cur)
            if eos_id is not None:
                act = act & (cur != eos_id)
            toks_out.append(cur)
        return jnp.stack(toks_out, axis=1), state
