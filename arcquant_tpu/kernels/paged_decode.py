"""Pallas paged int4 flash-decode kernel.

TPU-native replacement for the reference's modified-FlashInfer fused
int4-dequant batch decode (kernels/include/flashinfer/decode.cuh:
492-689): one decode step of attention over a paged, int4-quantized
KV cache, with dequantization fused into the QK and PV products and
an online-softmax accumulator across pages.

Mapping of the CUDA machinery onto TPU:
  - cp.async 4-stage page pipeline (decode.cuh:552-594)  →  Pallas
    grid pipelining: the page index for each grid step comes from the
    scalar-prefetched page table, so Mosaic double-buffers the page
    DMAs automatically (PrefetchScalarGridSpec).
  - per-entry {scale, zero} half2 fetch (decode.cuh:629-637)  →
    scale/minv arrays streamed as their own blocks.
  - FoldFactor thread remap for 128-bit packed loads (decode.cuh:527)
    →  split-half nibble packing (cache/paged.py) makes unpack a
    concat: no lane shuffles at all.
  - state_t online-softmax merge (state.cuh)  →  (m, l, acc) carried
    in VMEM scratch across the page grid dimension.

Grid: (batch, kv_head, page_slot). The GQA query group (Hq/Hkv heads)
rides the sublane dimension, so all query heads of a kv head are one
program — the reference needs a whole threadblock per (batch, head).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemm import _use_interpret
from ..cache.paged import PagedKVCache

_NEG_INF = -1e30


def _decode_kernel(pt_ref, sl_ref, q_ref, kc_ref, ks_ref, km_ref,
                   vc_ref, vs_ref, vm_ref, o_ref,
                   m_ref, l_ref, acc_ref, *, page: int, sm_scale: float,
                   hkv: int, gp: int):
    """One (batch, page_slot) program covering ALL kv heads (a per-
    head grid would mean Hkv× more tiny programs; the per-program
    fixed cost dominates at decode shapes)."""
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_p = pl.num_programs(1)

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seq_len = sl_ref[b]

    @pl.when(p * page < seq_len)
    def _():
        tok_mask = (jax.lax.broadcasted_iota(
            jnp.int32, (gp, page), 1) + p * page) < seq_len
        for h in range(hkv):                # static unroll over heads
            q = q_ref[0, h].astype(jnp.float32) * sm_scale  # [Gp, Dh]

            def dq(codes, scale, minv, h=h):
                c = codes[0, h].astype(jnp.int32)        # [page, Dh/2]
                full = jnp.concatenate([c & 0xF, c >> 4], axis=-1)
                s = scale[0, h].reshape(page, 1)
                mn = minv[0, h].reshape(page, 1)
                return full.astype(jnp.float32) * s + mn  # [page, Dh]

            k = dq(kc_ref, ks_ref, km_ref)
            v = dq(vc_ref, vs_ref, vm_ref)

            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # mask tokens at/after seq_len (the current step's token
            # was appended before the kernel runs)
            s = jnp.where(tok_mask, s, _NEG_INF)

            r = slice(h * gp, (h + 1) * gp)
            m_prev = m_ref[r, 0:1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            pexp = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[r, 0:1] = alpha * l_ref[r, 0:1] + jnp.sum(
                pexp, axis=-1, keepdims=True)
            m_ref[r, 0:1] = m_new
            acc_ref[r, :] = acc_ref[r, :] * alpha + jnp.dot(
                pexp, v, preferred_element_type=jnp.float32)

    @pl.when(p == n_p - 1)
    def _():
        l = jnp.maximum(l_ref[:, 0:1], 1e-30)
        out = (acc_ref[:] / l).astype(o_ref.dtype)
        o_ref[0] = out.reshape(hkv, gp, out.shape[-1])


@functools.partial(jax.jit, static_argnames=("page", "sm_scale",
                                             "interpret"))
def _decode_call(page_table, seq_lens, q, kc, ks, km, vc, vs, vm, *,
                 page, sm_scale, interpret):
    b, hkv, gp, dh = q.shape
    maxp = page_table.shape[1]

    def kv_code_idx(b_, p, pt, sl):
        return (pt[b_, p], 0, 0, 0)

    def kv_param_idx(b_, p, pt, sl):
        return (pt[b_, p], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, maxp),
        in_specs=[
            pl.BlockSpec((1, hkv, gp, dh), lambda b_, p, pt, sl:
                         (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page, dh // 2), kv_code_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page), kv_param_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page), kv_param_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page, dh // 2), kv_code_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page), kv_param_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, page), kv_param_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv, gp, dh), lambda b_, p, pt, sl:
                               (b_, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv * gp, 128), jnp.float32),   # m
            pltpu.VMEM((hkv * gp, 128), jnp.float32),   # l
            pltpu.VMEM((hkv * gp, dh), jnp.float32),    # acc
        ],
    )
    kernel = functools.partial(_decode_kernel, page=page,
                               sm_scale=sm_scale, hkv=hkv, gp=gp)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, gp, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(page_table, seq_lens, q, kc, ks, km, vc, vs, vm)


def paged_decode(q: jax.Array, cache: PagedKVCache, layer: int,
                 page_table: jax.Array, seq_lens: jax.Array) -> jax.Array:
    """One attention decode step over the paged int4 cache.

    Args:
      q: [B, Hq, Dh] post-RoPE queries for the current token.
      cache: the paged pool; the current token's K/V must already be
        appended (reference semantics: kv_cache.py:249-276 appends
        then calls batch_decode).
      page_table: [B, max_pages_per_seq] i32 (pad unused slots with 0).
      seq_lens: [B] i32 — tokens in cache INCLUDING the current one.
    Returns [B, Hq, Dh].
    """
    b, hq, dh = q.shape
    hkv = cache.k_codes[layer].shape[1]
    g = hq // hkv
    gp = max(8, g)
    sm_scale = 1.0 / math.sqrt(dh)
    qg = q.reshape(b, hkv, g, dh)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out = _decode_call(
        page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), qg,
        cache.k_codes[layer], cache.k_scale[layer], cache.k_min[layer],
        cache.v_codes[layer], cache.v_scale[layer], cache.v_min[layer],
        page=cache.page_size, sm_scale=sm_scale,
        interpret=_use_interpret())
    return out[:, :, :g].reshape(b, hq, dh)
