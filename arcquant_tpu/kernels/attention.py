"""Pallas flash attention (causal, GQA) for TPU.

TPU-native replacement for the reference's prefill attention paths —
torch SDPA on the accuracy path (qLlamaLayer.py:347-354) and pip
flashinfer `single_prefill_with_kv_cache` on the perf path
(benchmarks/modeling_arc.py:192). One kernel serves both: online
softmax over kv blocks so the [T, T] logits never materialize in HBM.

Layout: q/k/v arrive as [B, T, H, Dh]; the kernel grid is
(B * Hq, num_q_blocks, num_kv_blocks) with the kv dimension innermost
and the online-softmax state (m, l, acc) carried in VMEM scratch, so
KV streams blockwise from HBM (long contexts never exceed VMEM).
Fully-masked kv blocks (above the causal diagonal) skip their compute.
GQA is handled by indexing the kv head as (batch, q_head // group) at
the BlockSpec level, so no repeat_kv materialization (the reference
materializes repeated KV, qLlamaLayer.py:344-345 — a 4-7× HBM cost at
GQA ratios).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gemm import _use_interpret

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale: float, block_q: int, block_k: int,
                  kv_len: int, q_offset: int):
    """One (batch*head, q_block, kv_block) program with carried online
    softmax. q_ref: [1, bq, Dh]; k_ref/v_ref: [1, bk, Dh]."""
    qb = pl.program_id(1)
    kb = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: query i attends to kv j <= i + q_offset; skip blocks
    # entirely above the diagonal
    q_hi = qb * block_q + block_q - 1 + q_offset

    @pl.when(kb * block_k <= q_hi)
    def _():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, bk]
        q_ids = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0) + qb * block_q + q_offset
        k_ids = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1) + kb * block_k
        mask = (q_ids >= k_ids) & (k_ids < kv_len)
        s = jnp.where(mask, s, _NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, 0:1] = alpha * l_ref[:, 0:1] + jnp.sum(
            p, axis=-1, keepdims=True)
        m_ref[:, 0:1] = m_new
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(kb == n_kv - 1)
    def _():
        l = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_groups", "scale",
                                             "block_q", "block_k",
                                             "q_offset", "interpret"))
def _flash_call(q, k, v, *, n_groups, scale, block_q, block_k, q_offset,
                interpret):
    b, tq, hq, dh = q.shape
    tk = k.shape[1]
    # [B, T, H, D] -> [B*H, T, D] so each program sees one head's rows
    qt = q.transpose(0, 2, 1, 3).reshape(b * hq, tq, dh)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    hkv = kt.shape[1]
    kt = kt.reshape(b * hkv, tk, dh)
    vt = vt.reshape(b * hkv, tk, dh)

    tq_pad = pl.cdiv(tq, block_q) * block_q
    if tq_pad != tq:
        qt = jnp.pad(qt, ((0, 0), (0, tq_pad - tq), (0, 0)))
    tk_pad = pl.cdiv(tk, block_k) * block_k
    if tk_pad != tk:
        kt = jnp.pad(kt, ((0, 0), (0, tk_pad - tk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, tk_pad - tk), (0, 0)))

    grid = (b * hq, tq_pad // block_q, tk_pad // block_k)

    def kv_index(h, i, kb):
        # program h = batch * hq + q_head; kv row = batch * hkv + kv_head
        return ((h // hq) * hkv + (h % hq) // n_groups, kb, 0)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_q=block_q, block_k=block_k,
        kv_len=tk, q_offset=q_offset)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda h, i, kb: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), kv_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh),
                               lambda h, i, kb: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * hq, tq_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # m
            pltpu.VMEM((block_q, 128), jnp.float32),   # l
            pltpu.VMEM((block_q, dh), jnp.float32),    # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * tq * tk * dh // 2,
            bytes_accessed=2 * (qt.size + kt.size + vt.size),
            transcendentals=b * hq * tq * tk // 2),
        interpret=interpret,
    )(qt, kt, vt)
    out = out[:, :tq].reshape(b, hq, tq, dh).transpose(0, 2, 1, 3)
    return out


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    q_offset: int = 0,
                    block_q: int = 256, block_k: int = 512) -> jax.Array:
    """Causal flash attention with implicit GQA and blockwise KV
    streaming (context length bounded by HBM, not VMEM).

    Args:
      q: [B, Tq, Hq, Dh]; k/v: [B, Tk, Hkv, Dh] with Hq % Hkv == 0.
      q_offset: absolute position of q[0] within the kv sequence
        (Tk - Tq for the usual "suffix" case; 0 when Tq == Tk).
    Returns [B, Tq, Hq, Dh].
    """
    b, tq, hq, dh = q.shape
    hkv = k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    scale = 1.0 / math.sqrt(dh)
    block_q = min(block_q, max(16, 1 << (tq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (k.shape[1] - 1).bit_length()))
    return _flash_call(q, k, v, n_groups=hq // hkv, scale=scale,
                       block_q=block_q, block_k=block_k,
                       q_offset=q_offset, interpret=_use_interpret())
