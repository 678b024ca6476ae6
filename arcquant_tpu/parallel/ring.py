"""Ring attention: sequence-parallel exact attention over an "sp"
mesh axis.

Greenfield TPU design (the reference has NO sequence scaling of any
kind — its max context is seqlen 2048, SURVEY.md §2.3 / §5): the
sequence dim of Q, K, V is sharded over the mesh axis; K/V blocks
rotate around the ring with `jax.lax.ppermute` while every device
accumulates online-softmax partial states for its local queries, so
the full T×T attention is computed exactly with T/n-sized blocks and
n-1 neighbor exchanges — context length scales linearly with the
number of devices at constant per-device memory. The ppermute rides
ICI (standard Ring Attention, Liu et al. 2023 — implemented fresh
here); transfer/compute overlap is up to XLA's scheduler and is a
multi-chip measurement this environment cannot make.

Causal masking is by GLOBAL position: device i's queries cover
[i·t_l, (i+1)·t_l); an incoming block whose origin is after the local
queries contributes nothing (its weights mask to -inf and the merge
is skipped arithmetically — every device still does n steps so the
ring stays in lockstep).

Paged-KV sequence sharding (design note for serving integration):
the paged int4 pool (cache/paged.py) shards over the sp axis by PAGE
OWNERSHIP — pages whose global token range falls in shard i's
sequence slice live in shard i's pool slice, and the decode step
becomes this module's ring loop with per-shard paged_decode partials
(each shard runs the Pallas flash-decode over its own pages for the
rotating query, emitting (out, m, l) to merge). Prefill writes each
shard's K/V pages locally — no cross-shard traffic at append time.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _block_attn(q, k, v, q_pos0, k_pos0, sm_scale, causal: bool):
    """Unnormalized block attention with global-position causal mask.

    q: [B, Tq, Hq, D]; k/v: [B, Tk, Hkv, D] (GQA: Hq % Hkv == 0).
    Returns (acc [B, Tq, Hq, D] f32 unnormalized, m [B, Tq, Hq] row
    max, l [B, Tq, Hq] sum of exp)."""
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    kk = jnp.repeat(k, g, axis=2)
    vv = jnp.repeat(v, g, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   kk.astype(jnp.float32)) * sm_scale
    if causal:
        qpos = q_pos0 + jnp.arange(tq)
        kpos = k_pos0 + jnp.arange(k.shape[1])
        mask = qpos[:, None] >= kpos[None, :]
        s = jnp.where(mask[None, None], s, _NEG_INF)
    m = jnp.max(s, axis=-1)                       # [B, H, Tq]
    p = jnp.exp(s - m[..., None])
    # fully-masked rows: exp(-inf - (-inf)) would be 1; zero them
    p = jnp.where((m == _NEG_INF)[..., None], 0.0, p)
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhqk,bkhd->bqhd", p, vv.astype(jnp.float32))
    return acc, m.transpose(0, 2, 1), l.transpose(0, 2, 1)


def ring_attention(q, k, v, axis: str = "sp", causal: bool = True,
                   out_dtype=None):
    """Exact attention over sequence-sharded q/k/v (call INSIDE
    shard_map; every array holds this shard's [B, T/n, ...] slice).

    Returns the local [B, T/n, Hq, D] attention output."""
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    b, t_l, hq, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    perm = [(j, (j + 1) % n) for j in range(n)]

    m0 = jnp.full((b, t_l, hq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, t_l, hq), jnp.float32)
    a0 = jnp.zeros((b, t_l, hq, d), jnp.float32)

    def body(carry, _):
        k_blk, v_blk, src, m, l, acc = carry
        a_b, m_b, l_b = _block_attn(q, k_blk, v_blk, i * t_l,
                                    src * t_l, sm_scale, causal)
        m_new = jnp.maximum(m, m_b)
        # guard against (-inf) - (-inf) when a block is fully masked
        alpha = jnp.exp(jnp.where(m == _NEG_INF, _NEG_INF, m - m_new))
        beta = jnp.exp(jnp.where(m_b == _NEG_INF, _NEG_INF,
                                 m_b - m_new))
        acc = acc * alpha[..., None] + a_b * beta[..., None]
        l = l * alpha + l_b * beta
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        src = jax.lax.ppermute(src, axis, perm)
        return (k_blk, v_blk, src, m_new, l, acc), None

    (_, _, _, m, l, acc), _ = jax.lax.scan(
        body, (k, v, i, m0, l0, a0), None, length=n)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(out_dtype or q.dtype)


def sp_paged_decode(q, cache, layer: int, pt_local, local_lens,
                    axis: str = "sp"):
    """Sequence-parallel paged int4 flash-decode (call INSIDE
    shard_map over `axis`).

    Page ownership shards the pool over sp (ring.py design note, now
    implemented): shard i's pool slice holds the pages whose global
    token range falls in its sequence slice; pt_local/local_lens
    describe only the LOCAL pages/tokens per row. Each shard runs the
    Pallas flash-decode over its own pages, emitting the online-
    softmax partial (out, m, l); the exact global output is the
    (m, l)-weighted merge (reference analog: FlashInfer
    state_t::merge, state.cuh — here one pmax + two psums over ICI).

    q: [B, Hq, Dh] replicated across sp; returns the same, replicated.
    """
    from ..kernels.paged_decode import paged_decode_state
    out, m, l = paged_decode_state(q, cache, layer, pt_local,
                                   local_lens)
    m_g = jax.lax.pmax(m, axis)
    # empty shards carry (m=-inf, l=0): their weight is exactly 0
    w = l * jnp.exp(jnp.where(m == _NEG_INF, _NEG_INF, m - m_g))
    denom = jax.lax.psum(w, axis)
    num = jax.lax.psum(out.astype(jnp.float32) * w[..., None], axis)
    return (num / jnp.maximum(denom, 1e-30)[..., None]).astype(q.dtype)


def sp_flash_prefill(mesh, q, k, v, causal: bool = True):
    """Convenience wrapper: run ring_attention over mesh axis "sp"
    on globally-shaped [B, T, H, D] arrays (T % n == 0). The inputs
    are sharded over T; output comes back with the same sharding."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    f = shard_map(
        functools.partial(ring_attention, axis="sp", causal=causal),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"), check_vma=False)
    return f(q, k, v)
