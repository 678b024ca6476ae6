"""Pallas paged int4 flash-decode kernel.

TPU-native replacement for the reference's modified-FlashInfer fused
int4-dequant batch decode (kernels/include/flashinfer/decode.cuh:
492-689): one decode step of attention over a paged, int4-quantized
KV cache, with dequantization fused into the QK and PV products and
an online-softmax accumulator across pages.

Mapping of the CUDA machinery onto TPU:
  - cp.async 4-stage page pipeline (decode.cuh:552-594)  →  manual
    double-buffered DMA loop: grid = (batch,) only, and each program
    streams exactly ceil(seq_len/page) pages via two async copies per
    page (codes + params), so HBM traffic is bounded by the ACTUAL
    sequence length, not the pool capacity — and the per-program
    fixed cost is paid B times, not B×max_pages times.
  - per-entry {scale, zero} half2 fetch (decode.cuh:629-637)  →
    scale/min ride in the per-page params block and are applied in
    SCORE space:  s = (q·codes)·scaleᵗ + (Σq)·minᵗ  keeps the token
    dim in lanes end-to-end (zero relayouts) and feeds raw int codes
    straight to the MXU;  pv = (p·scaleᵗ)·codes + Σ(p·minᵗ) likewise.
  - FoldFactor thread remap for 128-bit packed loads (decode.cuh:527)
    →  split-half nibble packing (cache/paged.py) makes unpack a
    concat: no lane shuffles at all.
  - state_t online-softmax merge (state.cuh)  →  (m, l, acc) carried
    in VMEM scratch across the page loop.

The GQA query group (Hq/Hkv heads) rides the sublane dimension and
all kv heads are statically unrolled, so one program covers a whole
batch element — the reference needs a threadblock per (batch, head).
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


def _decode_kernel(pt_ref, sl_ref, q_ref, codes_hbm, params_hbm, o_ref,
                   mo_ref, lo_ref, c_s, p_s, sems, m_ref, l_ref,
                   acc_ref, *, page: int, sm_scale: float, hkv: int,
                   gp: int):
    b = pl.program_id(0)
    seq = sl_ref[b]
    npages = (seq + page - 1) // page

    def dma(slot, i):
        pid = pt_ref[b, i]
        return (pltpu.make_async_copy(codes_hbm.at[pid], c_s.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(params_hbm.at[pid], p_s.at[slot],
                                      sems.at[slot, 1]))

    # Idle batch rows (seq == 0) are routine: the batcher and
    # generate() decode all max_batch slots. With npages == 0 the page
    # loop never waits, so an unconditional prologue start would leave
    # stray semaphore signals in the shared scratch that corrupt a
    # LATER grid step's wait (and leave DMAs outstanding at exit).
    @pl.when(npages > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def loop(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < npages)
        def _():
            for d in dma(1 - slot, i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()

        c = c_s[slot]                       # [2, Hkv, Dh/2, page] u8
        p = p_s[slot]                       # [Hkv, 4, page] f32
        tok_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
                    + i * page) < seq

        for h in range(hkv):                # static unroll over heads
            q = q_ref[0, h].astype(jnp.float32) * sm_scale   # [Gp, Dh]
            qsum = jnp.sum(q, axis=-1, keepdims=True)        # [Gp, 1]

            def full_t(kv, h=h):
                # nibble unpack straight to Kᵀ/Vᵀ [Dh, page]: tokens
                # stay in lanes, dims stack on sublanes — no relayout
                ci = c[kv, h].astype(jnp.int32)      # [Dh/2, page]
                return jnp.concatenate(
                    [ci & 0xF, ci >> 4], axis=0).astype(jnp.float32)

            ks = p[h, 0].reshape(1, page)
            km = p[h, 1].reshape(1, page)
            s = jax.lax.dot_general(
                q, full_t(0), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Gp, page]
            s = s * ks + qsum * km
            s = jnp.where(tok_mask, s, _NEG_INF)

            r = slice(h * gp, (h + 1) * gp)
            m_prev = m_ref[r, 0:1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            pexp = jnp.exp(s - m_new)                 # [Gp, page]
            alpha = jnp.exp(m_prev - m_new)
            l_ref[r, 0:1] = alpha * l_ref[r, 0:1] + jnp.sum(
                pexp, axis=-1, keepdims=True)
            m_ref[r, 0:1] = m_new
            vs = p[h, 2].reshape(1, page)
            vm = p[h, 3].reshape(1, page)
            pv = jax.lax.dot_general(
                pexp * vs, full_t(1), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Gp, Dh]
            pv = pv + jnp.sum(pexp * vm, axis=-1, keepdims=True)
            acc_ref[r, :] = acc_ref[r, :] * alpha + pv
        return 0

    jax.lax.fori_loop(0, npages, loop, 0)

    l = jnp.maximum(l_ref[:, 0:1], 1e-30)
    out = (acc_ref[:] / l).astype(o_ref.dtype)
    o_ref[0] = out.reshape(hkv, gp, out.shape[-1])
    # online-softmax state outputs: sequence-parallel ring decode
    # merges per-shard partials with (m, l) weights (ring.py design
    # note; reference analog: FlashInfer state_t.merge, state.cuh)
    mo_ref[0] = m_ref[:]
    lo_ref[0] = l_ref[:]


@functools.partial(jax.jit, static_argnames=("page", "sm_scale",
                                             "interpret"))
def _decode_call(page_table, seq_lens, q, codes, params, *,
                 page, sm_scale, interpret):
    b, hkv, gp, dh = q.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hkv, gp, dh), lambda b_, pt, sl:
                         (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            # pin pools to HBM: with ANY a small (test-sized) pool may
            # land in VMEM, where Mosaic rejects DMA slices whose last
            # dim (Dh/2 = 64) is not lane-tile aligned
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv, gp, dh), lambda b_, pt, sl:
                         (b_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv * gp, 128), lambda b_, pt, sl:
                         (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv * gp, 128), lambda b_, pt, sl:
                         (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, hkv, dh // 2, page), jnp.uint8),
            pltpu.VMEM((2, hkv, 4, page), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
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
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, gp, dh), q.dtype),
            jax.ShapeDtypeStruct((b, hkv * gp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv * gp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(page_table, seq_lens, q, codes, params)


# ---------------------------------------------------------------------------
# Paged flash-prefill: Tq > 1 query blocks over the int4 pool
# ---------------------------------------------------------------------------

def _prefill_kernel(pt_ref, st_ref, sl_ref, q_ref, codes_hbm,
                    params_hbm, o_ref, c_s, p_s, sems, m_ref, l_ref,
                    acc_ref, *, page: int, sm_scale: float, hkv: int,
                    g: int, bq: int):
    """One (batch, q_block) program: stream exactly the pages this
    query block may attend to (causal limit + actual seq length) via
    the same double-buffered DMA loop as _decode_kernel, with online
    softmax carried across pages. Reference semantic spec:
    decode.cuh:492-689 generalized per prefill.cuh:408 (Tq>1 causal).

    Rows are (token, gqa-group)-major per kv head: r = i*g + j."""
    b = pl.program_id(0)
    qb = pl.program_id(1)
    seq = sl_ref[b]
    start = st_ref[b]
    q_hi = start + qb * bq + bq - 1
    kv_limit = jnp.minimum(seq, q_hi + 1)
    npages = (kv_limit + page - 1) // page      # 0 for idle rows

    def dma(slot, i):
        pid = pt_ref[b, i]
        return (pltpu.make_async_copy(codes_hbm.at[pid], c_s.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(params_hbm.at[pid], p_s.at[slot],
                                      sems.at[slot, 1]))

    @pl.when(npages > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)

    rows = bq * g
    # absolute query position of each score row
    qpos_col = (start + qb * bq
                + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // g)

    def loop(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < npages)
        def _():
            for d in dma(1 - slot, i + 1):
                d.start()

        for d in dma(slot, i):
            d.wait()

        c = c_s[slot]                       # [2, Hkv, Dh/2, page] u8
        p = p_s[slot]                       # [Hkv, 4, page] f32
        kpos = (jax.lax.broadcasted_iota(jnp.int32, (1, page), 1)
                + i * page)
        mask = (kpos <= qpos_col) & (kpos < seq)   # [rows, page]

        for h in range(hkv):
            q = q_ref[0, :, h * g:(h + 1) * g, :].reshape(
                rows, q_ref.shape[-1]).astype(jnp.float32) * sm_scale
            qsum = jnp.sum(q, axis=-1, keepdims=True)

            def full_t(kv, h=h):
                ci = c[kv, h].astype(jnp.int32)      # [Dh/2, page]
                return jnp.concatenate(
                    [ci & 0xF, ci >> 4], axis=0).astype(jnp.float32)

            ks = p[h, 0].reshape(1, page)
            km = p[h, 1].reshape(1, page)
            s = jax.lax.dot_general(
                q, full_t(0), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [rows, page]
            s = s * ks + qsum * km
            s = jnp.where(mask, s, _NEG_INF)

            r = slice(h * rows, (h + 1) * rows)
            m_prev = m_ref[r, 0:1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            pexp = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[r, 0:1] = alpha * l_ref[r, 0:1] + jnp.sum(
                pexp, axis=-1, keepdims=True)
            m_ref[r, 0:1] = m_new
            vs = p[h, 2].reshape(1, page)
            vm = p[h, 3].reshape(1, page)
            pv = jax.lax.dot_general(
                pexp * vs, full_t(1), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [rows, Dh]
            pv = pv + jnp.sum(pexp * vm, axis=-1, keepdims=True)
            acc_ref[r, :] = acc_ref[r, :] * alpha + pv
        return 0

    jax.lax.fori_loop(0, npages, loop, 0)

    rows = bq * g
    outs = []
    for h in range(hkv):
        r = slice(h * rows, (h + 1) * rows)
        l = jnp.maximum(l_ref[r, 0:1], 1e-30)
        outs.append((acc_ref[r] / l).reshape(bq, g, acc_ref.shape[-1]))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page", "sm_scale", "bq",
                                             "g", "interpret"))
def _prefill_call(page_table, q_starts, seq_lens, q, codes, params, *,
                  page, sm_scale, bq, g, interpret):
    b, tq, hq, dh = q.shape
    hkv = hq // g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, tq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hq, dh), lambda b_, qb, pt, st, sl:
                         (b_, qb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, bq, hq, dh),
                               lambda b_, qb, pt, st, sl:
                               (b_, qb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, hkv, dh // 2, page), jnp.uint8),
            pltpu.VMEM((2, hkv, 4, page), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((hkv * bq * g, 128), jnp.float32),   # m
            pltpu.VMEM((hkv * bq * g, 128), jnp.float32),   # l
            pltpu.VMEM((hkv * bq * g, dh), jnp.float32),    # acc
        ],
    )
    kernel = functools.partial(_prefill_kernel, page=page,
                               sm_scale=sm_scale, hkv=hkv, g=g, bq=bq)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq, hq, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(page_table, q_starts, seq_lens, q, codes, params)


def paged_prefill(q: jax.Array, cache: PagedKVCache, layer: int,
                  page_table: jax.Array, q_starts: jax.Array,
                  seq_lens: jax.Array) -> jax.Array:
    """Causal flash attention of a prefill chunk DIRECTLY over the
    int4 paged pool (the chunk's own K/V must already be appended).

    Replaces the gather_kv dense-dequant prefix path (round-2 VERDICT
    missing #4): HBM traffic is 4.5-bit codes instead of a dequantized
    bf16 prefix per chunk, and the start offsets are per-ROW traced
    data — one compile covers every chunk index and ragged
    (prefix-shared) batches.

    Args:
      q: [B, Tq, Hq, Dh] post-RoPE queries (rows right-padded).
      q_starts: [B] i32 absolute position of q[:, 0] per row.
      seq_lens: [B] i32 tokens in cache INCLUDING this chunk's.
    Returns [B, Tq, Hq, Dh].
    """
    b, tq, hq, dh = q.shape
    hkv = cache.num_kv_heads
    if not _use_interpret() and cache.page_size % 128:
        raise ValueError(
            f"page_size={cache.page_size} must be a multiple of 128 "
            "(TPU lane width) on hardware")
    g = hq // hkv
    sm_scale = 1.0 / math.sqrt(dh)
    bq = min(128, max(8, 1 << (tq - 1).bit_length()))
    tq_pad = -(-tq // bq) * bq
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0), (0, 0)))
    out = _prefill_call(
        page_table.astype(jnp.int32), q_starts.astype(jnp.int32),
        seq_lens.astype(jnp.int32), q,
        cache.codes[layer], cache.params[layer],
        page=cache.page_size, sm_scale=sm_scale, bq=bq, g=g,
        interpret=_use_interpret())
    return out[:, :tq]


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
    hkv = cache.num_kv_heads
    if not _use_interpret() and cache.page_size % 128:
        # pages are lanes: Mosaic requires DMA slices tile-aligned in
        # the minor dim, so hardware needs 128-token pages (the
        # engine default); small pages work only in interpret mode
        raise ValueError(
            f"page_size={cache.page_size} must be a multiple of 128 "
            "(TPU lane width) on hardware")
    g = hq // hkv
    gp = max(8, g)
    sm_scale = 1.0 / math.sqrt(dh)
    qg = q.reshape(b, hkv, g, dh)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out, _, _ = _decode_call(
        page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), qg,
        cache.codes[layer], cache.params[layer],
        page=cache.page_size, sm_scale=sm_scale,
        interpret=_use_interpret())
    return out[:, :, :g].reshape(b, hq, dh)


def paged_decode_state(q: jax.Array, cache: PagedKVCache, layer: int,
                       page_table: jax.Array, seq_lens: jax.Array):
    """Like paged_decode, but also returns the online-softmax state
    (m, l) per query head — the per-shard partial for sequence-
    parallel ring decode (parallel/ring.py sp_paged_decode). A shard
    holding zero tokens for a row returns (out=0, m=-inf, l=0), which
    the merge drops.

    Returns (out [B, Hq, Dh], m [B, Hq] f32, l [B, Hq] f32)."""
    b, hq, dh = q.shape
    hkv = cache.num_kv_heads
    g = hq // hkv
    gp = max(8, g)
    sm_scale = 1.0 / math.sqrt(dh)
    qg = q.reshape(b, hkv, g, dh)
    if gp != g:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gp - g), (0, 0)))
    out, m, l = _decode_call(
        page_table.astype(jnp.int32), seq_lens.astype(jnp.int32), qg,
        cache.codes[layer], cache.params[layer],
        page=cache.page_size, sm_scale=sm_scale,
        interpret=_use_interpret())
    out = out[:, :, :g].reshape(b, hq, dh)
    m = m[:, :, 0].reshape(b, hkv, gp)[:, :, :g].reshape(b, hq)
    l = l[:, :, 0].reshape(b, hkv, gp)[:, :, :g].reshape(b, hq)
    return out, m, l
