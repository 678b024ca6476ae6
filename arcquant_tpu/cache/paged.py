"""Paged int4 KV cache as plain JAX arrays.

TPU re-design of the reference's paged-KV stack: the CUDA
`paged_kv_t` page pool + append kernels (kernels/include/flashinfer/
page.cuh:15-219) and the Python pool wrapper
`MultiLayerPagedKVCache4Bit` (model/kv_cache.py:139-297).

Design (SURVEY.md §7 delta 5 — ONE real implementation):
  - Per-token-per-head asymmetric int4 over the head dim, matching the
    reference's `asym_quantize_and_pack_i4` (kv_cache.py:22-33), but
    with dequant expressed as  x = code * scale + minv  so the kernel
    does one fused multiply-add per element (the reference stores
    {scale, zero} half2; minv = -zero*scale is the same information).
  - Split-half nibble packing along the head dim: byte d of a token
    packs element d (low nibble) and element d + Dh/2 (high nibble),
    so in-kernel unpack is concat(low, high) — NO lane interleave
    (the reference needs FoldFactor thread remapping for this,
    decode.cuh:527; on TPU the layout trick makes it free).
  - Page-granular pooling: K and V codes share one buffer
    [P, 2, Hkv, Dh/2, page] u8 and all four per-token params share
    [P, Hkv, 4, page] f32 (scale_k, min_k, scale_v, min_v), so one
    page is exactly TWO contiguous HBM regions.  The decode kernel
    (kernels/paged_decode.py) double-buffers pages with two manual
    DMAs per page; the reference's layout needs a param fetch per
    token (decode.cuh:629-637).
  - TOKENS ARE LANES: the page dim is last everywhere (page = 128 =
    the TPU lane width), so (a) every per-page DMA slice is exactly
    lane-tile aligned, and (b) the decode kernel's nibble unpack
    yields Kᵀ/Vᵀ [Dh, page] directly — the QK and PV contractions run
    with zero in-kernel transposes or relayouts.
  - Append = two vectorized scatters (jnp .at[] on donated buffers);
    the reference needs two dedicated CUDA kernels for this
    (page.cuh:120-219).

Page-table bookkeeping (allocation, free lists) is host-side in
engine/scheduler.py; this module only defines device-side state and
ops so everything here jits.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, KV_PAGE_SIZE

# params row order along axis 2 of the params buffer
K_SCALE, K_MIN, V_SCALE, V_MIN = 0, 1, 2, 3


class PagedKVCache(NamedTuple):
    """Device-side paged KV state (a pytree; donate across steps).

    Each field is a TUPLE of per-layer arrays — one buffer per layer,
    so a layer's append touches only that layer's buffers (a single
    [L, ...] array would force a whole-pool dynamic-update-slice per
    layer per step)."""
    codes: tuple     # L × u8  [P, 2, Hkv, Dh//2, page]  (axis1: 0=K, 1=V)
    params: tuple    # L × f32 [P, Hkv, 4, page]  (axis2: sk, mk, sv, mv)

    @property
    def page_size(self) -> int:
        return self.codes[0].shape[4]

    @property
    def num_pages(self) -> int:
        return self.codes[0].shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.codes[0].shape[2]

    @property
    def head_dim(self) -> int:
        return self.codes[0].shape[3] * 2


def init_cache(cfg: ModelConfig, num_pages: int,
               page_size: int = KV_PAGE_SIZE) -> PagedKVCache:
    """Pre-allocate the page pool (reference kv_cache.py:146-159).
    Distinct arrays per layer and field: the engine donates the cache
    pytree, and XLA rejects donating one buffer twice."""
    l, h, d = cfg.num_layers, cfg.num_kv_heads, cfg.head_dim
    assert d % 2 == 0
    codes = tuple(jnp.zeros((num_pages, 2, h, d // 2, page_size),
                            jnp.uint8) for _ in range(l))
    params = tuple(jnp.zeros((num_pages, h, 4, page_size), jnp.float32)
                   for _ in range(l))
    return PagedKVCache(codes, params)


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-token-per-head asym int4 quantize over the last (head) dim.

    Args:
      x: [..., Dh] K or V values.
    Returns:
      (codes u8 [..., Dh//2] split-half packed, scale f32 [...],
       minv f32 [...]) with dequant x ≈ codes_unpacked * scale + minv.

    Numerics match reference asym_quantize_and_pack_i4
    (kv_cache.py:22-33) exactly: scale = (max-min).clamp(1e-5)/15,
    continuous zero = -xmin (NOT rounded to the int grid), single
    rounding q = round((x - xmin)/scale), dequant q*scale + xmin.
    Only the byte layout differs (split-half packing here vs the
    reference's even/odd interleave, kv_cache.py:31 — layout only,
    same codes).
    """
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    xmax = jnp.max(xf, axis=-1)
    xmin = jnp.min(xf, axis=-1)
    scale = jnp.maximum(xmax - xmin, 1e-5) / 15.0
    q = jnp.clip(jnp.round((xf - xmin[..., None]) / scale[..., None]),
                 0.0, 15.0).astype(jnp.uint8)
    lo, hi = q[..., :d // 2], q[..., d // 2:]
    codes = lo | (hi << 4)
    return codes, scale, xmin


def unpack_codes(codes: jax.Array) -> jax.Array:
    """Split-half unpack: u8 [..., Dh//2] -> u8 [..., Dh]."""
    return jnp.concatenate([codes & jnp.uint8(0xF), codes >> 4], axis=-1)


def dequantize_kv(codes: jax.Array, scale: jax.Array, minv: jax.Array,
                  dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_kv (golden path for kernel parity tests)."""
    vals = unpack_codes(codes).astype(jnp.float32)
    return (vals * scale[..., None] + minv[..., None]).astype(dtype)


def _slots(page_table: jax.Array, positions: jax.Array, page_size: int):
    """Map absolute token positions to (page index, in-page offset).

    page_table: [B, max_pages_per_seq] i32; positions: [B, T] i32.
    """
    page_of = positions // page_size
    offs = positions % page_size
    pidx = jnp.take_along_axis(page_table, page_of, axis=1)
    return pidx, offs


def append_kv(cache: PagedKVCache, layer: int, k_new: jax.Array,
              v_new: jax.Array, page_table: jax.Array,
              positions: jax.Array) -> PagedKVCache:
    """Quantize and scatter new K/V tokens into the page pool.

    Replaces the reference's init_kv_i4 (ragged prefill scatter) and
    append_kv_i4 (single-token append) CUDA kernels
    (page.cuh:120-219) — two vectorized scatters cover both.

    Args:
      k_new/v_new: [B, T, Hkv, Dh] post-RoPE K and V.
      page_table: [B, max_pages_per_seq] i32 page ids for each seq.
      positions: [B, T] absolute positions to write (entries < 0 are
        masked out — used for ragged batches).
    """
    ps = cache.page_size
    valid = positions >= 0
    safe_pos = jnp.maximum(positions, 0)
    pidx, offs = _slots(page_table, safe_pos, ps)

    kc, ks, km = quantize_kv(k_new)            # [B,T,H,D/2],[B,T,H]
    vc, vs, vm = quantize_kv(v_new)
    kv_codes = jnp.stack([kc, vc], axis=2)     # [B,T,2,H,D/2]
    params = jnp.stack([ks, km, vs, vm], axis=-1)   # [B,T,H,4]

    if positions.shape[1] == 1:
        # decode fast path: per-row dynamic_update_slice. The XLA
        # scatter picks a DIFFERENT operand layout than the pool's
        # default, forcing two full-pool layout-conversion copies per
        # buffer per layer (~3.3 ms/step at qwen2.5-7b bs=4); DUS
        # keeps the layout and updates the donated buffers in place.
        # Masked rows write into the sink page 0 (never read).
        cb, pb = cache.codes[layer], cache.params[layer]
        b = positions.shape[0]
        for bi in range(b):
            pid = jnp.where(valid[bi, 0], pidx[bi, 0], 0)
            off = offs[bi, 0]
            upd_c = kv_codes[bi, 0].astype(jnp.uint8)[None, ..., None]
            cb = jax.lax.dynamic_update_slice(
                cb, upd_c, (pid, 0, 0, 0, off))   # [1,2,H,D/2,1]
            upd_p = params[bi, 0][None, ..., None]
            pb = jax.lax.dynamic_update_slice(
                pb, upd_p, (pid, 0, 0, off))      # [1,H,4,1]
    else:
        # prefill path: one vectorized scatter per buffer (the layout
        # round trip amortizes over the whole chunk). Masked tokens
        # route to an out-of-range page index and drop.
        pidx = jnp.where(valid, pidx, cache.num_pages)
        cb = cache.codes[layer].at[pidx, :, :, :, offs].set(
            kv_codes.astype(jnp.uint8), mode="drop")
        pb = cache.params[layer].at[pidx, :, :, offs].set(params,
                                                         mode="drop")

    def repl(t, new):
        return t[:layer] + (new,) + t[layer + 1:]

    return PagedKVCache(repl(cache.codes, cb), repl(cache.params, pb))


def gather_kv(cache: PagedKVCache, layer: int, page_table: jax.Array,
              max_len: int, dtype=jnp.float32
              ) -> Tuple[jax.Array, jax.Array]:
    """Dequantize a sequence's K/V back to dense [B, max_len, Hkv, Dh]
    (debug/parity path; the fast path is the fused Pallas decode)."""
    ps = cache.page_size
    npp = max_len // ps + (1 if max_len % ps else 0)
    pids = page_table[:, :npp]                    # [B, npp]

    c = cache.codes[layer][pids]                  # [B,npp,2,H,D/2,ps]
    p = cache.params[layer][pids]                 # [B,npp,H,4,ps]

    def one(kv):
        scale = p[..., 2 * kv, :].transpose(0, 1, 3, 2)   # [B,npp,ps,H]
        minv = p[..., 2 * kv + 1, :].transpose(0, 1, 3, 2)
        ck = c[:, :, kv]                          # [B,npp,H,D/2,ps]
        x = jnp.concatenate([ck & jnp.uint8(0xF), ck >> 4],
                            axis=-2).astype(jnp.float32)  # [B,npp,H,D,ps]
        x = x.transpose(0, 1, 4, 2, 3)            # [B,npp,ps,H,D]
        x = x * scale[..., None] + minv[..., None]
        bsz, _, _, h, d = x.shape
        return x.reshape(bsz, npp * ps, h, d)[:, :max_len].astype(dtype)

    return one(0), one(1)
