"""Packed storage formats for quantized tensors on TPU.

Layout design (TPU-first, NOT the reference's CUTLASS swizzle):

Weights are stored **K-major** (in_features leading) so the fused
dequant-GEMM contracts a [bk, bn] weight tile against a [bm, bk]
activation tile with no transposes:

  codes  : uint8 [Kq/2, N]  — byte g holds e2m1 codes for k=2g (low
                              nibble) and k=2g+1 (high nibble)
  scales : float8_e4m3fn [Kq/16, N] — per-16-element UE4M3 group scale
  global : float32 scalar   — tensor scale absmax/(448*6)

where Kq = K + KE_padded is the ARC-augmented contraction dim: the
first K rows are the plain quantized weight, rows K..K+KE are the
duplicated outlier columns (reference reorder.cu:306-325 semantics,
flat layout per SURVEY.md §7 delta 4), and the remainder up to the
next multiple of `pad_multiple` is zero groups (zero scale ⇒ zero
contribution).

The reference's scale swizzle (CUTLASS LayoutSFA, bindings.cpp:83-95)
is replaced by this plain row-major layout — TPU mandates no scale
factor layout, and [Kq/16, N] tiles map directly onto (32,128) uint8
VMEM tiles.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import numerics as N

# Kq is padded so every k-block of the GEMM grid is full.
K_PAD_MULTIPLE = 512


class PackedWeight(NamedTuple):
    """A quantized+packed linear weight, w4 format: nibble-packed
    e2m1x codes (e2m1 with mag codes 0/1 swapped — see e2m1_to_e2m1x),
    4.5 bits/element (a pytree of arrays).

    scales hold ue4m3 BYTES (uint8, bitcast of float8_e4m3fn) — the
    GEMM kernel wants u8 and an on-the-fly bitcast materializes a full
    copy of the scale array every call (measured 1.6 ms/step across a
    28-layer decode); storing bytes makes it free."""
    codes: jax.Array        # uint8 [Kq//2, N]
    scales: jax.Array       # uint8 ue4m3 bytes [Kq//16, N]
    global_scale: jax.Array  # f32 scalar
    bias: Optional[jax.Array]  # [N] or None

    @property
    def kq(self) -> int:
        return self.codes.shape[0] * 2

    @property
    def n(self) -> int:
        return self.codes.shape[1]


class PackedWeightI8(NamedTuple):
    """w8 format: each element stores 2×e2m1 value as a signed int8
    from {0,±1,±2,±3,±4,±6,±8,±12} (8.5 bits/element). Identical
    NVFP4 numerics to w4 — the doubling cancels against scale/2 in the
    GEMM — but decode is a single hardware convert, ~1.4× faster at
    decode shapes on v5e (see kernels/gemm.py module docstring)."""
    codes: jax.Array        # int8 [Kq, N]
    scales: jax.Array       # uint8 ue4m3 bytes [Kq//16, N]
    global_scale: jax.Array  # f32 scalar
    bias: Optional[jax.Array]  # [N] or None

    @property
    def kq(self) -> int:
        return self.codes.shape[0]

    @property
    def n(self) -> int:
        return self.codes.shape[1]


# mag2 integer table: 2 × e2m1 magnitude per 3-bit magnitude code
_MAG2_TABLE = (0, 1, 2, 3, 4, 6, 8, 12)


def e2m1_to_e2m1x(codes: jax.Array) -> jax.Array:
    """Remap standard e2m1 codes to the "e2m1x" STORAGE order used by
    the w4 kernel: magnitude codes 0 and 1 are swapped (sign bit kept).

    Why: with mag codes {1:0.5, 2:1, 3:1.5, 4:2, 5:3, 6:4, 7:6} the
    value is EXACTLY bitcast_f32((mag << 22) + 0x3F000000) — an affine
    map straight into the f32 exponent/mantissa fields — leaving only
    the zero code (mag==1 after the swap) to fix with one select. The
    standard order instead puts {0: 0, 1: 0.5} in the f32 *denormal*
    range, which the TPU flushes, forcing the kernel through a
    2^63-compensated magic bitcast plus sign/subnormal selects
    (~2x the decode ALU; see kernels/gemm.py). The swap is an
    involution, so this function also maps e2m1x back to e2m1."""
    return jnp.where((codes & 7) < 2, codes ^ 1, codes)


e2m1x_to_e2m1 = e2m1_to_e2m1x


def codes_to_mag2_i8(codes: jax.Array) -> jax.Array:
    """e2m1 codes (u8 0..15) -> signed mag2 int8 in {0,±1,..,±12}."""
    table = jnp.asarray(_MAG2_TABLE, jnp.int32)
    mag = table[(codes & 0x7).astype(jnp.int32)]
    return jnp.where((codes & 0x8) != 0, -mag, mag).astype(jnp.int8)


def pack_nibbles(codes: jax.Array, axis: int = -1) -> jax.Array:
    """Pack pairs of 4-bit codes (uint8 values 0..15) along `axis` into
    bytes: out = codes[even] | codes[odd] << 4."""
    axis = axis % codes.ndim
    even = jax.lax.slice_in_dim(codes, 0, codes.shape[axis], 2, axis)
    odd = jax.lax.slice_in_dim(codes, 1, codes.shape[axis], 2, axis)
    return (even | (odd << 4)).astype(jnp.uint8)


def unpack_nibbles(packed: jax.Array, axis: int = -1) -> jax.Array:
    """Inverse of pack_nibbles: interleave low/high nibbles along `axis`."""
    axis = axis % packed.ndim
    low = packed & jnp.uint8(0xF)
    high = packed >> 4
    stacked = jnp.stack([low, high], axis=axis + 1)
    shape = list(packed.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def quantize_nvfp4_groups(x: jax.Array):
    """Quantize along the last axis in 16-element groups.

    Args:
      x: [..., K] with K % 16 == 0, already divided by the global scale.
    Returns:
      (codes uint8 [..., K] (unpacked e2m1 codes),
       scales float8_e4m3fn [..., K//16])
    """
    shape = x.shape
    g = x.reshape(shape[:-1] + (shape[-1] // N.NVFP4_GROUP, N.NVFP4_GROUP))
    g = g.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    scale = jnp.clip(absmax * N.INV_E2M1_MAX, N.UE4M3_MIN,
                     N.UE4M3_MAX)
    scale8 = scale.astype(jnp.float8_e4m3fn)
    scale_dq = scale8.astype(jnp.float32)
    codes = N.e2m1_encode_scaled(g, scale_dq)
    return codes.reshape(shape), scale8.reshape(shape[:-1] + (shape[-1] // 16,))


def dequantize_nvfp4_groups(codes: jax.Array, scales: jax.Array,
                            dtype=jnp.float32) -> jax.Array:
    """Inverse of quantize_nvfp4_groups (scaled units)."""
    vals = N.e2m1_decode(codes, jnp.float32)
    s = scales.astype(jnp.float32)
    g = vals.reshape(vals.shape[:-1] + (s.shape[-1], N.NVFP4_GROUP))
    return (g * s[..., None]).reshape(vals.shape).astype(dtype)


def best_k_block(kq: int, cap: int = 2048, align: int = 128) -> int:
    """Largest divisor of kq that is a multiple of `align` and ≤ cap.

    The fused GEMM's k-grid steps have a fixed per-step cost, so small
    k-blocks (the only divisors of dims like 18944 = 512·37) are slow;
    the packer pads kq until a big block exists (see pad_kq)."""
    best = 0
    d = align
    while d <= cap:
        if kq % d == 0:
            best = d
        d += align
    return best


def pad_kq(k: int, select_num: int,
           pad_multiple: int = K_PAD_MULTIPLE) -> int:
    """Augmented+padded contraction length.

    Pads to a multiple of 512, then keeps padding (in 512 steps, up to
    +6%) until the padded length has a k-block divisor ≥ 1024 —
    zero-scale pad groups cost only their compressed bytes, and big
    k-blocks are worth far more than a few percent extra reads
    (e.g. 18944 → 19456: +2.7% bytes, 512→1024 block)."""
    kq = k + select_num
    kq = kq + (-kq) % pad_multiple
    limit = int(kq * 1.06)
    cand = kq
    while cand <= limit:
        if best_k_block(cand) >= 1024:
            return cand
        cand += pad_multiple
    return kq


def pack_weight_arc(w: jax.Array, reorder_index: jax.Array | None,
                    select_num: int,
                    bias: jax.Array | None = None,
                    pad_multiple: int = K_PAD_MULTIPLE,
                    fmt: str = "w8",
                    global_scale: jax.Array | None = None,
                    w_scale: str = "tensor",
                    aug_cols: jax.Array | None = None):
    """Quantize+pack an [N, K] weight with ARC column duplication into
    the K-major TPU layout (one-time, at load; reference analog
    qLinearLayer.py:55 NVFP4_reorder_quantize_w).

    Numerics match quant.arc.arc_quantize_w_qdq exactly: outlier
    columns (the last `select_num` entries of reorder_index) are
    re-quantized duplicates appended after the K plain columns.

    fmt: "w4" (nibble-packed, 4.5 b/elem) or "w8" (i8 mag2 codes,
    8.5 b/elem, faster decode — see kernels/gemm.py).

    global_scale: override the tensor scale (tensor-parallel shards
    pass the FULL weight's scale so every shard quantizes on the same
    grid as the unsharded tensor — bit-identical numerics under TP).

    w_scale: "tensor" (reference parity) or "channel" (one global
    scale per output channel, [N] — finer; lets concatenated fused
    QKV / gate-up packs keep per-projection scale quality).

    aug_cols: explicit residual-duplicate column VALUES [N, select_num]
    (unscaled, from the FULL weight) instead of the index-derived
    local ones — used by the exact-ARC tensor-parallel mode, where a
    shard's residual chunk duplicates channels owned by OTHER shards
    (parallel/tp.py shard_linear_row exact=True).
    """
    n, k = w.shape
    if aug_cols is not None:
        select_num = aug_cols.shape[1]
    if global_scale is not None:
        gs = jnp.asarray(global_scale, jnp.float32)
    elif w_scale == "channel":
        gs = N.nvfp4_global_scale(w, per_row=True)[:, 0]   # [N]
    else:
        gs = N.nvfp4_global_scale(w)
    gsc = gs[:, None] if gs.ndim else gs
    ws = w.astype(jnp.float32) / gsc
    if aug_cols is not None:
        ws = jnp.concatenate([ws, aug_cols.astype(jnp.float32) / gsc],
                             axis=1)
    elif select_num:
        idx = reorder_index[-select_num:].astype(jnp.int32)
        ws = jnp.concatenate([ws, ws[:, idx]], axis=1)
    kq = pad_kq(k, select_num, pad_multiple)
    pad = kq - ws.shape[1]
    if pad:
        ws = jnp.pad(ws, ((0, 0), (0, pad)))
    codes, scales = quantize_nvfp4_groups(ws)
    if pad:
        # Zero out padded group scales so padding contributes exactly 0.
        ngroups_real = (k + select_num) // 16
        smask = (jnp.arange(kq // 16) < ngroups_real)[None, :]
        scales = jnp.where(smask, scales.astype(jnp.float32),
                           0.0).astype(jnp.float8_e4m3fn)
    scales_u8 = jax.lax.bitcast_convert_type(scales, jnp.uint8)
    if fmt == "w8":
        return PackedWeightI8(codes=codes_to_mag2_i8(codes).T,  # [Kq, N]
                              scales=scales_u8.T,
                              global_scale=gs,
                              bias=bias)
    if fmt != "w4":
        raise ValueError(f"unknown weight format {fmt!r}")
    packed = pack_nibbles(e2m1_to_e2m1x(codes), axis=-1)  # [N, Kq//2]
    return PackedWeight(codes=packed.T,             # [Kq//2, N]
                        scales=scales_u8.T,         # [Kq//16, N]
                        global_scale=gs,
                        bias=bias)


def scales_f8(scales: jax.Array) -> jax.Array:
    """View a packed weight's ue4m3 scale BYTES as float8_e4m3fn
    (accepts legacy f8-typed arrays unchanged)."""
    if scales.dtype == jnp.uint8:
        return jax.lax.bitcast_convert_type(scales, jnp.float8_e4m3fn)
    return scales


def dequantize_weight(pw, k: int, select_num: int,
                      dtype=jnp.float32) -> jax.Array:
    """Reconstruct the augmented qdq weight [N, K+KE] in scaled units
    (golden path for parity tests; the global scale is NOT folded in,
    matching arc_quantize_w_qdq). Accepts both w4 and w8 packings."""
    if isinstance(pw, PackedWeightI8):
        s = scales_f8(pw.scales).T.astype(jnp.float32)   # [N, Kq//16]
        vals = pw.codes.T.astype(jnp.float32) * 0.5  # [N, Kq]
        n, kq = vals.shape
        g = vals.reshape(n, kq // 16, 16) * s[..., None]
        return g.reshape(n, kq)[:, :k + select_num].astype(dtype)
    codes = e2m1x_to_e2m1(unpack_nibbles(pw.codes.T, axis=-1))  # [N, Kq]
    full = dequantize_nvfp4_groups(codes, scales_f8(pw.scales).T, dtype)
    return full[:, :k + select_num]
