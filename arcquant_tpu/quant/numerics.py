"""Golden quantization numerics for ARCQuant-TPU.

Pure-jnp reference implementations of every number format the framework
supports. These functions define the *exact* semantics that the fused
Pallas kernels (arcquant_tpu/kernels/) must reproduce bit-for-bit; the
kernel parity tests compare against this module.

Formats (parity with reference /root/reference/model/quantize.py):
  - NVFP4:  e2m1 elements, 16-element groups, UE4M3 (fp8 e4m3fn) group
            scale, plus one global fp32 tensor scale absmax/(448*6)
            (reference: quantize.py:65-92, qLinearLayer.py:26).
  - MXFP4:  e2m1 elements, 32-element groups, UE8M0 (power-of-2) scales
            (reference: quantize.py:94-122).
  - MXFP6:  e3m2 elements, 32-element groups, UE8M0 scales
            (reference: quantize.py:180-216).
  - INT4:   symmetric int4, 128-element groups, fp scale absmax/7
            (reference: quantize.py:124-151).
  - Asymmetric int-N group quant for KV caches
            (reference: qLlamaLayer.py:17-28 `quantize_int_group`).

Deliberate, documented deviations from the reference numerics:
  1. e2m1 rounding ties go toward the *smaller magnitude* for both
     signs. The reference's table-argmin breaks ties toward the lower
     table index, which is sign-dependent (toward 0 for positive
     inputs, away from 0 for negative ones) — an artifact of
     torch.argmin, not a design choice.
  2. UE4M3 scale rounding is true IEEE-style fp8 e4m3fn
     round-to-nearest-even (via jnp astype), with a pre-clamp to
     [2^-9, 448]. The reference has two slightly different ad-hoc
     implementations (quantize.py:40-49 clamps at 2e-3; kernels/
     fake.py:20-29 clamps at 1/512) that disagree with each other;
     we pick one self-consistent definition shared by the fake path
     and the Pallas kernels.
  3. NVFP4 element rounding compares |x| against boundary*scale
     (exact f32 products — e2m1_encode_scaled) instead of rounding
     the quotient x/scale and comparing: no double rounding, and no
     division chain for XLA to reassociate (jit and eager dispatch
     otherwise disagree by 1 ulp and flip roundings at boundaries —
     the grid must be identical across eager / jit / Mosaic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Format constants
# --------------------------------------------------------------------------

# Positive representable magnitudes of FP4 E2M1 (reference quantize.py:14-22).
E2M1_MAGNITUDES = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
# Decision boundaries between consecutive magnitudes (midpoints).
E2M1_BOUNDARIES = (0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0)
E2M1_MAX = 6.0

UE4M3_MAX = 448.0
UE4M3_MIN = 2.0 ** -9  # smallest e4m3fn subnormal

# Global tensor scale divisor: absmax / (UE4M3_MAX * E2M1_MAX)
NVFP4_GLOBAL_DIV = UE4M3_MAX * E2M1_MAX  # 2688.0

# Scale divisions use MULTIPLY by the f32-rounded reciprocal, not a
# divide: XLA strength-reduces constant divides under jit but not in
# eager dispatch (measured 1-ulp divergence, round 4), and Mosaic may
# lower them differently again. A fixed reciprocal constant makes the
# scale grid identical across eager / jit / Pallas lowerings. (6 and
# 2688 are not powers of two, so the reciprocal is inexact — that
# only shifts the quantization grid by <=1 ulp, consistently.)
import numpy as _np

INV_E2M1_MAX = float(_np.float32(1.0) / _np.float32(E2M1_MAX))
INV_NVFP4_GLOBAL_DIV = float(
    _np.float32(1.0) / _np.float32(NVFP4_GLOBAL_DIV))

NVFP4_GROUP = 16
MXFP4_GROUP = 32
MXFP6_GROUP = 32
INT4_GROUP = 128

E3M2_MAX = 28.0


# --------------------------------------------------------------------------
# Element codecs
# --------------------------------------------------------------------------

def e2m1_encode(x: jax.Array) -> jax.Array:
    """Quantize real values to FP4 E2M1 codes (uint8 in [0, 15]).

    Code layout: bit 3 = sign, bits 2:0 = magnitude index into
    E2M1_MAGNITUDES. Ties round toward smaller magnitude.
    """
    mag = jnp.abs(x).astype(jnp.float32)
    idx = jnp.zeros(x.shape, jnp.uint8)
    for b in E2M1_BOUNDARIES:
        idx = idx + (mag > b).astype(jnp.uint8)
    sign = (x < 0).astype(jnp.uint8) << 3
    return sign | idx


def e2m1_encode_scaled(x: jax.Array, scale: jax.Array) -> jax.Array:
    """e2m1 codes of x/scale WITHOUT dividing: boundary decisions run
    in product space, |x| > boundary*scale. Both factors carry short
    significands (boundaries <=3 bits, ue4m3 scales <=4 bits), so the
    products are EXACT in f32 and the comparison equals the
    infinitely-precise quotient comparison — no double rounding, and
    no division for XLA to reassociate (divide-then-compare gave
    jit-vs-eager 1-ulp flips; see INV_E2M1_MAX note). Ties round
    toward smaller magnitude, same as e2m1_encode."""
    mag = jnp.abs(x).astype(jnp.float32)
    s = scale.astype(jnp.float32)
    idx = jnp.zeros(x.shape, jnp.uint8)
    for b in E2M1_BOUNDARIES:
        idx = idx + (mag > jnp.float32(b) * s).astype(jnp.uint8)
    sign = (x < 0).astype(jnp.uint8) << 3
    return sign | idx


def e2m1_decode(codes: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Decode E2M1 codes back to real values.

    Pure bit arithmetic (the "magic bitcast": the f32 whose exponent/
    mantissa fields are the e2m1 fields equals e2m1(c) * 2^-126, with
    the denormal-flushed subnormal codes ±0.5 taking one select) — a
    table gather here is serial poison on the TPU VPU and dominated
    the whole activation-quantize chain."""
    c = codes.astype(jnp.int32)
    mag = c & 0x7
    bits = (mag << 22) | ((c & 0x8) << 28)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(
        2.0 ** 126)
    sgn = 1.0 - ((c >> 3) << 1).astype(jnp.float32)
    val = jnp.where(mag < 2, (sgn * 0.5) * mag.astype(jnp.float32), f)
    return val.astype(dtype)


def quantize_e2m1(x: jax.Array) -> jax.Array:
    """Round values to the nearest representable E2M1 value (qdq)."""
    return e2m1_decode(e2m1_encode(x), x.dtype)


def quantize_ue4m3(s: jax.Array) -> jax.Array:
    """Round positive scales to fp8 e4m3fn values (qdq), clamped to
    [2^-9, 448]."""
    s = jnp.clip(s.astype(jnp.float32), UE4M3_MIN, UE4M3_MAX)
    return s.astype(jnp.float8_e4m3fn).astype(jnp.float32)


def quantize_ue8m0(s: jax.Array) -> jax.Array:
    """Round positive scales UP to the nearest power of two (qdq).

    Matches reference quantize.py:54-60 (ceil of log2, clamped).
    """
    e = jnp.ceil(jnp.log2(s.astype(jnp.float32) + 1e-9))
    e = jnp.clip(e, -127.0, 127.0)
    return jnp.exp2(e)


def _e3m2_values() -> jnp.ndarray:
    """Positive representable values of FP6 E3M2 (reference
    quantize.py:153-167): subnormals {1,2,3}/16 and (1+m/4)*2^(e-3)
    for e in 1..7, m in 0..3."""
    vals = [0.0, 0.0625, 0.125, 0.1875]
    for e in range(1, 8):
        for m in (1.0, 1.25, 1.5, 1.75):
            vals.append(m * 2.0 ** (e - 3))
    return jnp.asarray(sorted(set(vals)), jnp.float32)


_E3M2_TABLE = None


def quantize_e3m2(x: jax.Array) -> jax.Array:
    """Round values to nearest representable E3M2 value (qdq).

    Ties toward smaller magnitude (see module docstring, deviation 1).
    """
    global _E3M2_TABLE
    if _E3M2_TABLE is None:
        _E3M2_TABLE = _e3m2_values()
    table = _E3M2_TABLE
    mids = (table[:-1] + table[1:]) / 2.0
    mag = jnp.abs(x).astype(jnp.float32)
    idx = jnp.sum(mag[..., None] > mids, axis=-1)
    val = table[idx]
    return (jnp.sign(x).astype(jnp.float32) * val).astype(x.dtype)


def int4_encode(x: jax.Array) -> jax.Array:
    """Round to nearest integer in [-8, 7], returned as int8."""
    return jnp.clip(jnp.round(x.astype(jnp.float32)), -8, 7).astype(jnp.int8)


# --------------------------------------------------------------------------
# Group quantizers (quantize-dequantize, "fake quant")
# --------------------------------------------------------------------------

def _group_reshape(x: jax.Array, group: int):
    """Pad last dim to a multiple of `group` and reshape to (-1, group)."""
    k = x.shape[-1]
    pad = (-k) % group
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x.reshape(-1, group), pad


def _group_unshape(g: jax.Array, shape, pad: int) -> jax.Array:
    k = shape[-1]
    out = g.reshape(shape[:-1] + (k + pad,))
    if pad:
        out = out[..., :k]
    return out


def nvfp4_qdq(x: jax.Array, group: int = NVFP4_GROUP) -> jax.Array:
    """NVFP4 quantize-dequantize: per-`group` absmax/6 scale rounded to
    UE4M3, elements rounded to E2M1 (reference quantize.py:65-92)."""
    shape = x.shape
    g, pad = _group_reshape(x, group)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True).astype(jnp.float32)
    scale = quantize_ue4m3(absmax * INV_E2M1_MAX)
    g = g.astype(jnp.float32)
    q = e2m1_decode(e2m1_encode_scaled(g, scale)) * scale
    return _group_unshape(q.astype(x.dtype), shape, pad)


def mxfp4_qdq(x: jax.Array, group: int = MXFP4_GROUP) -> jax.Array:
    """MXFP4 quantize-dequantize: per-32 absmax/6 scale rounded to UE8M0
    (reference quantize.py:94-122)."""
    shape = x.shape
    g, pad = _group_reshape(x, group)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True).astype(jnp.float32)
    scale = quantize_ue8m0(jnp.where(absmax == 0, 1e-9,
                                     absmax * INV_E2M1_MAX))
    q = quantize_e2m1(g.astype(jnp.float32) / scale) * scale
    return _group_unshape(q.astype(x.dtype), shape, pad)


def mxfp6_qdq(x: jax.Array, group: int = MXFP6_GROUP) -> jax.Array:
    """MXFP6 quantize-dequantize: E3M2 elements, per-32 absmax/28 UE8M0
    scale (reference quantize.py:180-216)."""
    shape = x.shape
    g, pad = _group_reshape(x, group)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True).astype(jnp.float32)
    scale = quantize_ue8m0(jnp.where(absmax == 0, 1e-9, absmax / E3M2_MAX))
    q = quantize_e3m2(g.astype(jnp.float32) / scale) * scale
    return _group_unshape(q.astype(x.dtype), shape, pad)


def int4_group_qdq(x: jax.Array, group: int = INT4_GROUP) -> jax.Array:
    """Symmetric INT4 quantize-dequantize with per-`group` absmax/7
    scale (reference quantize.py:124-151)."""
    shape = x.shape
    g, pad = _group_reshape(x, group)
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True).astype(jnp.float32)
    scale = jnp.where(absmax == 0, 1e-9, absmax / 7.0)
    q = int4_encode(g.astype(jnp.float32) / scale).astype(jnp.float32) * scale
    return _group_unshape(q.astype(x.dtype), shape, pad)


def asym_int_group_qdq(x: jax.Array, nbits: int = 4,
                       group: int = 64) -> jax.Array:
    """Asymmetric unsigned int-N group quantize-dequantize, used for KV
    cache fake quantization (reference qLlamaLayer.py:17-28).

    scale = (max - min).clamp(1e-5) / (2^n - 1); zero = round(-min/scale).
    """
    shape = x.shape
    g = x.reshape(-1, group).astype(jnp.float32)
    qmax = float(2 ** nbits - 1)
    gmax = jnp.max(g, axis=-1, keepdims=True)
    gmin = jnp.min(g, axis=-1, keepdims=True)
    scale = jnp.maximum(gmax - gmin, 1e-5) / qmax
    zero = jnp.clip(jnp.round(-gmin / scale), 0.0, qmax)
    q = jnp.clip(jnp.round(g / scale) + zero, 0.0, qmax)
    return ((q - zero) * scale).reshape(shape).astype(x.dtype)


def asym_int4_encode(x: jax.Array, group: int = 64):
    """Asymmetric int4 encode for the real KV-cache path: returns
    (codes uint8 in [0,15] (unpacked), scale f32, zero f32) per group.

    Reference semantics: kv_cache.py:22-33 `asym_quantize_and_pack_i4`.
    """
    shape = x.shape
    g = x.reshape(-1, group).astype(jnp.float32)
    gmax = jnp.max(g, axis=-1, keepdims=True)
    gmin = jnp.min(g, axis=-1, keepdims=True)
    scale = jnp.maximum(gmax - gmin, 1e-5) / 15.0
    zero = jnp.clip(jnp.round(-gmin / scale), 0.0, 15.0)
    codes = jnp.clip(jnp.round(g / scale) + zero, 0.0, 15.0).astype(jnp.uint8)
    return (codes.reshape(shape),
            scale.reshape(shape[:-1] + (group and shape[-1] // group,)),
            zero.reshape(shape[:-1] + (shape[-1] // group,)))


# --------------------------------------------------------------------------
# Global-scale helpers (NVFP4 two-level scaling)
# --------------------------------------------------------------------------

def nvfp4_global_scale(x: jax.Array, per_row: bool = False) -> jax.Array:
    """Global fp32 tensor scale absmax/(448*6) so group scales fit the
    UE4M3 range (reference qLinearLayer.py:26, qLlamaLayer.py:74).

    Uses absmax (the reference inconsistently uses signed max for
    weights and absmax for activations; absmax is strictly safer).

    per_row=True returns one scale per leading row ([M, 1]) instead of
    one per tensor — finer granularity than the reference, and it
    makes each sequence's activation quantization independent of its
    batch neighbors (exact batch isolation in the serving engine)."""
    if per_row:
        s = (jnp.max(jnp.abs(x), axis=-1, keepdims=True)
             .astype(jnp.float32) * INV_NVFP4_GLOBAL_DIV)
    else:
        s = (jnp.max(jnp.abs(x)).astype(jnp.float32)
             * INV_NVFP4_GLOBAL_DIV)
    return jnp.maximum(s, jnp.float32(1e-12))


def quantize_tensor_qdq(x: jax.Array, quant_type: str = "NVFP4") -> jax.Array:
    """Tensor-level quantize-dequantize with the format's full scaling
    scheme (global scale for NVFP4; identity scale otherwise)."""
    if quant_type == "NVFP4":
        s = nvfp4_global_scale(x)
        return (nvfp4_qdq(x.astype(jnp.float32) / s) * s).astype(x.dtype)
    if quant_type == "MXFP4":
        return mxfp4_qdq(x)
    if quant_type == "MXFP6":
        return mxfp6_qdq(x)
    if quant_type == "INT4":
        return int4_group_qdq(x)
    raise ValueError(f"unknown quant_type {quant_type!r}")


_QDQ_FUNCS = {
    "NVFP4": nvfp4_qdq,
    "MXFP4": mxfp4_qdq,
    "MXFP6": mxfp6_qdq,
    "INT4": int4_group_qdq,
}


def group_qdq(x: jax.Array, quant_type: str) -> jax.Array:
    """Group-level quantize-dequantize WITHOUT a global scale."""
    return _QDQ_FUNCS[quant_type](x)
