"""Fused NVFP4 dequant + GEMM Pallas kernel — the heart of the
framework.

TPU-native replacement for the reference's CUTLASS SM120 block-scaled
tensor-op GEMM (kernels/src/nvfp4.cu:10-121). The TPU MXU has no FP4
tensor ops, so the win is *HBM bandwidth*: weights stream at 4.5
bits/element (packed e2m1 codes + 1 fp8 scale per 16) instead of 16,
are decoded to bf16 on the VPU inside the k-loop, and feed the MXU as
bf16×bf16→f32. At decode shapes (small M) the GEMM is purely
weight-bandwidth-bound, so the ideal speedup over a bf16 GEMM is
16/4.5 ≈ 3.5× (SURVEY.md §2.2).

Layout contract (see quant/packing.py):
  codes  u8  [Kq/2, N]: byte g of column n packs e2m1 codes for
                        k=2g (low nibble) and k=2g+1 (high nibble)
  scales fp8 [Kq/16, N] (bitcast to u8 at the call boundary)
  x      bf16 [M, 2, Kq/2]: deinterleaved qdq activations —
                        [:,0,:] = even k, [:,1,:] = odd k

The deinterleaved x layout lets the kernel contract low and high
nibbles as two half-K MXU dots with NO sublane interleave of the
decoded weights (a pure-layout trick the CUDA reference doesn't need
because its tensor cores consume packed fp4 directly).

Both e2m1 and ue4m3 are decoded with integer bit arithmetic + bitcast
(no fp8 hardware dependence):
  e2m1  (s e e m): e>0 -> (1+m/2)*2^(e-1)  == f32 bits ((e+126)<<23)|(m<<22)
                   e=0 -> m*0.5 (subnormal)
  e4m3fn (e e e e m m m, unsigned): e>0 -> (1+m/8)*2^(e-7)
                   == f32 bits ((e+120)<<23)|(m<<20); e=0 -> m*2^-9
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.packing import PackedWeight

# None = auto (interpret unless running on TPU); True/False to force.
_INTERPRET = None


def _use_interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"


def _decode_e2m1_f32(nibble: jax.Array) -> jax.Array:
    """Decode e2m1 nibbles (i32 values 0..15) to f32 via bit tricks."""
    mag = nibble & 0x7
    e = mag >> 1
    m = mag & 1
    sign_bit = (nibble & 0x8) << 28          # -> f32 sign bit
    normal_bits = ((e + 126) << 23) | (m << 22) | sign_bit
    normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    sub = jnp.where(sign_bit != 0, -0.5, 0.5) * m.astype(jnp.float32)
    return jnp.where(e == 0, sub, normal)


def _decode_ue4m3_f32(byte: jax.Array) -> jax.Array:
    """Decode unsigned e4m3fn bytes (i32 values 0..255) to f32."""
    e = (byte >> 3) & 0xF
    m = byte & 0x7
    normal_bits = ((e + 120) << 23) | (m << 20)
    normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    sub = m.astype(jnp.float32) * (2.0 ** -9)
    return jnp.where(e == 0, sub, normal)


def _gemm_kernel(gs_ref, x_ref, codes_ref, scales_ref, o_ref, acc_ref,
                 *, n_k: int, out_dtype):
    """One (bm, bn) output tile; k-dim is the innermost grid axis and
    accumulates into the f32 VMEM scratch."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[:].astype(jnp.int32)          # [bk2, bn]
    w_even = _decode_e2m1_f32(codes & 0xF)
    w_odd = _decode_e2m1_f32(codes >> 4)

    s = _decode_ue4m3_f32(scales_ref[:].astype(jnp.int32))  # [bk2/8, bn]
    # group g covers bytes 8g..8g+7 (16 original k), same for both
    # nibbles; element-repeat rows 8x via broadcast+reshape
    g, bn = s.shape
    s = jnp.broadcast_to(s[:, None, :], (g, 8, bn)).reshape(g * 8, bn)

    w_even = (w_even * s).astype(jnp.bfloat16)
    w_odd = (w_odd * s).astype(jnp.bfloat16)

    x_even = x_ref[:, 0, :]
    x_odd = x_ref[:, 1, :]
    acc_ref[:] += (
        jnp.dot(x_even, w_even, preferred_element_type=jnp.float32)
        + jnp.dot(x_odd, w_odd, preferred_element_type=jnp.float32))

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * gs_ref[0, 0]).astype(out_dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def deinterleave_x(xa: jax.Array) -> jax.Array:
    """[M, Kq] -> [M, 2, Kq/2] (even k, odd k)."""
    return jnp.stack([xa[:, 0::2], xa[:, 1::2]], axis=1)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk",
                                             "interpret"))
def _gemm_call(x_de, codes, scales_u8, gs, *, out_dtype, bm, bn, bk,
               interpret):
    m = x_de.shape[0]
    kq2 = x_de.shape[2]
    n = codes.shape[1]
    n_k = pl.cdiv(2 * kq2, bk)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), n_k)
    gs2 = gs.reshape(1, 1).astype(jnp.float32)
    kernel = functools.partial(_gemm_kernel, n_k=n_k, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, 2, bk // 2),
                         lambda i, j, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn),
                         lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn),
                         lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * 2 * kq2,
            bytes_accessed=(kq2 * n) + (2 * kq2 // 16 * n)
            + m * 2 * kq2 * 2 + m * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(gs2, x_de, codes, scales_u8)


def gemm_dequant(xa: jax.Array, pw: PackedWeight, gx: jax.Array,
                 out_dtype=jnp.bfloat16,
                 bm: int = 0, bn: int = 0, bk: int = 512) -> jax.Array:
    """y[M, N] = (xa @ dequant(pw).T) * (gx * pw.global_scale) + bias.

    Args:
      xa: [M, Kq] quantize-dequantized activations in scaled units
          (bf16/f32), Kq == pw.kq (caller pads; see quantize_x_arc), or
          pre-deinterleaved [M, 2, Kq/2].
      pw: packed weight (codes/scales K-major).
      gx: activation global scale (f32 scalar).
    """
    if xa.ndim == 2:
        x_de = deinterleave_x(xa.astype(jnp.bfloat16))
    else:
        x_de = xa.astype(jnp.bfloat16)
    m = x_de.shape[0]
    n = pw.n
    if bm == 0:
        bm = min(_round_up(m, 16), 256)
    if bn == 0:
        bn = 256 if n % 256 == 0 else 128
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x_de = jnp.pad(x_de, ((0, m_pad - m), (0, 0), (0, 0)))
    scales_u8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
    gs = (gx.astype(jnp.float32) * pw.global_scale.astype(jnp.float32))
    y = _gemm_call(x_de, pw.codes, scales_u8, gs,
                   out_dtype=jnp.dtype(out_dtype).name, bm=bm, bn=bn,
                   bk=bk, interpret=_use_interpret())
    y = y[:m] if m_pad != m else y
    if pw.bias is not None:
        y = (y.astype(jnp.float32) + pw.bias.astype(jnp.float32)
             ).astype(out_dtype)
    return y


def dequantize_weight_kernel(pw: PackedWeight, dtype=jnp.bfloat16
                             ) -> jax.Array:
    """Decode a full packed weight to [Kq, N] (debug/testing path using
    the same bit-arithmetic decoders as the kernel)."""
    codes = pw.codes.astype(jnp.int32)
    w_even = _decode_e2m1_f32(codes & 0xF)
    w_odd = _decode_e2m1_f32(codes >> 4)
    s_u8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
    s = _decode_ue4m3_f32(s_u8.astype(jnp.int32))
    s = jnp.repeat(s, 8, axis=0)
    kq2, n = codes.shape
    out = jnp.zeros((2 * kq2, n), jnp.float32)
    out = out.at[0::2].set(w_even * s)
    out = out.at[1::2].set(w_odd * s)
    return out.astype(dtype)
