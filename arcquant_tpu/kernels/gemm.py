"""Fused NVFP4 dequant + GEMM Pallas kernels — the heart of the
framework.

TPU-native replacement for the reference's CUTLASS SM120 block-scaled
tensor-op GEMM (kernels/src/nvfp4.cu:10-121). The TPU MXU has no FP4
tensor ops, so the win is *HBM bandwidth*: weights stream compressed,
are decoded on the VPU inside the k-loop, and feed the MXU as
bf16×bf16→f32. At decode shapes (small M) the GEMM is purely
weight-bandwidth/decode-bound.

Two storage formats share EXACT NVFP4+ARC numerics (both store the
same e2m1 codes + ue4m3 group scales; only the byte encoding differs):

  w4 ("packed", 4.5 bits/elem) — codes u8 [Kq/2, N], byte g of column
    n packs e2m1x codes for k=2g (low nibble) / k=2g+1 (high nibble).
    e2m1x is e2m1 with magnitude codes 0<->1 swapped at PACK time
    (packing.e2m1_to_e2m1x): the nonzero codes {1:0.5, 2:1, 3:1.5,
    4:2, 5:3, 6:4, 7:6} then decode with a single affine bit map
       f32_bitcast(((c&7) << 22 | (c&8) << 28) + 0x3F000000)
    — the mag bits land directly in the f32 exponent/mantissa fields,
    in the NORMAL range (no denormal-flush hazard, no 2^-126
    compensation), with the sign or'd in. Only the zero code (mag==1)
    needs a select. ~8 VPU ops per nibble vs ~16 for the round-1
    magic-bitcast path.

  w8 ("expanded", 8.5 bits/elem, default) — codes i8 [Kq, N] holding
    2×e2m1 values exactly (the magnitude set {0,.5,1,1.5,2,3,4,6}
    doubled is the integer set {0,1,2,3,4,6,8,12}); decode is one
    hardware convert + one multiply by (group_scale/2). ~1.4× faster
    than w4 at decode shapes on v5e (VPU-decode-bound), at 2× the
    weight memory — pick per deployment with QuantConfig.weight_fmt.

Both kernels contract a single stacked [BM, BK] × [BK, BN] MXU dot per
k-step (small separate dots per nibble were the v0 bottleneck). The
w4 activation layout is therefore "even ks first, then odd ks"
(split-halves), matching the stacked [w_even; w_odd] decode order.
"""

from __future__ import annotations

import functools
import os
from typing import Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.packing import PackedWeight, PackedWeightI8

# None = auto (interpret unless running on TPU); True/False to force.
_INTERPRET = None

# M-dispatch threshold: at M >= this, gemm_dequant dequantizes the
# whole weight to bf16 inline (one fused XLA pass over the codes) and
# runs XLA's native matmul (~97% MXU on v5e) instead of the fused
# Pallas kernel (~82% MXU at large M — Mosaic per-k-step overhead).
# The dequant pass is independent of the preceding layer's matmul, so
# XLA's latency-hiding scheduler overlaps it. 0 disables the dispatch.
_XLA_M_ENV = "ARC_GEMM_XLA_M"
_XLA_M_DEFAULT = 512


def _xla_dispatch_m() -> int:
    return int(os.environ.get(_XLA_M_ENV, str(_XLA_M_DEFAULT)))


def _use_interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Reference bit decoders (tests / debug; the kernels inline variants)
# ---------------------------------------------------------------------------

def _decode_e2m1_f32(nibble: jax.Array) -> jax.Array:
    """Decode e2m1 nibbles (i32 values 0..15) to f32 via the magic
    bitcast (see module docstring). The denormal bit pattern the magic
    relies on for the subnormal codes (±0.5) is flushed to zero by the
    TPU (and XLA:CPU), so that one case takes an explicit select."""
    mag = nibble & 0x7
    bits = (mag << 22) | ((nibble & 0x8) << 28)
    f = jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(
        2.0 ** 126)
    sgn = 1.0 - ((nibble >> 3) << 1).astype(jnp.float32)
    return jnp.where(mag < 2, (sgn * 0.5) * mag.astype(jnp.float32), f)


def _decode_ue4m3_f32(byte: jax.Array, exp_offset: int = 0) -> jax.Array:
    """Decode unsigned e4m3fn bytes (i32 values 0..255) to
    f32 * 2^exp_offset."""
    e = (byte >> 3) & 0xF
    m = byte & 0x7
    normal_bits = ((e + 120 + exp_offset) << 23) | (m << 20)
    normal = jax.lax.bitcast_convert_type(normal_bits, jnp.float32)
    sub = m.astype(jnp.float32) * (2.0 ** (exp_offset - 9))
    return jnp.where(e == 0, sub, normal)


def _expand_groups(s: jax.Array, rep: int) -> jax.Array:
    """[G, BN] -> [G*rep, BN] sublane-repeat (per-16 scale expand)."""
    g, bn = s.shape
    return jnp.broadcast_to(s[:, None, :], (g, rep, bn)).reshape(
        g * rep, bn)


# ---------------------------------------------------------------------------
# w4 kernel (packed nibbles, magic decode)
# ---------------------------------------------------------------------------

def _gemm_w4_kernel(gs_ref, gw_ref, xe_ref, xo_ref, codes_ref,
                    scales_ref, bias_ref, o_ref, acc_ref, *, n_k: int,
                    out_dtype, has_bias: bool):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c = codes_ref[:].astype(jnp.int32)               # [bk2, bn]

    def dec(nib):
        # e2m1x affine decode (see module docstring): mag bits map
        # straight into the f32 exponent/mantissa; only the zero code
        # (mag==1 in storage order) needs a select
        mag = nib & 0x7
        bits = ((mag << 22) | ((nib & 0x8) << 28)) + 0x3F000000
        f = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return jnp.where(mag == 1, 0.0, f)

    w_even = dec(c & 0xF)
    w_odd = dec(c >> 4)
    s = _decode_ue4m3_f32(scales_ref[:].astype(jnp.int32))
    # group-scale multiply via a 3D sublane-split reshape (same trick
    # as the w8 kernel): Mosaic folds the 8-sublane broadcast into the
    # multiply instead of materializing the expanded scale array
    # (measured 55 -> 47 us at M=32 N=K=4096, gemm_lab --exp w4)
    bk2, bn = c.shape
    se = s[:, None, :]
    w_even = (w_even.reshape(bk2 // 8, 8, bn) * se).reshape(bk2, bn)
    w_odd = (w_odd.reshape(bk2 // 8, 8, bn) * se).reshape(bk2, bn)
    w = jnp.concatenate([w_even, w_odd],
                        axis=0).astype(jnp.bfloat16)  # [bk, bn]
    xx = jnp.concatenate([xe_ref[:], xo_ref[:]], axis=1)  # [bm, bk]
    acc_ref[:] += jnp.dot(xx, w, preferred_element_type=jnp.float32)

    @pl.when(kb == n_k - 1)
    def _():
        # [bm, bn] * [bm, 1] row scale * [1, bn] weight channel scale
        y = acc_ref[:] * gs_ref[:] * gw_ref[:]
        if has_bias:
            y = y + bias_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(out_dtype)


# ---------------------------------------------------------------------------
# w8 kernel (i8 mag2 codes)
# ---------------------------------------------------------------------------

def _gemm_w8_kernel(gs_ref, gw_ref, x_ref, codes_ref, scales_ref,
                    bias_ref, o_ref, acc_ref, *, n_k: int, out_dtype,
                    has_bias: bool):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    bk, bn = codes_ref.shape
    w = codes_ref[:].astype(jnp.float32)             # [bk, bn]
    # scale/2 folds the mag2 doubling back out
    s = _decode_ue4m3_f32(scales_ref[:].astype(jnp.int32)) * 0.5
    # group-scale multiply via a 3D sublane-split reshape — Mosaic
    # broadcasts s over the 16 sublanes in the multiply itself, vs the
    # materialized _expand_groups copy. Same-process A/B at M=32
    # N=K=4096 (round 3): mul3d 27.98 us ~= noscale 27.75 (the scale
    # mul is free; 78% of the 21.77 us weight-stream floor — the rest
    # is per-grid-step fixed cost, see BASELINE.md reconciliation; an
    # earlier 23.4 us reading was cross-process chip variance)
    w = (w.reshape(bk // 16, 16, bn) * s[:, None, :]).reshape(
        bk, bn).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(kb == n_k - 1)
    def _():
        # [bm, bn] * [bm, 1] row scale * [1, bn] weight channel scale
        y = acc_ref[:] * gs_ref[:] * gw_ref[:]
        if has_bias:
            y = y + bias_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Decode-shape manual-DMA w8 kernel (streams codes HBM->VMEM itself)
# ---------------------------------------------------------------------------

# At decode shapes the auto-pipelined kernel pays a per-grid-step fixed
# cost (~6 us over the weight-stream floor at M=32 N=K=4096 — see
# BASELINE.md reconciliation). This variant keeps codes in HBM and
# streams [bk, bn] stripes through an explicit multi-buffered DMA loop
# (the paged_decode.py trick applied to the weight stream), collapsing
# the grid to (N/bn,) programs with one fori_loop over k. Numerics are
# identical to _gemm_w8_kernel (same decode + mul3d scale expressions).
# Enabled for M <= ARC_GEMM_DMA_M (0 disables) on square weights only
# (see the shape gate in gemm_dequant) — promoted after the on-chip
# A/B (gemm_lab --exp dmaprod, results/r3/dmaprod.log): o-proj
# 15.26 us vs fused 21.82 at bit-exact output.
_DMA_M_ENV = "ARC_GEMM_DMA_M"
_DMA_M_DEFAULT = 64
_DMA_NBUF = 3


def _dma_dispatch_m() -> int:
    return int(os.environ.get(_DMA_M_ENV, str(_DMA_M_DEFAULT)))


def _gemm_w8_dma_kernel(gs_ref, gw_ref, x_ref, s_ref, bias_ref,
                        codes_hbm, o_ref, c_s, sems, acc_ref, *,
                        bk: int, nbuf: int, n_k: int, out_dtype,
                        has_bias: bool):
    j = pl.program_id(0)
    bn = o_ref.shape[1]

    def dma(slot, i):
        return pltpu.make_async_copy(
            codes_hbm.at[pl.ds(i * bk, bk), pl.ds(j * bn, bn)],
            c_s.at[slot], sems.at[slot])

    for i in range(min(nbuf - 1, n_k)):
        dma(i, i).start()
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def loop(i, _):
        slot = jax.lax.rem(i, nbuf)

        @pl.when(i + nbuf - 1 < n_k)
        def _():
            dma(jax.lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

        dma(slot, i).wait()
        w = c_s[slot].astype(jnp.float32)              # [bk, bn]
        # NB: slice the REF (dynamic load), not the loaded value —
        # Mosaic TC has no lowering for dynamic_slice on values.
        s = _decode_ue4m3_f32(
            s_ref[pl.ds(i * (bk // 16), bk // 16), :]
            .astype(jnp.int32)) * 0.5
        w = (w.reshape(bk // 16, 16, bn) * s[:, None, :]).reshape(
            bk, bn).astype(jnp.bfloat16)
        xx = x_ref[:, pl.ds(i * bk, bk)]
        acc_ref[:] += jnp.dot(xx, w, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_k, loop, 0)
    y = acc_ref[:] * gs_ref[:] * gw_ref[:]
    if has_bias:
        y = y + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(out_dtype)


def _gemm_w4_dma_kernel(gs_ref, gw_ref, x_ref, s_ref, bias_ref,
                        codes_hbm, o_ref, c_s, sems, acc_ref, *,
                        bk: int, nbuf: int, n_k: int, out_dtype,
                        has_bias: bool):
    """Manual-DMA variant of the w4 fused kernel (VERDICT r4 next #4:
    the DMA stream sustains >nominal HBM BW on shallow stripes and w4
    halves the code traffic vs w8 — the e2m1x nibble-decode ALU may
    hide inside the DMA wait window). Same decode expressions as
    _gemm_w4_kernel: split-half k order, low nibble = even k, high =
    odd k, shared per-16 ue4m3 group scale."""
    j = pl.program_id(0)
    bn = o_ref.shape[1]
    bkh = bk // 2                       # code rows per k-block
    kqh = x_ref.shape[1] // 2           # even/odd halves of x

    def dma(slot, i):
        return pltpu.make_async_copy(
            codes_hbm.at[pl.ds(i * bkh, bkh), pl.ds(j * bn, bn)],
            c_s.at[slot], sems.at[slot])

    for i in range(min(nbuf - 1, n_k)):
        dma(i, i).start()
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def dec(nib):
        # e2m1x affine decode (see _gemm_w4_kernel)
        mag = nib & 0x7
        bits = ((mag << 22) | ((nib & 0x8) << 28)) + 0x3F000000
        f = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return jnp.where(mag == 1, 0.0, f)

    def loop(i, _):
        slot = jax.lax.rem(i, nbuf)

        @pl.when(i + nbuf - 1 < n_k)
        def _():
            dma(jax.lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

        dma(slot, i).wait()
        c = c_s[slot].astype(jnp.int32)                # [bkh, bn]
        w_even = dec(c & 0xF)
        w_odd = dec(c >> 4)
        s = _decode_ue4m3_f32(
            s_ref[pl.ds(i * (bk // 16), bk // 16), :].astype(jnp.int32))
        se = s[:, None, :]                             # [bk//16, 1, bn]
        w_even = (w_even.reshape(bkh // 8, 8, bn) * se).reshape(bkh, bn)
        w_odd = (w_odd.reshape(bkh // 8, 8, bn) * se).reshape(bkh, bn)
        w = jnp.concatenate([w_even, w_odd],
                            axis=0).astype(jnp.bfloat16)   # [bk, bn]
        xx = jnp.concatenate(
            [x_ref[:, pl.ds(i * bkh, bkh)],
             x_ref[:, pl.ds(kqh + i * bkh, bkh)]], axis=1)  # [bm, bk]
        acc_ref[:] += jnp.dot(xx, w, preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_k, loop, 0)
    y = acc_ref[:] * gs_ref[:] * gw_ref[:]
    if has_bias:
        y = y + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(out_dtype)


def _dma_blocks_w8(kq: int, n: int, nbuf: int):
    """(bk, bn) for the manual-DMA kernel. On-chip sweep at M=32
    N=K=4096 (results/r3, same-process bench_op):
      bk=512 bn=1024 -> 18.2 us (119% of the 819 GB/s nominal floor)
      bk=512 bn=4096 -> 21.2   bk=512 bn=2048 -> 23.4
      bk=1024 bn=2048 -> 25.2  bk=2048 bn=512 -> 40.7
    Small k-stripes with a ~0.5 MB slot win decisively (the DMA
    engine sustains >nominal bandwidth on shallow-wide stripes); big
    bk starves the first matmul and thrashes VMEM. So: bk = 512 when
    it divides kq (fallback best_k_block), bn = the 128-multiple
    divisor of n closest to 1024."""
    if kq % 512 == 0:
        bk = 512
    else:
        from ..quant.packing import best_k_block
        bk = best_k_block(kq) or _pick_block(kq, (256, 128, 64))
    cap = 8 * 2 ** 20 // (nbuf + 2)  # i8 slots + bf16 decode transient
    bn, best = 0, None
    d = 128
    while d <= n:
        if n % d == 0 and d * bk <= cap:
            score = abs(d - 1024)
            if best is None or score < best:
                bn, best = d, score
        d += 128
    if bn == 0:
        bn = _pick_block(n, (512, 256, 128))
    return bk, bn


@functools.partial(jax.jit, static_argnames=(
    "fmt", "out_dtype", "bm", "bn", "bk", "has_bias", "interpret"))
def _gemm_dma_call(x, codes, scales_u8, gs, gw, bias, *, fmt,
                   out_dtype, bm, bn, bk, has_bias, interpret):
    kq = codes.shape[0] * (2 if fmt == "w4" else 1)
    n = codes.shape[1]
    n_k = kq // bk
    kern_fn = _gemm_w4_dma_kernel if fmt == "w4" else _gemm_w8_dma_kernel
    kernel = functools.partial(
        kern_fn, bk=bk, nbuf=_DMA_NBUF, n_k=n_k,
        out_dtype=out_dtype, has_bias=has_bias)
    bias2 = (bias.reshape(1, n).astype(jnp.float32) if has_bias
             else jnp.zeros((1, 1), jnp.float32))
    slot_k = bk // 2 if fmt == "w4" else bk
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bm, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kq), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kq // 16, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bn) if has_bias else (1, 1),
                (lambda j: (0, j)) if has_bias else (lambda j: (0, 0)),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), out_dtype),
        scratch_shapes=[
            # slot dtype matches the codes (w8 int8, w4 uint8 nibbles)
            pltpu.VMEM((_DMA_NBUF, slot_k, bn), codes.dtype),
            pltpu.SemaphoreType.DMA((_DMA_NBUF,)),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * kq,
            bytes_accessed=codes.size + scales_u8.size + x.size * 2
            + bm * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(gs, gw, x, scales_u8, bias2, codes)


def _gemm_dma(xa, pw, scales_u8, gx, out_dtype):
    """Decode-shape GEMM through the manual-DMA kernel (same contract
    as gemm_dequant's fused path). w4 activations must arrive in
    NATURAL k order (split_even_odd happens here, mirroring
    gemm_dequant's fused w4 branch)."""
    fmt = "w8" if isinstance(pw, PackedWeightI8) else "w4"
    m = xa.shape[0]
    kq, n = pw.kq, pw.n
    if fmt == "w4":
        xa = split_even_odd(xa)
    bm = max(16, _round_up(m, 16))
    bk, bn = _dma_blocks_w8(kq, n, _DMA_NBUF)
    if fmt == "w4" and bk % 256:
        from ..quant.packing import best_k_block
        bk = best_k_block(kq, align=256) or kq
    x = xa.astype(jnp.bfloat16)
    if bm != m:
        x = jnp.pad(x, ((0, bm - m), (0, 0)))
    gx = jnp.asarray(gx, jnp.float32)
    gs = jnp.broadcast_to(gx.reshape(-1, 1), (m, 1)).astype(jnp.float32)
    if bm != m:
        gs = jnp.pad(gs, ((0, bm - m), (0, 0)))
    gw = jnp.broadcast_to(
        pw.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    y = _gemm_dma_call(x, pw.codes, scales_u8, gs, gw,
                       pw.bias if pw.bias is not None else None,
                       fmt=fmt, out_dtype=jnp.dtype(out_dtype).name,
                       bm=bm, bn=bn, bk=bk,
                       has_bias=pw.bias is not None,
                       interpret=_use_interpret())
    return y[:m] if bm != m else y


# ---------------------------------------------------------------------------
# Host-side call
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return dim


def _best_n_block(n: int, bk: int, cap_bytes: int) -> int:
    """Largest divisor of n that is a multiple of 128 with a
    bk x bn i8 code block under cap_bytes."""
    best = 0
    d = 128
    while d <= n:
        if n % d == 0 and d * bk <= cap_bytes:
            best = d
        d += 128
    return best


# Code-block byte budget: ~5 MB blocks double-buffer comfortably in
# the ~16 MB of VMEM alongside scales/x/acc.
_BLOCK_CAP = 5 * 2 ** 20


def _decode_blocks_w8(m: int, kq: int, n: int):
    """Decode-shape (small M) block heuristic for the w8 kernel,
    measured on v5e (benchmarks/gemm_lab.py):
      - full-N stripes stream codes contiguously; cap bn so the block
        stays under ~5 MB
      - bk=512 wins at moderate N (pipeline warmup is one block);
        bk=1024 wins for very wide N (fewer k-steps per j-stripe)
    Measured: qkv 81% / o 77% / gateup 102% / down 87% of the 819 GB/s
    weight-stream floor (vs 70-80% for the round-1 square blocks)."""
    if n >= 16384 and kq % 1024 == 0:
        bk = 1024
    elif kq % 512 == 0:
        bk = 512
    else:
        from ..quant.packing import best_k_block
        bk = best_k_block(kq) or _pick_block(kq, (512, 256, 128, 64))
    # scoped-vmem budget includes the bm-dependent pieces: the f32
    # accumulator + double-buffered bf16 output scale with bn*bm (an
    # m=64 gateup stripe at the codes-only cap OOM'd scoped vmem by
    # 376K — round-4 autotune). Solve the whole block set <= ~12 MB.
    bm = min(_round_up(max(m, 1), 16), 512)
    cap = _BLOCK_CAP
    bn = _best_n_block(n, bk, cap)
    while bn and (2 * bk * bn            # i8 codes, double-buffered
                  + 2 * (bk // 16) * bn  # scale bytes
                  + 2 * bm * bk * 2      # bf16 x blocks
                  + bm * bn * 4          # f32 accumulator
                  + 2 * bm * bn * 2      # bf16 out, double-buffered
                  # 14 MB threshold = the 16 MB scoped limit minus
                  # the ~1 MB this estimate undercounts (measured:
                  # est 15.3 MB -> actual 16.37); m=32 gateup keeps
                  # its measured-optimal bn=9472 (est 12.8 MB)
                  ) > 14 * 2 ** 20:
        cap = cap // 2
        nb = _best_n_block(n, bk, cap)
        if nb == bn:
            break
        bn = nb
    if bn == 0:
        bn = _pick_block(n, (512, 256, 128))
    return bk, bn


def _fused_vmem_est(bm: int, bk: int, bn: int, fmt: str = "w8") -> int:
    """Scoped-VMEM estimate for one fused block set (see the budget
    comment in _decode_blocks_w8). w4 halves the code bytes but reads
    x as two (bm, bk//2) views (same x bytes)."""
    codes = (bk // 2 if fmt == "w4" else bk) * bn
    return (2 * codes + 2 * (bk // 16) * bn + 2 * bm * bk * 2
            + bm * bn * 4 + 2 * bm * bn * 2)


def fused_block_candidates(m: int, kq: int, n: int,
                           fmt: str = "w8") -> list:
    """Candidate (bk, bn) block shapes for the fused decode GEMM,
    heuristic pick first — the autotuner (kernels/autotune.py) times
    each on-chip and persists the winner. Reference analog: the
    CUTLASS tile-config candidate list in nvfp4.cu, selected at
    template-instantiation time; here selection is a measured table
    because the per-grid-step fixed cost (~0.4 us on v5e) is runtime
    behaviour Mosaic does not model."""
    bm = min(_round_up(max(m, 1), 16), 512)
    if fmt == "w4":
        # w4 x blocks are (bm, bk//2): bk must be 256-aligned for the
        # Mosaic last-dim constraint (see gemm_dequant's w4 branch)
        from ..quant.packing import best_k_block
        bk0 = best_k_block(kq, align=256) or kq
        cands = [(bk0, _best_n_block(n, bk0 // 2, _BLOCK_CAP)
                  or _pick_block(n, (512, 256, 128)))]
    else:
        cands = [_decode_blocks_w8(m, kq, n)]
    for bk in (512, 1024, 2048):
        if kq % bk or (fmt == "w4" and bk % 256):
            continue
        for cap in (_BLOCK_CAP, 2 * _BLOCK_CAP, _BLOCK_CAP // 2):
            bn = _best_n_block(n, bk // 2 if fmt == "w4" else bk, cap)
            while bn and _fused_vmem_est(bm, bk, bn, fmt) > 14 * 2 ** 20:
                nb = _best_n_block(n, bk, max(bk * bn // 2, bk * 128))
                if nb == bn:
                    bn = 0
                else:
                    bn = nb
            if bn and (bk, bn) not in cands:
                cands.append((bk, bn))
    return cands


def split_even_odd(xa: jax.Array) -> jax.Array:
    """[M, Kq] -> [M, Kq] with even-k columns first, then odd-k
    (the w4 kernel's stacked activation layout)."""
    return jnp.concatenate([xa[:, 0::2], xa[:, 1::2]], axis=1)


# ---------------------------------------------------------------------------
# Large-M XLA path (prefill shapes): dequant once + native matmul
# ---------------------------------------------------------------------------

def _dequant_w8_kernel(codes_ref, scales_ref, o_ref):
    bk, bn = codes_ref.shape
    w = codes_ref[:].astype(jnp.float32)
    s = _decode_ue4m3_f32(scales_ref[:].astype(jnp.int32)) * 0.5
    o_ref[:] = (w.reshape(bk // 16, 16, bn)
                * s[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)


def _dequant_w4_kernel(codes_ref, scales_ref, o_ref):
    c = codes_ref[:].astype(jnp.int32)
    bk2, bn = c.shape

    def dec(nib):
        mag = nib & 0x7
        bits = ((mag << 22) | ((nib & 0x8) << 28)) + 0x3F000000
        f = jax.lax.bitcast_convert_type(bits, jnp.float32)
        return jnp.where(mag == 1, 0.0, f)

    s = _decode_ue4m3_f32(scales_ref[:].astype(jnp.int32))
    se = s[:, None, :]
    o_ref[0] = (dec(c & 0xF).reshape(bk2 // 8, 8, bn)
                * se).reshape(bk2, bn).astype(jnp.bfloat16)
    o_ref[1] = (dec(c >> 4).reshape(bk2 // 8, 8, bn)
                * se).reshape(bk2, bn).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("fmt", "interpret"))
def _dequant_call(codes, scales_u8, *, fmt, interpret):
    """One-pass packed->bf16 weight decode as a Pallas kernel: XLA's
    own lowering of the decode expressions compiles to a windowed
    fusion ~25x slower than HBM bandwidth (trace r3), so the matmul
    prefill path materializes the weight through this kernel instead.
    w4 output is [2, Kq/2, N] (axis 0 = even/odd ks — reshape(Kq, N)
    IS the split-half stacked layout split_even_odd pairs with)."""
    # block budget: the bf16 output (2x) and f32 decode transients
    # (4x) ride alongside the i8 codes in VMEM, so cap the CODE block
    # well under the GEMM kernel's 5 MB
    deq_cap = 2 ** 20
    if fmt == "w8":
        kq, n = codes.shape
        bk = _pick_block(kq, (512, 256, 128, 64, 16))
        bn = _best_n_block(n, bk, deq_cap) or _pick_block(
            n, (512, 256, 128))
        return pl.pallas_call(
            _dequant_w8_kernel,
            grid=(kq // bk, n // bn),
            in_specs=[
                pl.BlockSpec((bk, bn), lambda k, j: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 16, bn), lambda k, j: (k, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bk, bn), lambda k, j: (k, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((kq, n), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(codes, scales_u8)
    k2, n = codes.shape
    bk2 = _pick_block(k2, (256, 128, 64, 32, 8))
    bn = _best_n_block(n, 2 * bk2, deq_cap) or _pick_block(
        n, (512, 256, 128))
    return pl.pallas_call(
        _dequant_w4_kernel,
        grid=(k2 // bk2, n // bn),
        in_specs=[
            pl.BlockSpec((bk2, bn), lambda k, j: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2 // 8, bn), lambda k, j: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bk2, bn), lambda k, j: (0, k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, k2, n), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(codes, scales_u8)


def _copy_kernel(i_ref, o_ref):
    o_ref[:] = i_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pin_rowmajor(x, *, interpret):
    """Identity Pallas pass that PINS x to row-major layout. The XLA
    lowering of the per-row activation quantize emits xa column-major
    ({0,1}), which pushes the downstream matmul onto the slow
    transposed-lhs emitter (AllInputFeatureInSublanes..., ~2x —
    round-3 trace); a Pallas operand constraint makes layout
    assignment produce {1,0} instead."""
    m, k = x.shape
    bm = max(8, min(512, (1 << 21) // k // 8 * 8))
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _copy_kernel,
        grid=(m_pad // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x)
    return out[:m] if m_pad != m else out


def _gemm_xla(xa, pw, scales_u8, gs, gw, out_dtype):
    """y = (xa @ dequant(pw)) * gs * gw + bias via a one-pass Pallas
    weight decode + XLA's native matmul (MXU-bound shapes; VERDICT r2
    #1 — reference analog: the prefill path of modeling_arc.py:436
    over nvfp4.cu:35). Numerics identical to the fused kernel (same
    decode expressions, same bf16 weight grid, f32 accumulation)."""
    stacked = not isinstance(pw, PackedWeightI8)
    w = _dequant_call(pw.codes, scales_u8,
                      fmt="w4" if stacked else "w8",
                      interpret=_use_interpret())
    if stacked:
        w = w.reshape(pw.kq, pw.n)
    x = (split_even_odd(xa) if stacked else xa).astype(jnp.bfloat16)
    x = _pin_rowmajor(x, interpret=_use_interpret())
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    y = acc * gs * gw
    if pw.bias is not None:
        y = y + pw.bias.reshape(1, -1).astype(jnp.float32)
    return y.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "fmt", "out_dtype", "bm", "bn", "bk", "has_bias", "interpret"))
def _gemm_call(x, codes, scales_u8, gs, gw, bias, *, fmt, out_dtype,
               bm, bn, bk, has_bias, interpret):
    m = x.shape[0]
    n = codes.shape[1]
    kq = codes.shape[0] * (2 if fmt == "w4" else 1)
    n_k = kq // bk
    grid = (m // bm, n // bn, n_k)
    gs2 = gs.astype(jnp.float32)                    # [m, 1] per-row
    gs_spec = pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                           memory_space=pltpu.VMEM)
    gw2 = gw.astype(jnp.float32)                    # [1, n] per-channel
    gw_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                           memory_space=pltpu.VMEM)
    bias2 = (bias.reshape(1, n).astype(jnp.float32) if has_bias
             else jnp.zeros((1, 1), jnp.float32))
    bias_spec = pl.BlockSpec(
        (1, bn) if has_bias else (1, 1),
        (lambda i, j, k: (0, j)) if has_bias else (lambda i, j, k: (0, 0)),
        memory_space=pltpu.VMEM)
    common = dict(
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kq,
            bytes_accessed=codes.size + scales_u8.size + x.size * 2
            + m * n * 2,
            transcendentals=0),
        interpret=interpret,
    )
    if fmt == "w4":
        kernel = functools.partial(_gemm_w4_kernel, n_k=n_k,
                                   out_dtype=out_dtype, has_bias=has_bias)
        k2 = kq // 2
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                gs_spec,
                gw_spec,
                pl.BlockSpec((bm, bk // 2), lambda i, j, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, bk // 2),
                             lambda i, j, k, k2=k2, bk=bk:
                             (i, k2 // (bk // 2) + k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 16, bn), lambda i, j, k: (k, j),
                             memory_space=pltpu.VMEM),
                bias_spec,
            ],
            **common,
        )(gs2, gw2, x, x, codes, scales_u8, bias2)
    kernel = functools.partial(_gemm_w8_kernel, n_k=n_k,
                               out_dtype=out_dtype, has_bias=has_bias)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            gs_spec,
            gw_spec,
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            bias_spec,
        ],
        **common,
    )(gs2, gw2, x, codes, scales_u8, bias2)


def gemm_dequant(xa: jax.Array,
                 pw: Union[PackedWeight, PackedWeightI8],
                 gx: jax.Array,
                 out_dtype=jnp.bfloat16,
                 bm: int = 0, bn: int = 0, bk: int = 0) -> jax.Array:
    """y[M, N] = (xa @ dequant(pw).T) * (gx * pw.global_scale) + bias.

    Args:
      xa: [M, Kq] quantize-dequantized activations in scaled units
          (bf16/f32), Kq == pw.kq (caller pads; see quantize_x_arc),
          in NATURAL k order (the w4 even/odd split happens here).
      pw: packed weight (PackedWeight = w4, PackedWeightI8 = w8).
      gx: activation global scale (f32 scalar).
    """
    fmt = "w8" if isinstance(pw, PackedWeightI8) else "w4"
    m = xa.shape[0]
    kq, n = pw.kq, pw.n
    xm = _xla_dispatch_m()
    # Shape gate (round-3 on-chip prefill profile, M=4096): the XLA
    # path pays one weight-decode pass (∝ kq·n) + the x row-major pin
    # (∝ m·kq); the fused kernel pays ~10% MXU inefficiency (∝ flops).
    # For tall-K/narrow-N weights (down: 18944×3584) the fixed passes
    # lose: fused 3.92 ms vs XLA 4.62 ms; every n >= kq shape prefers
    # XLA (qkv 0.805 vs 0.875, o 0.623 vs 0.726, gateup 6.56 vs 7.10).
    if bm == 0 and bn == 0 and bk == 0 and xm and m >= xm and n >= kq:
        scales_u8 = (pw.scales if pw.scales.dtype == jnp.uint8 else
                     jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
        gx = jnp.asarray(gx, jnp.float32)
        gs = jnp.broadcast_to(gx.reshape(-1, 1), (m, 1))
        gw = jnp.broadcast_to(
            pw.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
        return _gemm_xla(xa, pw, scales_u8, gs, gw, out_dtype)
    dm = _dma_dispatch_m()
    # Path selection: prefer the MEASURED per-shape table (autotune.py
    # — populated at engine build / by benchmarks.gemm_autotune; the
    # round-3 `kq == n` heuristic mispredicted at 4096² and survives
    # only as the fallback for unmeasured shapes, where on-chip data
    # showed square weights favoring the DMA stream: o-proj 3584²
    # 15.3 vs 21.8 us but qkv 66% / gateup 71% / down 83% of floor).
    if dm and m <= dm and bm == 0 and bn == 0 and bk == 0:
        from .autotune import lookup
        choice = lookup(fmt, m, kq, n)
        # w4 has no measured-win heuristic yet: DMA only when the
        # table says so (the w8 square-weight fallback is r3 on-chip
        # data and does not transfer to the nibble-decode ALU mix)
        fallback = (kq == n) if fmt == "w8" else False
        use_dma = (choice == "dma") if choice is not None else fallback
    else:
        use_dma = False
    if use_dma:
        scales_u8 = (pw.scales if pw.scales.dtype == jnp.uint8 else
                     jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
        return _gemm_dma(xa, pw, scales_u8, gx, out_dtype)
    if fmt == "w4":
        xa = split_even_odd(xa)
    x = xa.astype(jnp.bfloat16)
    if m <= 64 and bk == 0 and bn == 0:
        from .autotune import lookup_blocks
        blk = lookup_blocks(fmt, m, kq, n)
        if blk is not None:
            bk, bn = blk
        elif fmt == "w8":
            bk, bn = _decode_blocks_w8(m, kq, n)
    if bk == 0:
        from ..quant.packing import best_k_block
        if fmt == "w4":
            # the w4 x blocks are (bm, bk//2), so Mosaic's last-dim
            # constraint needs bk % 256 == 0 (a 128-only-aligned bk
            # like 1408 at kq=5632 — qwen1.5-moe gateup — gives a
            # 704-wide x block and fails to lower)
            bk = best_k_block(kq, align=256) or kq  # kq: dim-equal
            # block is always legal (pad_kq makes kq a multiple of
            # 512, so a 256-aligned divisor always exists in practice)
        else:
            bk = best_k_block(kq) or _pick_block(kq, (512, 256, 128, 64))
    bn = bn or _pick_block(n, (512, 256, 128))
    if bm == 0:
        bm = min(_round_up(m, 16), 512)
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    # packed scales are stored as ue4m3 BYTES already (an on-the-fly
    # bitcast materializes a full copy each call — 1.6 ms/step across
    # a 28-layer decode); legacy f8-typed packs still bitcast here
    scales_u8 = (pw.scales if pw.scales.dtype == jnp.uint8 else
                 jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
    # epilogue scales: per-row activation column [m_pad, 1] × weight
    # global scale row [1, n] (per-tensor scalar broadcast, or
    # per-output-channel vector)
    gx = jnp.asarray(gx, jnp.float32)
    gs = jnp.broadcast_to(gx.reshape(-1, 1), (m, 1)).astype(jnp.float32)
    if m_pad != m:
        gs = jnp.pad(gs, ((0, m_pad - m), (0, 0)))
    gwv = pw.global_scale.astype(jnp.float32)
    gw = jnp.broadcast_to(gwv.reshape(1, -1), (1, n))
    y = _gemm_call(x, pw.codes, scales_u8, gs, gw,
                   pw.bias if pw.bias is not None else None,
                   fmt=fmt, out_dtype=jnp.dtype(out_dtype).name,
                   bm=bm, bn=bn, bk=bk,
                   has_bias=pw.bias is not None,
                   interpret=_use_interpret())
    return y[:m] if m_pad != m else y


def dequantize_weight_kernel(pw: Union[PackedWeight, PackedWeightI8],
                             dtype=jnp.bfloat16) -> jax.Array:
    """Decode a full packed weight to [Kq, N] (debug/testing path using
    the same bit-arithmetic decoders as the kernels)."""
    s_u8 = (pw.scales if pw.scales.dtype == jnp.uint8 else
            jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
    s = _decode_ue4m3_f32(s_u8.astype(jnp.int32))
    if isinstance(pw, PackedWeightI8):
        w = pw.codes.astype(jnp.float32) * jnp.repeat(s * 0.5, 16, axis=0)
        return w.astype(dtype)
    from ..quant.packing import e2m1x_to_e2m1
    codes = pw.codes.astype(jnp.int32)
    w_even = _decode_e2m1_f32(e2m1x_to_e2m1(codes & 0xF))
    w_odd = _decode_e2m1_f32(e2m1x_to_e2m1(codes >> 4))
    s = jnp.repeat(s, 8, axis=0)
    kq2, n = codes.shape
    out = jnp.zeros((2 * kq2, n), jnp.float32)
    out = out.at[0::2].set(w_even * s)
    out = out.at[1::2].set(w_odd * s)
    return out.astype(dtype)


def dequant_weight(pw: Union[PackedWeight, PackedWeightI8],
                   fold_global: bool = False) -> jax.Array:
    """Fast one-pass packed -> bf16 decode via the Pallas dequant
    kernel (the prefill M-dispatch primitive, exposed for weight
    stacks that feed einsums — e.g. MoE dispatch mode).

    Returns [Kq, N] in SCALED units unless fold_global, in which case
    the weight global scale (tensor or per-channel) is folded in.
    NOTE for w4: rows come back in the SPLIT-HALF k order (even ks
    then odd ks) — contract only against split_even_odd'ed
    activations."""
    scales_u8 = (pw.scales if pw.scales.dtype == jnp.uint8 else
                 jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
    w4 = not isinstance(pw, PackedWeightI8)
    if pw.codes.ndim == 3:                  # stacked experts [E, ., N]
        w = jax.vmap(lambda c, s: _dequant_call(
            c, s, fmt="w4" if w4 else "w8",
            interpret=_use_interpret()))(pw.codes, scales_u8)
        if w4:
            w = w.reshape(w.shape[0], -1, w.shape[-1])
        if fold_global:
            gw = pw.global_scale.astype(jnp.float32)
            gw = gw.reshape(w.shape[0], 1, -1)
            w = (w.astype(jnp.float32) * gw).astype(jnp.bfloat16)
        return w
    w = _dequant_call(pw.codes, scales_u8,
                      fmt="w4" if w4 else "w8",
                      interpret=_use_interpret())
    if w4:
        w = w.reshape(pw.kq, pw.n)
    if fold_global:
        gw = pw.global_scale.astype(jnp.float32).reshape(1, -1)
        w = (w.astype(jnp.float32) * gw).astype(jnp.bfloat16)
    return w


def gemm_dequant_batched(xa: jax.Array,
                         pw: Union[PackedWeight, PackedWeightI8],
                         gx: jax.Array,
                         out_dtype=jnp.bfloat16) -> jax.Array:
    """Batched fused dequant-GEMM over a leading expert axis:
    y[E, M, N] = (xa[e] @ dequant(pw[e]).T) * gx[e] * gws[e].

    Args:
      xa: [E, M, Kq] activations in scaled units, NATURAL k order.
      pw: stacked packed weight — codes/scales/global_scale carry a
          leading E axis (see moe.quantize_moe_params_packed).
      gx: activation global scale — f32 scalar, [E], or [E, M, 1].

    Implemented as jax.vmap over the fused kernel (Pallas lifts the
    batch to a leading 'parallel' grid dimension, so this is ONE
    kernel launch streaming each expert's weights once — the
    MoE-decode analog of the dense fused GEMM; per-expert HBM traffic
    is identical to E separate calls without E kernel fixed costs).
    The XLA/DMA M-dispatch is deliberately skipped: batched callers
    are decode-shaped (see moe.py; dispatch-mode prefill dequantizes
    once via dequant_weight + einsum instead)."""
    fmt = "w8" if isinstance(pw, PackedWeightI8) else "w4"
    e, m, _ = xa.shape
    kq = pw.codes.shape[1] * (2 if fmt == "w4" else 1)
    n = pw.codes.shape[2]
    scales_u8 = (pw.scales if pw.scales.dtype == jnp.uint8 else
                 jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
    gx = jnp.asarray(gx, jnp.float32)
    if gx.ndim == 0:
        gxa = jnp.broadcast_to(gx.reshape(1, 1, 1), (e, m, 1))
    elif gx.ndim == 1:
        gxa = jnp.broadcast_to(gx[:, None, None], (e, m, 1))
    else:
        gxa = gx.reshape(e, m, 1)
    gwv = pw.global_scale.astype(jnp.float32)
    gws = (jnp.broadcast_to(gwv.reshape(e, 1), (e, n))
           if gwv.ndim <= 1 or gwv.shape[-1] == 1
           else gwv.reshape(e, n))
    if fmt == "w8" and m <= 64:
        bk, bn = _decode_blocks_w8(m, kq, n)
    else:
        from ..quant.packing import best_k_block
        if fmt == "w4":
            # x blocks are (bm, bk//2): bk % 256 (see gemm_dequant)
            bk = best_k_block(kq, align=256) or kq
        else:
            bk = best_k_block(kq) or _pick_block(kq, (512, 256, 128, 64))
        bn = _pick_block(n, (512, 256, 128))
    bm = min(_round_up(m, 16), 512)
    m_pad = _round_up(m, bm)

    def one(xe, codes, su8, gse, gwe):
        if fmt == "w4":
            xe = split_even_odd(xe)
        xe = xe.astype(jnp.bfloat16)
        gse = gse.astype(jnp.float32)
        if m_pad != m:
            xe = jnp.pad(xe, ((0, m_pad - m), (0, 0)))
            gse = jnp.pad(gse, ((0, m_pad - m), (0, 0)))
        y = _gemm_call(xe, codes, su8, gse, gwe.reshape(1, n), None,
                       fmt=fmt, out_dtype=jnp.dtype(out_dtype).name,
                       bm=bm, bn=bn, bk=bk, has_bias=False,
                       interpret=_use_interpret())
        return y[:m] if m_pad != m else y

    return jax.vmap(one)(xa, pw.codes, scales_u8, gxa, gws)
