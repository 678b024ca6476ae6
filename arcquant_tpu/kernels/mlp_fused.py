"""Decode-shape fused MLP megakernel (w8): gateup GEMM -> silu-mul ->
ARC act-quantize -> down GEMM in ONE Pallas program.

Reference analog: the decode MLP in modeling_arc.py launches three
CUDA kernels (nvfp4.cu GEMM, reorder.cu re-quantize, nvfp4.cu GEMM)
with the silu product round-tripping HBM. On TPU at decode shapes the
whole intermediate state is tiny (gu at bs<=16 is <1.3 MB) while the
weights dominate (144 MB + 72 MB streams for qwen2.5-7b), so the
TPU-native shape is ONE kernel that manually DMA-streams both weight
code arrays (the _gemm_w8_dma_kernel pipeline) and keeps gu / the
re-quantized activation entirely in VMEM: two kernel launches, the
inter-kernel XLA glue, and three HBM activation round-trips disappear.

Numerics contract (pinned by tests/test_mlp_fused.py): bit-exact vs
the engine's de-fused chain at the same per-weight k-block split
(_engine_bk — table first, heuristic fallback) —
  gemm_dequant(bk, out bf16) -> silu(g_f32)*u_f32 -> .astype(bf16)
  -> quantize_x_arc(per_row) -> gemm_dequant(bk)
(the decode-shape production path since the round-4/5 silu-gu defuse
promotion). Same decode expressions, same f32 k-block accumulation
order, same bf16 product round, same butterfly group-scale chain.

Scope: w8 weights, per-row act scales, and a select-free down_in
(ARC-augmented down_in needs a dynamic column gather of gu for the
residual — a VPU gather, which round-1 profiling showed dominating
entire decode steps; those configs keep the three-op path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import numerics as N
from ..quant.packing import PackedWeightI8
from .gemm import _decode_ue4m3_f32, _round_up, _use_interpret
from .quantize import _actq_pallas_min_m, _group_qdq_rows

_MLP_FUSED_M_ENV = "ARC_MLP_FUSED_M"
# Promoted after the round-5 on-chip A/B (results/r5/mlp_lab.log:
# bit-exact at M=4/16, 305 vs 376 us = 1.23x standalone; e2e 28L
# decode 12.26 -> 11.99 ms/step, 14L 6.51 -> 6.36 — e2e_*_mega.log).
_MLP_FUSED_M_DEFAULT = 16
_NBUF = 3


@functools.lru_cache()
def mlp_fused_dispatch_m() -> int:
    """Max M routed through the megakernel (0 = off)."""
    return int(os.environ.get(_MLP_FUSED_M_ENV,
                              str(_MLP_FUSED_M_DEFAULT)))


def _decode_w(c_slot, s_slot, bk, bn):
    """w8 decode of one [bk, bn] stripe (same expressions as
    _gemm_w8_kernel: i8 codes × ue4m3 group scale / 2)."""
    w = c_slot.astype(jnp.float32)
    s = _decode_ue4m3_f32(s_slot.astype(jnp.int32)) * 0.5
    return (w.reshape(bk // 16, 16, bn) * s[:, None, :]).reshape(
        bk, bn).astype(jnp.bfloat16)


def _stream_gemm(codes_hbm, s_hbm, c_s, s_s, sems, sem_base, acc_ref,
                 x_block, bk, bn, nk, nj, nbuf, epilogue):
    """Multi-buffered streamed GEMM phase: for stripe t = j*nk + k,
    DMA codes+scales [bk, bn] from HBM, decode, accumulate
    x_block(k) @ w into acc_ref[:, :bn]; at k == nk-1 call
    epilogue(j, acc). The _gemm_w8_dma_kernel pipeline, phase-ified
    so the full and partial MLP megakernels share it. bk matches the
    k-split gemm_dequant would use for the same weight (the
    bit-exactness contract is per-k-block f32 accumulation order)."""
    bm = acc_ref.shape[0]

    def dma(slot, t):
        j, k = t // nk, jax.lax.rem(t, nk)
        return (pltpu.make_async_copy(
            codes_hbm.at[pl.ds(k * bk, bk), pl.ds(j * bn, bn)],
            c_s.at[slot], sems.at[sem_base, slot]),
            pltpu.make_async_copy(
            s_hbm.at[pl.ds(k * (bk // 16), bk // 16),
                     pl.ds(j * bn, bn)],
            s_s.at[slot], sems.at[sem_base + 1, slot]))

    total = nj * nk
    for i in range(min(nbuf - 1, total)):
        for c in dma(i, i):
            c.start()

    def loop(t, _):
        slot = jax.lax.rem(t, nbuf)
        j, k = t // nk, jax.lax.rem(t, nk)

        @pl.when(t + nbuf - 1 < total)
        def _():
            for c in dma(jax.lax.rem(t + nbuf - 1, nbuf),
                         t + nbuf - 1):
                c.start()

        for c in dma(slot, t):
            c.wait()

        @pl.when(k == 0)
        def _():
            acc_ref[:, :bn] = jnp.zeros((bm, bn), jnp.float32)

        w = _decode_w(c_s[slot], s_s[slot], bk, bn)
        acc_ref[:, :bn] += jnp.dot(x_block(k), w,
                                   preferred_element_type=jnp.float32)

        @pl.when(k == nk - 1)
        def _():
            epilogue(j, acc_ref[:, :bn])
        return 0

    jax.lax.fori_loop(0, total, loop, 0)


def _silu_actq_phase(gu_ref, gx2_ref, xa2_s, f, kq2):
    """Phase C: silu(gate)*up -> per-row ARC quantize, all in VMEM.
    Identical chain to the de-fused engine path: f32 product, product
    round through the engine activation dtype, f32 quantize math
    (quantize_x_arc). xa2 lands in a REF: the down phase slices it
    with pl.ds (Mosaic has no lowering for dynamic_slice on a VALUE),
    and the kq2 zero pad is written once here."""
    bm = gu_ref.shape[0]
    gate = gu_ref[:, :f].astype(jnp.float32)
    up = gu_ref[:, f:].astype(jnp.float32)
    xf = (jax.nn.silu(gate) * up).astype(gu_ref.dtype).astype(
        jnp.float32)
    gx2 = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        * jnp.float32(N.INV_NVFP4_GLOBAL_DIV), jnp.float32(1e-12))
    xa2_s[:, :f] = _group_qdq_rows(xf / gx2).astype(jnp.bfloat16)
    if kq2 > f:
        xa2_s[:, f:] = jnp.zeros((bm, kq2 - f), jnp.bfloat16)
    gx2_ref[:] = gx2
    return gx2


def _norm_actq_phase(x2_ref, normw_ref, xa1_s, eps, d, kq1):
    """Phase A: rmsnorm + per-row ARC quantize of the residual stream
    into VMEM (same expressions, block shape, and rounding chain as
    quantize._actq_kernel's rmsnorm mode, which the engine's external
    rmsnorm_quantize_x call lowers to). Returns gx1 [bm, 1] f32."""
    bm = x2_ref.shape[0]
    xf = x2_ref[:].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    nm = (xf * jax.lax.rsqrt(var + eps)).astype(x2_ref.dtype)
    xf = (nm * normw_ref[:]).astype(jnp.float32)
    gx1 = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        * jnp.float32(N.INV_NVFP4_GLOBAL_DIV), jnp.float32(1e-12))
    xa1_s[:, :d] = _group_qdq_rows(xf / gx1).astype(jnp.bfloat16)
    if kq1 > d:
        xa1_s[:, d:] = jnp.zeros((bm, kq1 - d), jnp.bfloat16)
    return gx1


def _mlp_w8_kernel(gs1_ref, gw1_ref, gw2_ref, b1_ref, b2_ref, xa1_ref,
                   normw_ref,
                   codes1_hbm, s1_hbm, codes2_hbm, s2_hbm,
                   out_ref, gu_ref, gx2_ref,
                   c1_s, s1_s, c2_s, s2_s, xa1_s, xa2_s, sems,
                   acc_ref, *,
                   f: int, d: int, kq1: int, kq2: int, bk1: int,
                   bk2: int, bn1: int,
                   bn2: int, nbuf: int, has_b1: bool, has_b2: bool,
                   norm_eps, out_dtype):
    nk1 = kq1 // bk1
    nj1 = gu_ref.shape[1] // bn1
    nk2 = kq2 // bk2
    nj2 = out_ref.shape[1] // bn2

    if norm_eps is not None:
        # phase A inside: xa1_ref carries the RAW residual stream x2
        # [bm, d]; gs1_ref is a dummy
        gs1 = _norm_actq_phase(xa1_ref, normw_ref, xa1_s, norm_eps,
                               d, kq1)
        x1 = lambda k: xa1_s[:, pl.ds(k * bk1, bk1)]    # noqa: E731
    else:
        gs1 = gs1_ref[:]
        x1 = lambda k: xa1_ref[:, pl.ds(k * bk1, bk1)]  # noqa: E731

    def epi1(j, acc):
        y = acc * gs1 * gw1_ref[:, pl.ds(j * bn1, bn1)]
        if has_b1:
            y = y + b1_ref[:, pl.ds(j * bn1, bn1)].astype(jnp.float32)
        gu_ref[:, pl.ds(j * bn1, bn1)] = y.astype(gu_ref.dtype)

    _stream_gemm(codes1_hbm, s1_hbm, c1_s, s1_s, sems, 0, acc_ref,
                 x1, bk1, bn1, nk1, nj1, nbuf, epi1)

    gx2 = _silu_actq_phase(gu_ref, gx2_ref, xa2_s, f, kq2)

    def epi2(j, acc):
        y = acc * gx2 * gw2_ref[:, pl.ds(j * bn2, bn2)]
        if has_b2:
            y = y + b2_ref[:, pl.ds(j * bn2, bn2)].astype(jnp.float32)
        out_ref[:, pl.ds(j * bn2, bn2)] = y.astype(out_dtype)

    _stream_gemm(codes2_hbm, s2_hbm, c2_s, s2_s, sems, 2, acc_ref,
                 lambda k: xa2_s[:, pl.ds(k * bk2, bk2)],
                 bk2, bn2, nk2, nj2, nbuf, epi2)


def _gu_actq_kernel(gs1_ref, gw1_ref, b1_ref, xa1_ref,
                    codes1_hbm, s1_hbm,
                    xa2_ref, gu_ref, gx2_ref,
                    c1_s, s1_s, sems, acc_ref, *,
                    f: int, kq1: int, kq2: int, bk1: int, bn1: int,
                    nbuf: int, has_b1: bool):
    """Partial megakernel (phases B+C only): gateup GEMM + silu-mul +
    ARC quantize fused; the down GEMM stays a separate call. This is
    the ARC-compatible variant — with an augmented down_in the caller
    injects the residual into xa2 (quantize._arc_residual_into over
    the returned gu) before the down GEMM, which the full megakernel
    cannot express without a VPU gather."""
    nk1 = kq1 // bk1
    nj1 = gu_ref.shape[1] // bn1

    def epi1(j, acc):
        y = acc * gs1_ref[:] * gw1_ref[:, pl.ds(j * bn1, bn1)]
        if has_b1:
            y = y + b1_ref[:, pl.ds(j * bn1, bn1)].astype(jnp.float32)
        gu_ref[:, pl.ds(j * bn1, bn1)] = y.astype(gu_ref.dtype)

    _stream_gemm(codes1_hbm, s1_hbm, c1_s, s1_s, sems, 0, acc_ref,
                 lambda k: xa1_ref[:, pl.ds(k * bk1, bk1)],
                 bk1, bn1, nk1, nj1, nbuf, epi1)
    _silu_actq_phase(gu_ref, gx2_ref, xa2_ref, f, kq2)


def _pick_bn(n: int, target: int) -> int:
    """128-multiple divisor of n nearest `target` (r3 DMA sweep:
    shallow ~0.5 MB stripes sustain >nominal HBM BW)."""
    best, score = 0, None
    d = 128
    while d <= n:
        if n % d == 0:
            sc = abs(d - target)
            if score is None or sc < score:
                best, score = d, sc
        d += 128
    return best or n


@functools.partial(jax.jit, static_argnames=(
    "f", "d", "kq1", "kq2", "bk1", "bk2", "bn1", "bn2", "has_b1",
    "has_b2", "norm_eps", "out_dtype", "interpret"))
def _mlp_call(xa1, gs1, gw1, gw2, b1, b2, normw, codes1, s1, codes2,
              s2, *, f, d, kq1, kq2, bk1, bk2, bn1, bn2, has_b1,
              has_b2, norm_eps, out_dtype, interpret):
    bm = xa1.shape[0]
    n1, n2 = codes1.shape[1], codes2.shape[1]
    kernel = functools.partial(
        _mlp_w8_kernel, f=f, d=d, kq1=kq1, kq2=kq2, bk1=bk1, bk2=bk2,
        bn1=bn1, bn2=bn2,
        nbuf=_NBUF, has_b1=has_b1, has_b2=has_b2, norm_eps=norm_eps,
        out_dtype=out_dtype)
    vm = pltpu.VMEM
    xa1_w = xa1.shape[1]     # d (norm mode) or kq1
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n1) if has_b1 else (1, 1),
                         lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n2) if has_b2 else (1, 1),
                         lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, xa1_w), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, normw.shape[1]), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, n2), out_dtype),
            # gu materializes in the ENGINE's activation dtype: the
            # chain's gateup GEMM writes out_dtype and the silu
            # product chain rounds through it (bf16 engines round,
            # f32 engines don't) — hardcoding bf16 here diverged
            # f32 engines (caught by test_engine_decode_flag_parity)
            jax.ShapeDtypeStruct((bm, n1), out_dtype),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, bk1, bn1), jnp.int8),
            pltpu.VMEM((_NBUF, bk1 // 16, bn1), jnp.uint8),
            pltpu.VMEM((_NBUF, bk2, bn2), jnp.int8),
            pltpu.VMEM((_NBUF, bk2 // 16, bn2), jnp.uint8),
            pltpu.VMEM((bm, kq1), jnp.bfloat16),
            pltpu.VMEM((bm, kq2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((4, _NBUF)),
            pltpu.VMEM((bm, max(bn1, bn2)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * (n1 * kq1 + n2 * kq2),
            bytes_accessed=codes1.size + s1.size + codes2.size
            + s2.size + xa1.size * 2 + bm * n2 * 2,
            transcendentals=bm * f),
        interpret=interpret,
    )(gs1, gw1, gw2, b1, b2, xa1, normw, codes1, s1, codes2, s2)


@functools.partial(jax.jit, static_argnames=(
    "f", "kq1", "kq2", "bk1", "bn1", "has_b1", "out_dtype",
    "interpret"))
def _gu_actq_call(xa1, gs1, gw1, b1, codes1, s1, *, f, kq1, kq2, bk1,
                  bn1, has_b1, out_dtype, interpret):
    bm = xa1.shape[0]
    n1 = codes1.shape[1]
    kernel = functools.partial(
        _gu_actq_kernel, f=f, kq1=kq1, kq2=kq2, bk1=bk1, bn1=bn1,
        nbuf=_NBUF, has_b1=has_b1)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n1) if has_b1 else (1, 1),
                         lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, kq1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((bm, kq2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, kq2), jnp.bfloat16),
            # gu in the engine activation dtype (see _mlp_call note)
            jax.ShapeDtypeStruct((bm, n1), out_dtype),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, bk1, bn1), jnp.int8),
            pltpu.VMEM((_NBUF, bk1 // 16, bn1), jnp.uint8),
            pltpu.SemaphoreType.DMA((2, _NBUF)),
            pltpu.VMEM((bm, bn1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n1 * kq1,
            bytes_accessed=codes1.size + s1.size + xa1.size * 2
            + bm * kq2 * 2,
            transcendentals=bm * f),
        interpret=interpret,
    )(gs1, gw1, b1, xa1, codes1, s1)


def gateup_silu_quantize(xa1: jax.Array, gs1: jax.Array, pw_gu,
                         f: int, kq2: int, out_dtype=jnp.bfloat16):
    """Partial megakernel: (xa2 [M, kq2], gu [M, 2F], gx2 [M, 1]) =
    actq(silu-mul(gateup(xa1))) in one launch; the caller runs the
    down GEMM (and, for ARC-augmented down_in, injects the residual
    into xa2 from gu first — quantize._arc_residual_into)."""
    m = xa1.shape[0]
    kq1, n1 = pw_gu.kq, pw_gu.n
    bm = max(8, _round_up(m, 8))
    x = xa1.astype(jnp.bfloat16)
    gs = jnp.broadcast_to(jnp.asarray(gs1, jnp.float32).reshape(-1, 1),
                          (m, 1))
    if bm != m:
        x = jnp.pad(x, ((0, bm - m), (0, 0)))
        gs = jnp.pad(gs, ((0, bm - m), (0, 0)))
    gw1 = jnp.broadcast_to(
        pw_gu.global_scale.astype(jnp.float32).reshape(1, -1), (1, n1))
    b1 = (pw_gu.bias.reshape(1, n1).astype(jnp.float32)
          if pw_gu.bias is not None else jnp.zeros((1, 1), jnp.float32))
    s1 = (pw_gu.scales if pw_gu.scales.dtype == jnp.uint8 else
          jax.lax.bitcast_convert_type(pw_gu.scales, jnp.uint8))
    xa2, gu, gx2 = _gu_actq_call(
        x, gs, gw1, b1, pw_gu.codes, s1, f=f, kq1=kq1, kq2=kq2,
        bk1=_engine_bk(pw_gu, m),
        bn1=_pick_bn(n1, 1024), has_b1=pw_gu.bias is not None,
        out_dtype=jnp.dtype(out_dtype).name, interpret=_use_interpret())
    if bm != m:
        xa2, gu, gx2 = xa2[:m], gu[:m], gx2[:m]
    return xa2, gu, gx2


_OK_BKS = (512, 1024, 2048)


def gu_actq_ok(pw_gu, m: int, f: int, kq2: int, per_row: bool) -> bool:
    """Dispatch gate for the PARTIAL megakernel: like mlp_fused_ok but
    down-independent (ARC down_in allowed — residual injected by the
    caller) and only the gateup k split must match."""
    mm = mlp_fused_dispatch_m()
    if m < _actq_pallas_min_m():   # see mlp_fused_ok
        return False
    bk1 = _engine_bk(pw_gu, m)
    return (mm > 0 and m <= mm and per_row
            and isinstance(pw_gu, PackedWeightI8)
            and pw_gu.codes.ndim == 2
            and pw_gu.n == 2 * f and f % 128 == 0
            and kq2 >= f
            and bk1 in _OK_BKS and pw_gu.kq % bk1 == 0)


def _gemm_actq_kernel(gw_ref, b_ref, x_ref, normw_ref,
                      codes_hbm, s_hbm,
                      out_ref, gx_out_ref,
                      c_s, s_s, xa_s, sems, acc_ref, *,
                      d: int, kq: int, bk: int, bn: int, nbuf: int,
                      has_b: bool, norm_eps, out_dtype):
    """Single-GEMM megakernel: [rmsnorm +] per-row ARC quantize of x
    fused with one streamed w8 GEMM (the attn-in qkv and o-proj
    launches). norm_eps None = plain quantize (o_in); set = the
    rmsnorm chain (attn_in). Same phase helpers as the MLP megakernel
    so the bit-exactness contract carries over."""
    nk = kq // bk
    nj = out_ref.shape[1] // bn

    if norm_eps is not None:
        gx = _norm_actq_phase(x_ref, normw_ref, xa_s, norm_eps, d, kq)
    else:
        bm = x_ref.shape[0]
        xf = x_ref[:].astype(jnp.float32)
        gx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            * jnp.float32(N.INV_NVFP4_GLOBAL_DIV), jnp.float32(1e-12))
        xa_s[:, :d] = _group_qdq_rows(xf / gx).astype(jnp.bfloat16)
        if kq > d:
            xa_s[:, d:] = jnp.zeros((bm, kq - d), jnp.bfloat16)
    gx_out_ref[:] = gx

    def epi(j, acc):
        y = acc * gx * gw_ref[:, pl.ds(j * bn, bn)]
        if has_b:
            y = y + b_ref[:, pl.ds(j * bn, bn)].astype(jnp.float32)
        out_ref[:, pl.ds(j * bn, bn)] = y.astype(out_dtype)

    _stream_gemm(codes_hbm, s_hbm, c_s, s_s, sems, 0, acc_ref,
                 lambda k: xa_s[:, pl.ds(k * bk, bk)],
                 bk, bn, nk, nj, nbuf, epi)


@functools.partial(jax.jit, static_argnames=(
    "d", "kq", "bk", "bn", "has_b", "norm_eps", "out_dtype",
    "interpret"))
def _gemm_actq_call(x, gw, b, normw, codes, s, *, d, kq, bk, bn,
                    has_b, norm_eps, out_dtype, interpret):
    bm = x.shape[0]
    n = codes.shape[1]
    kernel = functools.partial(
        _gemm_actq_kernel, d=d, kq=kq, bk=bk, bn=bn, nbuf=_NBUF,
        has_b=has_b, norm_eps=norm_eps, out_dtype=out_dtype)
    vm = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, n) if has_b else (1, 1),
                         lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, d), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((1, normw.shape[1]), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bm, 1), lambda i: (0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, n), out_dtype),
            jax.ShapeDtypeStruct((bm, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NBUF, bk, bn), jnp.int8),
            pltpu.VMEM((_NBUF, bk // 16, bn), jnp.uint8),
            pltpu.VMEM((bm, kq), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, _NBUF)),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * n * kq,
            bytes_accessed=codes.size + s.size + x.size * 2
            + bm * n * 2,
            transcendentals=0),
        interpret=interpret,
    )(gw, b, x, normw, codes, s)


def gemm_actq_ok(pw, m: int, d: int, per_row: bool,
                 select_num: int) -> bool:
    """Dispatch gate for the single-GEMM megakernel (quantize + GEMM
    in one launch): same conditions as the MLP megakernel for one
    weight, select-free input site."""
    mm = mlp_fused_dispatch_m()
    if m < _actq_pallas_min_m():   # see mlp_fused_ok
        return False
    if not (mm > 0 and m <= mm and per_row and select_num == 0
            and isinstance(pw, PackedWeightI8)
            and pw.codes.ndim == 2 and d % 128 == 0):
        return False
    bk = _engine_bk(pw, m)
    return bk in _OK_BKS and pw.kq % bk == 0 and pw.kq >= d


def gemm_w8_actq_fused(x2: jax.Array, pw, d: int,
                       out_dtype=jnp.bfloat16,
                       norm_w: jax.Array | None = None,
                       norm_eps: float | None = None):
    """(y [M, N], gx [M, 1]) = GEMM(pw, actq([rmsnorm](x2))) in one
    launch. x2: [M, D] raw activations; norm_w set = fold the rmsnorm
    (the attn_in site), None = plain quantize (the o_in site)."""
    m = x2.shape[0]
    kq, n = pw.kq, pw.n
    bm = max(8, _round_up(m, 8))
    x = x2
    if bm != m:
        x = jnp.pad(x, ((0, bm - m), (0, 0)))
    normw2 = (norm_w.reshape(1, -1) if norm_w is not None
              else jnp.zeros((1, 1), x.dtype))
    gw = jnp.broadcast_to(
        pw.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    b = (pw.bias.reshape(1, n).astype(jnp.float32)
         if pw.bias is not None else jnp.zeros((1, 1), jnp.float32))
    s = (pw.scales if pw.scales.dtype == jnp.uint8 else
         jax.lax.bitcast_convert_type(pw.scales, jnp.uint8))
    y, gx = _gemm_actq_call(
        x, gw, b, normw2, pw.codes, s, d=d, kq=kq,
        bk=_engine_bk(pw, m), bn=_pick_bn(n, 1024),
        has_b=pw.bias is not None,
        norm_eps=float(norm_eps) if norm_eps is not None else None,
        out_dtype=jnp.dtype(out_dtype).name,
        interpret=_use_interpret())
    if bm != m:
        y, gx = y[:m], gx[:m]
    return y, gx


def _engine_bk(pw, m: int) -> int:
    """The k-block gemm_dequant would pick for this weight at batch m
    (table first, then heuristic) — the megakernel streams at the
    SAME split so its f32 accumulation order matches the chain's."""
    from .autotune import lookup_blocks
    from .gemm import _decode_blocks_w8
    blk = lookup_blocks("w8", m, pw.kq, pw.n)
    return blk[0] if blk is not None else _decode_blocks_w8(
        m, pw.kq, pw.n)[0]


def mlp_fused_ok(pw_gu, pw_dn, m: int, f: int, per_row: bool,
                 select_num_down: int) -> bool:
    """Dispatch gate for the megakernel (see module docstring). The
    k splits FOLLOW the table/heuristic choice gemm_dequant would
    make for each weight (bit-exactness contract = same per-k-block
    accumulation order), so e.g. llama-3.1-8b's bk=1024 gateup is
    covered."""
    mm = mlp_fused_dispatch_m()
    # below the Pallas actq min-M the engine's quantize falls back to
    # the XLA lowering, whose roundings are CONTEXT-sensitive (the
    # round-2 jit-vs-eager lesson); the megakernel must not change
    # numerics there, so it only engages where the fixed Pallas
    # quantize would run anyway
    if m < _actq_pallas_min_m():
        return False
    if not (mm > 0 and m <= mm and per_row and select_num_down == 0
            and isinstance(pw_gu, PackedWeightI8)
            and isinstance(pw_dn, PackedWeightI8)
            and pw_gu.codes.ndim == 2 and pw_dn.codes.ndim == 2
            and pw_gu.n == 2 * f and f % 128 == 0
            and pw_dn.kq >= f):
        return False
    bk1 = _engine_bk(pw_gu, m)
    bk2 = _engine_bk(pw_dn, m)
    return (bk1 in _OK_BKS and bk2 in _OK_BKS
            and pw_gu.kq % bk1 == 0 and pw_dn.kq % bk2 == 0)


def mlp_w8_fused(xa1: jax.Array, gs1, pw_gu, pw_dn,
                 f: int, out_dtype=jnp.bfloat16,
                 norm_w: jax.Array | None = None,
                 norm_eps: float | None = None):
    """out[M, D] = down( actq( silu-mul( gateup(xa1) ) ) ) in one
    kernel launch. Returns (out, gu, gx2) — gu/gx2 feed tests and any
    residual-style consumers.

    Two input modes:
      - quantized: xa1 [M, kq1] bf16 qdq activations + gs1 [M, 1] f32
        per-row scales (gs1 required, norm_w None);
      - norm (phase A inside): xa1 is the RAW residual stream
        [M, D] and norm_w/norm_eps are the pre-MLP rmsnorm params —
        the kernel runs rmsnorm + per-row ARC quantize in VMEM
        first (gs1 ignored). Requires a select-free mlp_in.
    pw_gu/pw_dn: PackedWeightI8 (kq1 x 2F, kq2 x D).
    """
    m = xa1.shape[0]
    kq1, n1 = pw_gu.kq, pw_gu.n
    kq2, n2 = pw_dn.kq, pw_dn.n
    norm_mode = norm_w is not None
    d = xa1.shape[1]
    bm = max(8, _round_up(m, 8))
    x = xa1 if norm_mode else xa1.astype(jnp.bfloat16)
    if norm_mode:
        gs = jnp.zeros((m, 1), jnp.float32)
        normw2 = norm_w.reshape(1, -1)
    else:
        gs = jnp.broadcast_to(
            jnp.asarray(gs1, jnp.float32).reshape(-1, 1), (m, 1))
        normw2 = jnp.zeros((1, 1), x.dtype)
    if bm != m:
        x = jnp.pad(x, ((0, bm - m), (0, 0)))
        gs = jnp.pad(gs, ((0, bm - m), (0, 0)))
    gw1 = jnp.broadcast_to(
        pw_gu.global_scale.astype(jnp.float32).reshape(1, -1), (1, n1))
    gw2 = jnp.broadcast_to(
        pw_dn.global_scale.astype(jnp.float32).reshape(1, -1), (1, n2))
    b1 = (pw_gu.bias.reshape(1, n1).astype(jnp.float32)
          if pw_gu.bias is not None else jnp.zeros((1, 1), jnp.float32))
    b2 = (pw_dn.bias.reshape(1, n2).astype(jnp.float32)
          if pw_dn.bias is not None else jnp.zeros((1, 1), jnp.float32))
    s1 = (pw_gu.scales if pw_gu.scales.dtype == jnp.uint8 else
          jax.lax.bitcast_convert_type(pw_gu.scales, jnp.uint8))
    s2 = (pw_dn.scales if pw_dn.scales.dtype == jnp.uint8 else
          jax.lax.bitcast_convert_type(pw_dn.scales, jnp.uint8))
    bn1 = _pick_bn(n1, 1024)
    bn2 = _pick_bn(n2, 1024)
    out, gu, gx2 = _mlp_call(
        x, gs, gw1, gw2, b1, b2, normw2, pw_gu.codes, s1,
        pw_dn.codes, s2,
        f=f, d=d, kq1=kq1, kq2=kq2,
        bk1=_engine_bk(pw_gu, m), bk2=_engine_bk(pw_dn, m),
        bn1=bn1, bn2=bn2,
        has_b1=pw_gu.bias is not None, has_b2=pw_dn.bias is not None,
        norm_eps=float(norm_eps) if norm_mode else None,
        out_dtype=jnp.dtype(out_dtype).name, interpret=_use_interpret())
    if bm != m:
        out, gu, gx2 = out[:m], gu[:m], gx2[:m]
    return out, gu, gx2
