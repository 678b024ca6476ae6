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
the engine's de-fused chain at the same k-block split —
  gemm_dequant(bk=512, out bf16) -> silu(g_f32)*u_f32 -> .astype(bf16)
  -> quantize_x_arc(per_row) -> gemm_dequant(bk=512)
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
from .quantize import _group_qdq_rows

_MLP_FUSED_M_ENV = "ARC_MLP_FUSED_M"
_MLP_FUSED_M_DEFAULT = 0      # off until the on-chip A/B picks it
_NBUF = 3
_BK = 512                     # matches the tabled decode bk; the
                              # parity contract depends on this split


@functools.lru_cache()
def mlp_fused_dispatch_m() -> int:
    """Max M routed through the megakernel (0 = off)."""
    return int(os.environ.get(_MLP_FUSED_M_ENV,
                              str(_MLP_FUSED_M_DEFAULT)))


def _mlp_w8_kernel(gs1_ref, gw1_ref, gw2_ref, b1_ref, b2_ref, xa1_ref,
                   codes1_hbm, s1_hbm, codes2_hbm, s2_hbm,
                   out_ref, gu_ref, gx2_ref,
                   c1_s, s1_s, c2_s, s2_s, xa2_s, sems, acc_ref, *,
                   f: int, kq1: int, kq2: int, bn1: int, bn2: int,
                   nbuf: int, has_b1: bool, has_b2: bool,
                   out_dtype):
    bm = out_ref.shape[0]
    nk1 = kq1 // _BK
    nj1 = gu_ref.shape[1] // bn1
    nk2 = kq2 // _BK
    nj2 = out_ref.shape[1] // bn2

    def dma1(slot, t):
        j, k = t // nk1, jax.lax.rem(t, nk1)
        return (pltpu.make_async_copy(
            codes1_hbm.at[pl.ds(k * _BK, _BK), pl.ds(j * bn1, bn1)],
            c1_s.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(
            s1_hbm.at[pl.ds(k * (_BK // 16), _BK // 16),
                      pl.ds(j * bn1, bn1)],
            s1_s.at[slot], sems.at[1, slot]))

    def dma2(slot, t):
        j, k = t // nk2, jax.lax.rem(t, nk2)
        return (pltpu.make_async_copy(
            codes2_hbm.at[pl.ds(k * _BK, _BK), pl.ds(j * bn2, bn2)],
            c2_s.at[slot], sems.at[2, slot]),
            pltpu.make_async_copy(
            s2_hbm.at[pl.ds(k * (_BK // 16), _BK // 16),
                      pl.ds(j * bn2, bn2)],
            s2_s.at[slot], sems.at[3, slot]))

    def decode_w(c_slot, s_slot, bn):
        w = c_slot.astype(jnp.float32)               # [_BK, bn]
        s = _decode_ue4m3_f32(s_slot.astype(jnp.int32)) * 0.5
        return (w.reshape(_BK // 16, 16, bn) * s[:, None, :]).reshape(
            _BK, bn).astype(jnp.bfloat16)

    # ---- phase B: gateup GEMM, gu stays in VMEM --------------------
    t1_total = nj1 * nk1
    for i in range(min(nbuf - 1, t1_total)):
        for c in dma1(i, i):
            c.start()

    def loop1(t, _):
        slot = jax.lax.rem(t, nbuf)
        j, k = t // nk1, jax.lax.rem(t, nk1)

        @pl.when(t + nbuf - 1 < t1_total)
        def _():
            for c in dma1(jax.lax.rem(t + nbuf - 1, nbuf),
                          t + nbuf - 1):
                c.start()

        for c in dma1(slot, t):
            c.wait()

        @pl.when(k == 0)
        def _():
            acc_ref[:, :bn1] = jnp.zeros((bm, bn1), jnp.float32)

        w = decode_w(c1_s[slot], s1_s[slot], bn1)
        xx = xa1_ref[:, pl.ds(k * _BK, _BK)]
        acc_ref[:, :bn1] += jnp.dot(xx, w,
                                    preferred_element_type=jnp.float32)

        @pl.when(k == nk1 - 1)
        def _():
            y = (acc_ref[:, :bn1] * gs1_ref[:]
                 * gw1_ref[:, pl.ds(j * bn1, bn1)])
            if has_b1:
                y = y + b1_ref[:, pl.ds(j * bn1, bn1)].astype(
                    jnp.float32)
            gu_ref[:, pl.ds(j * bn1, bn1)] = y.astype(gu_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t1_total, loop1, 0)

    # ---- phase C: silu(gate)*up -> per-row ARC quantize in VMEM ----
    # identical chain to the de-fused engine path: f32 product, bf16
    # materialization round, f32 quantize math (quantize_x_arc)
    gate = gu_ref[:, :f].astype(jnp.float32)
    up = gu_ref[:, f:].astype(jnp.float32)
    xf = (jax.nn.silu(gate) * up).astype(gu_ref.dtype).astype(
        jnp.float32)
    gx2 = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        * jnp.float32(N.INV_NVFP4_GLOBAL_DIV), jnp.float32(1e-12))
    # xa2 lands in a scratch REF: phase D slices it with pl.ds
    # (Mosaic has no lowering for dynamic_slice on a VALUE), and the
    # kq2 zero pad is written once here
    xa2_s[:, :f] = _group_qdq_rows(xf / gx2).astype(jnp.bfloat16)
    if kq2 > f:
        xa2_s[:, f:] = jnp.zeros((bm, kq2 - f), jnp.bfloat16)
    gx2_ref[:] = gx2

    # ---- phase D: down GEMM over [xa2 | zero pad] ------------------
    t2_total = nj2 * nk2
    for i in range(min(nbuf - 1, t2_total)):
        for c in dma2(i, i):
            c.start()

    def loop2(t, _):
        slot = jax.lax.rem(t, nbuf)
        j, k = t // nk2, jax.lax.rem(t, nk2)

        @pl.when(t + nbuf - 1 < t2_total)
        def _():
            for c in dma2(jax.lax.rem(t + nbuf - 1, nbuf),
                          t + nbuf - 1):
                c.start()

        for c in dma2(slot, t):
            c.wait()

        @pl.when(k == 0)
        def _():
            acc_ref[:, :bn2] = jnp.zeros((bm, bn2), jnp.float32)

        w = decode_w(c2_s[slot], s2_s[slot], bn2)
        xx = xa2_s[:, pl.ds(k * _BK, _BK)]
        acc_ref[:, :bn2] += jnp.dot(xx, w,
                                    preferred_element_type=jnp.float32)

        @pl.when(k == nk2 - 1)
        def _():
            y = (acc_ref[:, :bn2] * gx2
                 * gw2_ref[:, pl.ds(j * bn2, bn2)])
            if has_b2:
                y = y + b2_ref[:, pl.ds(j * bn2, bn2)].astype(
                    jnp.float32)
            out_ref[:, pl.ds(j * bn2, bn2)] = y.astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, t2_total, loop2, 0)


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
    "f", "kq1", "kq2", "bn1", "bn2", "has_b1", "has_b2", "out_dtype",
    "interpret"))
def _mlp_call(xa1, gs1, gw1, gw2, b1, b2, codes1, s1, codes2, s2, *,
              f, kq1, kq2, bn1, bn2, has_b1, has_b2, out_dtype,
              interpret):
    bm = xa1.shape[0]
    n1, n2 = codes1.shape[1], codes2.shape[1]
    kernel = functools.partial(
        _mlp_w8_kernel, f=f, kq1=kq1, kq2=kq2, bn1=bn1, bn2=bn2,
        nbuf=_NBUF, has_b1=has_b1, has_b2=has_b2, out_dtype=out_dtype)
    vm = pltpu.VMEM
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
            pl.BlockSpec((bm, kq1), lambda i: (0, 0), memory_space=vm),
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
            pltpu.VMEM((_NBUF, _BK, bn1), jnp.int8),
            pltpu.VMEM((_NBUF, _BK // 16, bn1), jnp.uint8),
            pltpu.VMEM((_NBUF, _BK, bn2), jnp.int8),
            pltpu.VMEM((_NBUF, _BK // 16, bn2), jnp.uint8),
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
    )(gs1, gw1, gw2, b1, b2, xa1, codes1, s1, codes2, s2)


def _engine_bk(pw, m: int) -> int:
    """The k-block gemm_dequant would pick for this weight at batch m
    (table first, then heuristic) — the megakernel's bit-exactness
    contract requires both GEMMs to split at its fixed _BK."""
    from .autotune import lookup_blocks
    from .gemm import _decode_blocks_w8
    blk = lookup_blocks("w8", m, pw.kq, pw.n)
    return blk[0] if blk is not None else _decode_blocks_w8(
        m, pw.kq, pw.n)[0]


def mlp_fused_ok(pw_gu, pw_dn, m: int, f: int, per_row: bool,
                 select_num_down: int) -> bool:
    """Dispatch gate for the megakernel (see module docstring)."""
    mm = mlp_fused_dispatch_m()
    return (mm > 0 and m <= mm and per_row and select_num_down == 0
            and isinstance(pw_gu, PackedWeightI8)
            and isinstance(pw_dn, PackedWeightI8)
            and pw_gu.codes.ndim == 2 and pw_dn.codes.ndim == 2
            and pw_gu.n == 2 * f and pw_gu.kq % _BK == 0
            and pw_dn.kq % _BK == 0 and pw_dn.kq >= f
            and f % _BK == 0
            and _engine_bk(pw_gu, m) == _BK
            and _engine_bk(pw_dn, m) == _BK)


def mlp_w8_fused(xa1: jax.Array, gs1: jax.Array, pw_gu, pw_dn,
                 f: int, out_dtype=jnp.bfloat16):
    """out[M, D] = down( actq( silu-mul( gateup(xa1) ) ) ) in one
    kernel launch. Returns (out, gu, gx2) — gu/gx2 feed tests and any
    residual-style consumers.

    xa1: [M, kq1] quantized activations (bf16), gs1: [M, 1] f32
    per-row scales; pw_gu/pw_dn: PackedWeightI8 (kq1 x 2F, kq2 x D).
    """
    m = xa1.shape[0]
    kq1, n1 = pw_gu.kq, pw_gu.n
    kq2, n2 = pw_dn.kq, pw_dn.n
    bm = max(8, _round_up(m, 8))
    x = xa1.astype(jnp.bfloat16)
    gs = jnp.broadcast_to(jnp.asarray(gs1, jnp.float32).reshape(-1, 1),
                          (m, 1))
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
        x, gs, gw1, gw2, b1, b2, pw_gu.codes, s1, pw_dn.codes, s2,
        f=f, kq1=kq1, kq2=kq2, bn1=bn1, bn2=bn2,
        has_b1=pw_gu.bias is not None, has_b2=pw_dn.bias is not None,
        out_dtype=jnp.dtype(out_dtype).name, interpret=_use_interpret())
    if bm != m:
        out, gu, gx2 = out[:m], gu[:m], gx2[:m]
    return out, gu, gx2
