#!/usr/bin/env python
"""GEMM kernel experiment lab (round 2): find the w8/w4 decode-GEMM
config that reaches the HBM weight-stream floor.

Self-contained Pallas variants are timed against the production
kernel (arcquant_tpu/kernels/gemm.py) at decode shapes, on the real
chip, via the two-length-scan harness (utils/timing.bench_op).

Usage:
  python benchmarks/gemm_lab.py --exp blocks   # (bk, bn) sweep
  python benchmarks/gemm_lab.py --exp scale    # scale-mul strategies
  python benchmarks/gemm_lab.py --exp w4       # w4 decode variants
  python benchmarks/gemm_lab.py --exp shapes   # qwen2.5-7b shapes
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arcquant_tpu.quant import packing
from arcquant_tpu.kernels import gemm, quantize as qk
from arcquant_tpu.utils.timing import bench_op


def _mk_w8(key, m, n, k, ke=0):
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                          jnp.bfloat16) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)
    pw = packing.pack_weight_arc(w, ridx, ke, fmt="w8")
    xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
    return x, w, pw, xa.astype(jnp.bfloat16), gx


# ---------------------------------------------------------------------------
# w8 variants
# ---------------------------------------------------------------------------

def w8_variant(x, codes, scales_u8, gs, gw, *, bm, bn, bk, mode):
    """One fused dequant GEMM with a selectable decode strategy.

    mode:
      base   — production math: i8->f32, expand scales, f32 mul, bf16
      mul3d  — scale multiply via 3D reshape (no materialized expand)
      bf16   — decode+scale in bf16 domain
      noscale— skip the group-scale mul entirely (ALU floor probe)
    """
    m, n = x.shape[0], codes.shape[1]
    kq = codes.shape[0]
    n_k = kq // bk

    def kernel(gs_ref, gw_ref, x_ref, c_ref, s_ref, o_ref, acc_ref):
        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if mode == "noscale":
            w = c_ref[:].astype(jnp.bfloat16)
        elif mode == "mul3d":
            wf = c_ref[:].astype(jnp.float32)
            s = gemm._decode_ue4m3_f32(
                s_ref[:].astype(jnp.int32)) * 0.5     # [bk/16, bn]
            w3 = wf.reshape(bk // 16, 16, bn) * s[:, None, :]
            w = w3.reshape(bk, bn).astype(jnp.bfloat16)
        elif mode == "bf16":
            wf = c_ref[:].astype(jnp.float32).astype(jnp.bfloat16)
            s = (gemm._decode_ue4m3_f32(s_ref[:].astype(jnp.int32))
                 * 0.5).astype(jnp.bfloat16)
            se = gemm._expand_groups(s, 16)
            w = wf * se
        else:
            wf = c_ref[:].astype(jnp.float32)
            s = gemm._decode_ue4m3_f32(
                s_ref[:].astype(jnp.int32)) * 0.5
            w = (wf * gemm._expand_groups(s, 16)).astype(jnp.bfloat16)
        acc_ref[:] += jnp.dot(x_ref[:], w,
                              preferred_element_type=jnp.float32)

        @pl.when(kb == n_k - 1)
        def _():
            o_ref[:] = (acc_ref[:] * gs_ref[:] * gw_ref[:]).astype(
                jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * kq,
            bytes_accessed=codes.size + scales_u8.size + x.size * 2
            + m * n * 2, transcendentals=0),
    )(gs, gw, x, codes, scales_u8)


def exp_blocks(m, n, k):
    x, w, pw, xa, gx = _mk_w8(jax.random.PRNGKey(0), m, n, k)
    su8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
    gs = jnp.full((max(m, 16), 1), float(gx), jnp.float32)
    gw = jnp.broadcast_to(
        pw.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    bm = max(m, 16)
    xp = jnp.pad(xa, ((0, bm - m), (0, 0))) if bm != m else xa
    wT = w.T.copy()
    t_base = bench_op(lambda xx: jnp.dot(
        xx, wT, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x)
    print(f"bf16 jnp.dot: {t_base*1e6:8.2f} us")
    kq = pw.kq
    floor = (pw.codes.size + su8.size) / 819e9
    print(f"w8 weight-stream floor @819GB/s: {floor*1e6:8.2f} us")
    cfgs = [(2048, 512), (1024, 1024), (2048, 1024), (4096, 512),
            (1024, 2048), (2048, 2048), (512, 4096), (4096, 1024),
            (512, 2048), (1024, 512), (512, 1024), (3584, 512),
            (896, 4608), (1792, 2304)]
    for bk, bn in cfgs:
        if kq % bk or n % bn:
            continue
        try:
            t = bench_op(lambda xx, bk=bk, bn=bn: w8_variant(
                xx, pw.codes, su8, gs, gw, bm=bm, bn=bn, bk=bk,
                mode="base"), xp)
            print(f"w8 base bk={bk:5d} bn={bn:5d}: {t*1e6:8.2f} us  "
                  f"({t_base/t:.2f}x bf16, {floor/t*100:.0f}% of floor)")
        except Exception as e:
            print(f"w8 base bk={bk:5d} bn={bn:5d}: FAIL {type(e).__name__}: {e}"[:200])


def exp_scale(m, n, k, bk, bn):
    x, w, pw, xa, gx = _mk_w8(jax.random.PRNGKey(0), m, n, k)
    su8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
    bm = max(m, 16)
    gs = jnp.full((bm, 1), float(gx), jnp.float32)
    gw = jnp.broadcast_to(
        pw.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    xp = jnp.pad(xa, ((0, bm - m), (0, 0))) if bm != m else xa
    floor = (pw.codes.size + su8.size) / 819e9
    for mode in ("base", "mul3d", "bf16", "noscale"):
        try:
            t = bench_op(lambda xx, mode=mode: w8_variant(
                xx, pw.codes, su8, gs, gw, bm=bm, bn=bn, bk=bk,
                mode=mode), xp)
            print(f"w8 {mode:8s} bk={bk} bn={bn}: {t*1e6:8.2f} us "
                  f"({floor/t*100:.0f}% of floor)")
        except Exception as e:
            print(f"w8 {mode:8s}: FAIL {type(e).__name__}: {e}"[:200])


def exp_shapes():
    """qwen2.5-7b per-projection decode GEMMs, M=4 (bs=4 decode)."""
    shapes = {
        "qkv": (4608, 3584), "o": (3584, 3584),
        "gateup": (37888, 3584), "down": (3584, 18944),
    }
    for name, (n, k) in shapes.items():
        x, w, pw, xa, gx = _mk_w8(jax.random.PRNGKey(0), 4, n, k)
        su8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
        floor = (pw.codes.size + su8.size) / 819e9
        # weights as bench args, not closures: a closed-over array is a
        # jaxpr constant and blows the remote-compile request size
        t = bench_op(lambda xx, pw: gemm.gemm_dequant(xx, pw, gx),
                     xa, pw)
        wT = w.T.copy()
        tb = bench_op(lambda xx, wT: jnp.dot(
            xx, wT, preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16), x, wT)
        print(f"{name:7s} N={n:6d} K={k:6d} kq={pw.kq:6d}: "
              f"prod {t*1e6:8.2f} us, bf16 {tb*1e6:8.2f} us "
              f"({tb/t:.2f}x, {floor/t*100:.0f}% of floor)")


def exp_dmaprod():
    """Production fused kernel vs the flag-gated manual-DMA path
    (gemm._gemm_dma) at the qwen2.5-7b decode GEMM shapes, M=4, one
    process — the promotion decision for ARC_GEMM_DMA_M."""
    shapes = {
        "qkv": (4608, 3584), "o": (3584, 3584),
        "gateup": (37888, 3584), "down": (3584, 18944),
    }
    tot_f = tot_d = 0.0
    for name, (n, k) in shapes.items():
        x, w, pw, xa, gx = _mk_w8(jax.random.PRNGKey(0), 4, n, k)
        su8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
        floor = (pw.codes.size + su8.size) / 819e9
        tf = bench_op(lambda xx, pw: gemm.gemm_dequant(xx, pw, gx),
                      xa, pw)
        td = bench_op(lambda xx, pw: gemm._gemm_dma(
            xx, pw, su8, gx, jnp.bfloat16), xa, pw)
        y0 = gemm.gemm_dequant(xa, pw, gx)
        y1 = gemm._gemm_dma(xa, pw, su8, gx, jnp.bfloat16)
        ok = bool(jnp.all(y0 == y1))
        bk, bn = gemm._dma_blocks_w8(pw.kq, n, gemm._DMA_NBUF)
        tot_f += tf
        tot_d += td
        print(f"{name:7s} N={n:6d} K={k:6d}: fused {tf*1e6:8.2f} us "
              f"({floor/tf*100:.0f}%), dma {td*1e6:8.2f} us "
              f"({floor/td*100:.0f}%) bk={bk} bn={bn} exact={ok}")
    print(f"TOTAL: fused {tot_f*1e6:8.2f} us, dma {tot_d*1e6:8.2f} us "
          f"({tot_f/tot_d:.3f}x)")


# appended to gemm_lab.py

def w8_dma_variant(x, codes, scales_u8, gs, gw, *, bm, bk, nbuf=3,
                   interpret=False):
    """Manual multi-buffered DMA GEMM: grid=(1,), a fori loop streams
    [bk, N] code stripes HBM->VMEM with `nbuf` slots (the auto
    pipeliner's per-grid-step cost was the ~20% gap to floor at
    decode shapes — this is the paged_decode DMA-loop trick applied
    to the weight stream)."""
    m, n = x.shape[0], codes.shape[1]
    kq = codes.shape[0]
    nk = kq // bk

    def kernel(gs_ref, gw_ref, x_ref, s_ref, codes_hbm, o_ref,
               c_s, sems, acc_ref):
        def dma(slot, i):
            return pltpu.make_async_copy(
                codes_hbm.at[pl.ds(i * bk, bk)], c_s.at[slot],
                sems.at[slot])

        for i in range(min(nbuf - 1, nk)):
            dma(i, i).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def loop(i, _):
            slot = jax.lax.rem(i, nbuf)

            @pl.when(i + nbuf - 1 < nk)
            def _():
                dma(jax.lax.rem(i + nbuf - 1, nbuf), i + nbuf - 1).start()

            dma(slot, i).wait()
            c = c_s[slot]                          # [bk, n] i8
            s = gemm._decode_ue4m3_f32(
                jax.lax.dynamic_slice_in_dim(
                    s_ref[:], i * (bk // 16), bk // 16, 0)
                .astype(jnp.int32)) * 0.5
            w3 = (c.astype(jnp.float32).reshape(bk // 16, 16, n)
                  * s[:, None, :]).reshape(bk, n).astype(jnp.bfloat16)
            xx = x_ref[:, pl.ds(i * bk, bk)]
            acc_ref[:] += jnp.dot(xx, w3,
                                  preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nk, loop, 0)
        o_ref[:] = (acc_ref[:] * gs_ref[:] * gw_ref[:]).astype(
            jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nbuf, bk, n), jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((bm, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gs, gw, x, scales_u8, codes)


def w8_dma_nblock(x, codes, scales_u8, gs, gw, *, bm, bk, bn, nbuf=3,
                  interpret=False):
    """N-blocked manual-DMA GEMM: grid=(N/bn,) parallel programs, each
    streaming its [bk, bn] code stripes from HBM with `nbuf` slots.
    Covers the shapes whose full-N stripe overflows VMEM (qkv N=4608,
    gateup N=37888); the DMA source is a 2D strided slice (row
    segments of bn bytes), which the DMA engine handles but may pay a
    descriptor cost vs the contiguous full-N variant — measure both."""
    m, n = x.shape[0], codes.shape[1]
    kq = codes.shape[0]
    nk = kq // bk

    def kernel(gs_ref, x_ref, gw_ref, s_ref, codes_hbm, o_ref,
               c_s, sems, acc_ref):
        j = pl.program_id(0)

        def dma(slot, i):
            return pltpu.make_async_copy(
                codes_hbm.at[pl.ds(i * bk, bk), pl.ds(j * bn, bn)],
                c_s.at[slot], sems.at[slot])

        for i in range(min(nbuf - 1, nk)):
            dma(i, i).start()
        acc_ref[:] = jnp.zeros_like(acc_ref)

        def loop(i, _):
            slot = jax.lax.rem(i, nbuf)

            @pl.when(i + nbuf - 1 < nk)
            def _():
                dma(jax.lax.rem(i + nbuf - 1, nbuf),
                    i + nbuf - 1).start()

            dma(slot, i).wait()
            c = c_s[slot]                          # [bk, bn] i8
            s = gemm._decode_ue4m3_f32(
                jax.lax.dynamic_slice_in_dim(
                    s_ref[:], i * (bk // 16), bk // 16, 0)
                .astype(jnp.int32)) * 0.5
            w3 = (c.astype(jnp.float32).reshape(bk // 16, 16, bn)
                  * s[:, None, :]).reshape(bk, bn).astype(jnp.bfloat16)
            xx = x_ref[:, pl.ds(i * bk, bk)]
            acc_ref[:] += jnp.dot(xx, w3,
                                  preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nk, loop, 0)
        o_ref[:] = (acc_ref[:] * gs_ref[:] * gw_ref[:]).astype(
            jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bm, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, kq), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kq // 16, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nbuf, bk, bn), jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((bm, bn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gs, x, gw, scales_u8, codes)


def exp_dma(m, n, k):
    x, w, pw, xa, gx = _mk_w8(jax.random.PRNGKey(0), m, n, k)
    su8 = jax.lax.bitcast_convert_type(pw.scales, jnp.uint8)
    bm = max(m, 16)
    gs = jnp.full((bm, 1), float(gx), jnp.float32)
    gw = jnp.broadcast_to(
        pw.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    xp = jnp.pad(xa, ((0, bm - m), (0, 0))) if bm != m else xa
    floor = (pw.codes.size + su8.size) / 819e9
    print(f"floor: {floor*1e6:8.2f} us")
    t0 = bench_op(lambda xx, c: gemm.gemm_dequant(xx, pw, gx), xp,
                  pw.codes)
    print(f"prod gemm_dequant: {t0*1e6:8.2f} us ({floor/t0*100:.0f}%)")
    for bk in (512, 1024, 2048):
        for nbuf in (2, 3, 4):
            if (pw.kq % bk) or (nbuf * bk * n > 12 * 2**20):
                continue
            try:
                t = bench_op(lambda xx, c, bk=bk, nbuf=nbuf:
                             w8_dma_variant(xx, c, su8, gs, gw, bm=bm,
                                            bk=bk, nbuf=nbuf),
                             xp, pw.codes)
                print(f"w8 dma bk={bk:5d} nbuf={nbuf}: {t*1e6:8.2f} us"
                      f"  ({floor/t*100:.0f}% of floor)")
            except Exception as e:
                print(f"w8 dma bk={bk:5d} nbuf={nbuf}: FAIL "
                      f"{type(e).__name__}: {e}"[:300])
    # bn must divide N: qwen shapes need 512 (down N=3584=7*512) and
    # 1536 (qkv N=4608=3*1536) alongside the powers of two.
    for bn in (512, 1024, 1536, 2048, 4096):
        if n % bn:
            continue
        for bk in (1024, 2048):
            for nbuf in (2, 3):
                if (pw.kq % bk) or (n % bn) or (
                        nbuf * bk * bn > 12 * 2**20):
                    continue
                try:
                    t = bench_op(
                        lambda xx, c, bk=bk, bn=bn, nbuf=nbuf:
                        w8_dma_nblock(xx, c, su8, gs, gw, bm=bm,
                                      bk=bk, bn=bn, nbuf=nbuf),
                        xp, pw.codes)
                    print(f"w8 dmaN bn={bn:5d} bk={bk:5d} nbuf={nbuf}:"
                          f" {t*1e6:8.2f} us"
                          f"  ({floor/t*100:.0f}% of floor)")
                except Exception as e:
                    print(f"w8 dmaN bn={bn:5d} bk={bk:5d} nbuf={nbuf}:"
                          f" FAIL {type(e).__name__}: {e}"[:300])


def w4_variant(x, codes, scales_u8, gs, gw, *, bm, bn, bk, mode):
    """w4 fused dequant GEMM with a selectable nibble-decode strategy.

    mode:
      f32  — production math: i32-domain e2m1x affine decode
      i16  — 16-bit-domain decode: ops on i16 lanes (packed 2/lane on
             the VPU), bitcast to bf16, bf16 scale multiply
      nodec— skip decode entirely (stream+convert floor probe)
    """
    m_, n_ = x.shape[0], codes.shape[1]
    kq = codes.shape[0] * 2
    n_k = kq // bk

    def kernel(gs_ref, gw_ref, xe_ref, xo_ref, c_ref, s_ref, o_ref,
               acc_ref):
        kb = pl.program_id(2)

        @pl.when(kb == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if mode == "i16":
            c = c_ref[:].astype(jnp.int16)           # [bk2, bn]

            def dec(nib):
                mag = nib & 0x7
                bits = ((mag << 6) | ((nib & 0x8) << 12)) + 0x3F00
                f = jax.lax.bitcast_convert_type(
                    bits.astype(jnp.int16), jnp.bfloat16)
                return jnp.where(mag == 1, jnp.bfloat16(0), f)

            w_even, w_odd = dec(c & 0xF), dec(c >> 4)
            s = (gemm._decode_ue4m3_f32(s_ref[:].astype(jnp.int32))
                 .astype(jnp.bfloat16))
            bk2 = bk // 2
            se = s[:, None, :]
            w_even = (w_even.reshape(bk2 // 8, 8, bn) * se).reshape(
                bk2, bn)
            w_odd = (w_odd.reshape(bk2 // 8, 8, bn) * se).reshape(
                bk2, bn)
            w = jnp.concatenate([w_even, w_odd], axis=0)
        elif mode == "nodec":
            c = c_ref[:].astype(jnp.int32)
            w0 = jax.lax.bitcast_convert_type(
                c << 22, jnp.float32).astype(jnp.bfloat16)
            w = jnp.concatenate([w0, w0], axis=0)
        else:
            c = c_ref[:].astype(jnp.int32)

            def dec(nib):
                mag = nib & 0x7
                bits = ((mag << 22) | ((nib & 0x8) << 28)) + 0x3F000000
                f = jax.lax.bitcast_convert_type(bits, jnp.float32)
                return jnp.where(mag == 1, 0.0, f)

            w_even, w_odd = dec(c & 0xF), dec(c >> 4)
            s = gemm._decode_ue4m3_f32(s_ref[:].astype(jnp.int32))
            bk2 = bk // 2
            se = s[:, None, :]
            w_even = (w_even.reshape(bk2 // 8, 8, bn) * se).reshape(
                bk2, bn)
            w_odd = (w_odd.reshape(bk2 // 8, 8, bn) * se).reshape(
                bk2, bn)
            w = jnp.concatenate([w_even, w_odd], axis=0).astype(
                jnp.bfloat16)
        xx = jnp.concatenate([xe_ref[:], xo_ref[:]], axis=1)
        acc_ref[:] += jnp.dot(xx, w, preferred_element_type=jnp.float32)

        @pl.when(kb == n_k - 1)
        def _():
            o_ref[:] = (acc_ref[:] * gs_ref[:] * gw_ref[:]).astype(
                jnp.bfloat16)

    k2 = kq // 2
    return pl.pallas_call(
        kernel,
        grid=(m_ // bm, n_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk // 2), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk // 2),
                         lambda i, j, kk, k2=k2, bk=bk:
                         (i, k2 // (bk // 2) + kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 16, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_, n_), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(gs, gw, x, x, codes, scales_u8)


def exp_w4(m, n, k):
    """w4 (nibble) decode-GEMM block sweep vs w8 and bf16, all within
    one process (cross-process chip-state variance is ~20%)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                          jnp.bfloat16) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)
    pw4 = packing.pack_weight_arc(w, ridx, 0, fmt="w4")
    pw8 = packing.pack_weight_arc(w, ridx, 0, fmt="w8")
    xa, gx = qk.quantize_x_arc(x, ridx, 0, kq=pw4.kq)
    xa = xa.astype(jnp.bfloat16)
    wT = w.T.copy()
    tb = bench_op(lambda xx, wT: jnp.dot(
        xx, wT, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x, wT)
    floor4 = (pw4.codes.size + pw4.scales.size) / 819e9
    floor8 = (pw8.codes.size + pw8.scales.size) / 819e9
    print(f"bf16: {tb*1e6:8.2f} us | w4 floor {floor4*1e6:.2f} us | "
          f"w8 floor {floor8*1e6:.2f} us")
    t8 = bench_op(lambda xx, pw: gemm.gemm_dequant(xx, pw, gx), xa, pw8)
    print(f"w8 prod: {t8*1e6:8.2f} us ({tb/t8:.2f}x bf16, "
          f"{floor8/t8*100:.0f}% of w8 floor)")
    kq = pw4.kq
    for bk, bn in ((2048, 512), (1024, 1024), (2048, 1024),
                   (512, 4096)):
        if kq % bk or n % bn:
            continue
        try:
            t = bench_op(lambda xx, pw, bk=bk, bn=bn: gemm.gemm_dequant(
                xx, pw, gx, bk=bk, bn=bn), xa, pw4)
            print(f"w4 bk={bk:5d} bn={bn:5d}: {t*1e6:8.2f} us  "
                  f"({tb/t:.2f}x bf16, {floor4/t*100:.0f}% of w4 floor, "
                  f"{t/t8:.2f}x w8)")
        except Exception as e:
            print(f"w4 bk={bk:5d} bn={bn:5d}: FAIL "
                  f"{type(e).__name__}: {e}"[:200])
    # decode-strategy variants at one block config
    bm = max(m, 16)
    xsp = gemm.split_even_odd(xa)
    xsp = (jnp.pad(xsp, ((0, bm - m), (0, 0))) if bm != m else xsp)
    su8 = jax.lax.bitcast_convert_type(pw4.scales, jnp.uint8)
    gs = jnp.full((bm, 1), float(gx), jnp.float32)
    gw = jnp.broadcast_to(
        pw4.global_scale.astype(jnp.float32).reshape(1, -1), (1, n))
    # correctness cross-check for the variant harness
    ref = gemm.gemm_dequant(xa, pw4, gx)
    for mode in ("f32", "i16", "nodec"):
        try:
            t = bench_op(lambda xx, c, mode=mode: w4_variant(
                xx, c, su8, gs, gw, bm=bm, bn=1024, bk=2048, mode=mode),
                xsp, pw4.codes)
            y = w4_variant(xsp, pw4.codes, su8, gs, gw, bm=bm, bn=1024,
                           bk=2048, mode=mode)[:m]
            err = float(jnp.max(jnp.abs(
                y.astype(jnp.float32) - ref.astype(jnp.float32))))
            print(f"w4 {mode:6s} bk=2048 bn=1024: {t*1e6:8.2f} us  "
                  f"({floor4/t*100:.0f}% of w4 floor, maxerr {err:.2e})")
        except Exception as e:
            print(f"w4 {mode:6s}: FAIL {type(e).__name__}: {e}"[:300])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="blocks",
                    choices=["blocks", "scale", "w4", "shapes", "dma",
                             "dmaprod"])
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--bk", type=int, default=2048)
    ap.add_argument("--bn", type=int, default=512)
    a = ap.parse_args()
    print(f"backend={jax.default_backend()}")
    if a.exp == "blocks":
        exp_blocks(a.m, a.n, a.k)
    elif a.exp == "scale":
        exp_scale(a.m, a.n, a.k, a.bk, a.bn)
    elif a.exp == "w4":
        exp_w4(a.m, a.n, a.k)
    elif a.exp == "shapes":
        exp_shapes()
    elif a.exp == "dma":
        exp_dma(a.m, a.n, a.k)
    elif a.exp == "dmaprod":
        exp_dmaprod()


if __name__ == "__main__":
    main()
