"""Activation quantization ops for the kernel path.

TPU replacement for the reference's fused reorder+quantize CUDA
kernels (kernels/src/reorder.cu:69-205, rmsnorm.cu:69-171, down.cu).
Unlike the CUDA kernels, no runtime channel *reorder/gather of the
main K range* is needed: the packed weight keeps original channel
order and only the ARC residual columns are gathered (SURVEY.md §7
design delta 1). The ops here are elementwise + small-group reductions
that XLA fuses well on the VPU; the output layout matches the fused
dequant-GEMM contract (kernels/gemm.py).

Numerics are identical to quant.arc.arc_quantize_x_qdq (the golden
path): residuals are computed from the already-rounded q(x)
(reference reorder.cu:157-160), and the global scale stays an epilogue
scalar.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import numerics as N
from ..quant import packing


def _use_interpret() -> bool:
    from .gemm import _use_interpret as g
    return g()


@functools.lru_cache()
def _actq_chunk() -> int:
    """Column-chunk width for the activation qdq. At K=18944 the
    single fused XLA region spills f32 intermediates to HBM (42 ps/
    elem vs 15 at K=3584 — round-3 prefill profile: 3.3 ms of the
    8 ms/layer prefill gap is this one site); group qdq is column-
    independent, so chunking to ~K=4736 restores per-chunk fusion
    bit-exactly. 0 disables."""
    return int(os.environ.get("ARC_ACTQ_CHUNK", "8192"))


def _nvfp4_qdq_scaled(xs: jax.Array) -> jax.Array:
    """Group qdq of pre-scaled values (f32 in, f32 out)."""
    shape = xs.shape
    g = xs.reshape(shape[:-1] + (shape[-1] // 16, 16))
    absmax = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    scale = jnp.clip(absmax * N.INV_E2M1_MAX, N.UE4M3_MIN,
                     N.UE4M3_MAX)
    scale = scale.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    q = N.e2m1_decode(N.e2m1_encode_scaled(g, scale)) * scale
    return q.reshape(shape)


# ---------------------------------------------------------------------------
# Fused Pallas activation-quantize (prefill shapes)
# ---------------------------------------------------------------------------
#
# The XLA lowering of the act-qdq expressions runs far above the HBM
# floor at prefill shapes (round-3/4 traces: ~42 ps/elem at K=18944 —
# spilled f32 intermediates — plus abs-max reduce, chunk concatenate
# and the _pin_rowmajor copy as SEPARATE passes over the data). One
# Pallas kernel reads the input once, computes the row scale, group
# qdq and the kq zero-pad in VMEM, and writes the GEMM-ready [M, kq]
# bf16 output in row-major layout (no pin pass needed downstream).
# Three pre-op modes fold the producer in: plain, rmsnorm(w), and
# silu(gate)*up over a fused [M, 2F] gate-up GEMM output (read via
# two block views of the same operand — no slice copies).
#
# Numerics are bit-identical to quant.arc.arc_quantize_x_qdq: same
# f32 expressions; the ue4m3 scale rounding uses an explicit RNE bit
# map (_ue4m3_qdq_bits, tested equal to the f8 cast on all inputs)
# because Mosaic fp8 cast support on v5e is unverified.

_ACTQ_PALLAS_M_ENV = "ARC_ACTQ_PALLAS_M"


@functools.lru_cache()
def _actq_pallas_min_m() -> int:
    """Min M for the fused Pallas act-quantize (0 disables). Default
    covers DECODE shapes too: the XLA lowering costs 8-39 us per site
    at M=4 (fixed overheads, round-4 decode_profile) and the kernel
    beats it — 28L decode 13.63 -> 12.40 ms/step in the on-chip A/B
    (results/r4/e2e_28L_actq4.log)."""
    return int(os.environ.get(_ACTQ_PALLAS_M_ENV, "4"))


def _ue4m3_qdq_bits(s: jax.Array) -> jax.Array:
    """quantize_ue4m3 (clip to [2^-9, 448] + RNE to e4m3fn) via f32
    bit arithmetic — equals `clip(s).astype(float8_e4m3fn)
    .astype(float32)` exactly (tests/test_numerics.py pins it)."""
    s = jnp.clip(s.astype(jnp.float32), N.UE4M3_MIN, N.UE4M3_MAX)
    # subnormal range (< 2^-6): fixed step 2^-9, ties-to-even
    sub = jnp.round(s * 512.0) * jnp.float32(1.0 / 512.0)
    # normal range: round mantissa to 3 bits (RNE), clamp to 448
    b = jax.lax.bitcast_convert_type(s, jnp.int32)
    lsb = (b >> 20) & 1
    rb = (b + 0x7FFFF + lsb) & ~0xFFFFF
    nrm = jnp.minimum(jax.lax.bitcast_convert_type(rb, jnp.float32),
                      jnp.float32(N.UE4M3_MAX))
    return jnp.where(s < 2.0 ** -6, sub, nrm)


def _e2m1_qdq_scaled_i32(x: jax.Array, scale: jax.Array) -> jax.Array:
    """e2m1 qdq of x/scale in SCALED units, Mosaic-safe: the boundary
    compares run in product space like N.e2m1_encode_scaled (exact f32
    products, no division), and the index accumulates in i32 (Mosaic
    v5e rejects the golden encoder's u8 vector arithmetic). Sign by
    select instead of a code bit. Returns value * scale."""
    mag = jnp.abs(x).astype(jnp.float32)
    idx = jnp.zeros(x.shape, jnp.int32)
    for b in N.E2M1_BOUNDARIES:
        idx = idx + (mag > jnp.float32(b) * scale).astype(jnp.int32)
    val = N.e2m1_decode(idx, jnp.float32)     # positive magnitudes
    return jnp.where(x < 0, -val, val) * scale


def _group_qdq_rows(xs: jax.Array) -> jax.Array:
    """NVFP4 group qdq of pre-scaled rows ([bm, k] f32 -> f32); same
    grid as _nvfp4_qdq_scaled (scale rounding via _ue4m3_qdq_bits).

    The group abs-max runs as an XOR-butterfly over the 16-lane
    groups (roll + select + max, 4 rounds): Mosaic cannot lower the
    [bm, k] -> [bm, k/16, 16] lane-splitting reshape ("unsupported
    shape cast", round-4 on-chip). After the butterfly every lane
    holds its group's max, so the scale is full-width and the qdq is
    purely elementwise — no reshape anywhere. XOR partners stay
    inside each aligned 16-lane group, so cross-group wraparound of
    the cyclic roll never contaminates."""
    bm, k = xs.shape
    a = jnp.abs(xs)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, k), 1)
    for d in (1, 2, 4, 8):
        fwd = pltpu.roll(a, k - d, axis=1)  # value from lane + d
        bwd = pltpu.roll(a, d, axis=1)      # value from lane - d
        partner = jnp.where((lane & d) != 0, bwd, fwd)
        a = jnp.maximum(a, partner)
    scale = _ue4m3_qdq_bits(a * N.INV_E2M1_MAX)
    return _e2m1_qdq_scaled_i32(xs, scale)


def _actq_kernel(*refs, k: int, kq: int, mode: str, eps: float):
    if mode == "silu_mul":
        gate_ref, up_ref, oxa_ref, ogx_ref = refs
        gate = gate_ref[:].astype(jnp.float32)
        xf = jax.nn.silu(gate) * up_ref[:].astype(jnp.float32)
        # the engine's unfused path materializes silu(g)*u in the
        # activation dtype before re-quantizing (engine.py _mlp);
        # round identically so fused == unfused stays bit-for-bit
        # (no-op for f32 engines)
        xf = xf.astype(gate_ref.dtype).astype(jnp.float32)
    elif mode == "rmsnorm":
        x_ref, w_ref, oxa_ref, ogx_ref = refs
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        # mimic llama.rms_norm's rounding chain exactly: the
        # normalized value rounds to x.dtype BEFORE the w multiply,
        # and the product rounds per jnp promotion (bf16*bf16 -> bf16)
        nm = (xf * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
        xf = (nm * w_ref[:]).astype(jnp.float32)
    else:
        x_ref, oxa_ref, ogx_ref = refs
        xf = x_ref[:].astype(jnp.float32)
    gx = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        * jnp.float32(N.INV_NVFP4_GLOBAL_DIV), jnp.float32(1e-12))
    # the only division in the whole qdq chain: a single xf/gx with
    # nothing downstream for XLA to reassociate it with (the element
    # rounding compares in product space — numerics.py deviation 3)
    q = _group_qdq_rows(xf / gx)
    oxa_ref[:, :k] = q.astype(oxa_ref.dtype)
    if kq > k:
        oxa_ref[:, k:] = jnp.zeros(
            (oxa_ref.shape[0], kq - k), oxa_ref.dtype)
    ogx_ref[:] = gx


def _actq_rows_budget(k: int, kq: int, mode: str, in_dtype) -> int:
    """Rows per block so inputs + f32 transients + output fit ~6 MB."""
    nin = 2 if mode in ("silu_mul", "rmsnorm") else 1
    ib = jnp.dtype(in_dtype).itemsize
    per_row = k * (nin * ib + 12) + kq * 2
    bm = max(8, min(512, (6 * 2 ** 20) // per_row // 8 * 8))
    return bm


@functools.partial(jax.jit, static_argnames=(
    "mode", "k", "kq", "eps", "bm", "interpret"))
def _actq_call(a, w, *, mode, k, kq, eps, bm, interpret):
    m = a.shape[0]
    kernel = functools.partial(_actq_kernel, k=k, kq=kq, mode=mode,
                               eps=eps)
    if mode == "silu_mul":
        # a is the fused [M, 2F] gate-up GEMM output; gate/up are two
        # block VIEWS of it (no slice materialization)
        in_specs = [
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 1),
                         memory_space=pltpu.VMEM),
        ]
        operands = (a, a)
    elif mode == "rmsnorm":
        in_specs = [
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (a, w.reshape(1, k))
    else:
        in_specs = [
            pl.BlockSpec((bm, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands = (a,)
    return pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, kq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, kq), jnp.bfloat16),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*operands)


def _actq_pallas(a, w, *, mode: str, k: int, kq: int,
                 eps: float = 0.0):
    """Run the fused act-quantize kernel, padding M to the block."""
    m = a.shape[0]
    bm = _actq_rows_budget(k, kq, mode, a.dtype)
    bm = min(bm, -(-m // 8) * 8)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        a = jnp.pad(a, ((0, m_pad - m), (0, 0)))
    xa, gx = _actq_call(a, w, mode=mode, k=k, kq=kq, eps=float(eps),
                        bm=bm, interpret=_use_interpret())
    if m_pad != m:
        xa, gx = xa[:m], gx[:m]
    return xa, gx


def _actq_pallas_ok(m: int, k: int, kq: int, per_row: bool) -> bool:
    mm = _actq_pallas_min_m()
    return (bool(per_row) and mm > 0 and m >= mm
            and k % 128 == 0 and kq % 128 == 0)


def _arc_residual_into(x_cols, xa, gx, idx, k: int):
    """Write the ARC residual block qdq(x/gx - qx) into xa's columns
    [k : k+KE]. take-then-subtract == subtract-then-take; qx values
    (e2m1 x ue4m3 products) are EXACT in bf16, so reading them back
    from xa loses nothing."""
    qx_cols = jnp.take(xa, idx, axis=1).astype(jnp.float32)
    err = x_cols.astype(jnp.float32) / gx - qx_cols
    qerr = _nvfp4_qdq_scaled(err).astype(xa.dtype)
    return jax.lax.dynamic_update_slice(xa, qerr, (0, k))


def quantize_x_arc(x: jax.Array, reorder_index: jax.Array,
                   select_num: int, kq: int | None = None,
                   per_row: bool = False):
    """Quantize an activation matrix for the fused dequant-GEMM.

    Args:
      x: [M, K] activations (bf16/f32), K % 16 == 0.
      reorder_index: [K] ascending-importance channel order.
      select_num: KE (static int, multiple of 64).
      kq: padded augmented length; defaults to pad_kq(K, select_num)
          which matches pack_weight_arc.
    Returns:
      (xa [M, kq] bf16 qdq values in scaled units, gx f32 scalar)
    """
    m, k = x.shape
    if kq is None:
        kq = packing.pad_kq(k, select_num)
    if _actq_pallas_ok(m, k, kq, per_row):
        xa, gx = _actq_pallas(x, None, mode="plain", k=k, kq=kq)
        if select_num:
            idx = reorder_index[-select_num:].astype(jnp.int32)
            xa = _arc_residual_into(jnp.take(x, idx, axis=1), xa, gx,
                                    idx, k)
        return xa, gx
    gx = N.nvfp4_global_scale(x, per_row=per_row)
    chunk = _actq_chunk()
    if chunk and k > chunk and m >= 256:
        # split to <=chunk-wide column blocks at group (16) boundaries;
        # qdq(x[:, c]/gx) per chunk == qdq(x/gx)[:, c] exactly
        n_c = -(-k // chunk)
        cw = -(-(k // n_c) // 16) * 16
        qx = jnp.concatenate(
            [_nvfp4_qdq_scaled(x[:, s:min(s + cw, k)].astype(jnp.float32)
                               / gx)
             for s in range(0, k, cw)], axis=1)
    else:
        qx = _nvfp4_qdq_scaled(x.astype(jnp.float32) / gx)
    parts = [qx]
    if select_num:
        idx = reorder_index[-select_num:].astype(jnp.int32)
        # take-then-subtract == subtract-then-take (elementwise), so the
        # full-width err tensor is never materialized
        err = (jnp.take(x, idx, axis=1).astype(jnp.float32) / gx
               - jnp.take(qx, idx, axis=1).astype(jnp.float32))
        parts.append(_nvfp4_qdq_scaled(err))
    pad = kq - k - select_num
    if pad:
        parts.append(jnp.zeros((m, pad), jnp.float32))
    xa = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return xa.astype(jnp.bfloat16), gx


def rmsnorm_quantize_x(x: jax.Array, norm_w: jax.Array, eps: float,
                       reorder_index: jax.Array, select_num: int,
                       kq: int | None = None, per_row: bool = False):
    """Fused RMSNorm + ARC quantize (reference rmsnorm.cu:69-171 /
    modeling_arc.py:222-227): y = x * w * rsqrt(mean(x²)+eps), then
    quantize. Returns ((xa, gx), normed) — normed is NOT returned by
    the reference kernel either; only the quantized tuple flows on."""
    m, k = x.shape
    if kq is None:
        kq = packing.pad_kq(k, select_num)
    if _actq_pallas_ok(m, k, kq, per_row) and select_num == 0:
        return _actq_pallas(x, norm_w, mode="rmsnorm", k=k, kq=kq,
                            eps=eps)
    # same rounding chain as llama.rms_norm (normalized value rounds
    # to x.dtype before the w multiply), so fused == fallback ==
    # engine-unfused bit-for-bit
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * norm_w
    return quantize_x_arc(normed, reorder_index, select_num, kq, per_row)


def silu_mul_quantize_x(gate: jax.Array, up: jax.Array,
                        reorder_index: jax.Array, select_num: int,
                        kq: int | None = None, per_row: bool = False):
    """Fused silu(gate)*up + ARC quantize — the reference re-quantizes
    the MLP product with a separate kernel launch
    (qLlamaLayer.py:436-441); here it is one fused XLA region."""
    prod = jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)
    return quantize_x_arc(prod, reorder_index, select_num, kq, per_row)


_SILU_GU_DEFUSE_M_ENV = "ARC_SILU_GU_DEFUSE_M"


@functools.lru_cache()
def _silu_gu_defuse_m() -> int:
    """Max M routed through XLA silu*mul feeding the PLAIN actq
    kernel instead of the fused silu_mul Pallas mode (0 = always
    fused). The fused mode's win is HBM passes (prefill); at decode
    shapes the kernel is pure ALU-bound and the silu exp runs on the
    critical path of every element (M=4 site costs 41 us vs 4 us for
    the plain kernel at K=3584 — results/r4/decode_profile2.log).
    Numerics are identical either way: the kernel materializes the
    product in the activation dtype exactly like the XLA producer
    (parity pinned in tests/test_actq.py). Default = 16: the round-4
    on-chip A/B picked the defused path at decode shapes (M=4 site
    4.44 us defused vs 5.35 fused, results/r4/silu_m4_lab.log; e2e
    28L 12.28 vs 12.41 ms/step, results/r4/e2e_28L_defuse.log)."""
    return int(os.environ.get(_SILU_GU_DEFUSE_M_ENV, "16"))


def silu_mul_quantize_gu(gu: jax.Array, reorder_index: jax.Array,
                         select_num: int, kq: int | None = None,
                         per_row: bool = False):
    """silu(gu[:, :F]) * gu[:, F:] + ARC quantize over the UNSLICED
    fused gate-up GEMM output — the fused Pallas kernel reads gate and
    up as two block views of gu, so the [M, 2F] tensor is read exactly
    once and the silu'd product is never materialized in HBM (the
    sliced path costs 3 extra full passes at prefill shapes).

    The ARC residual recomputes silu(gate)*up for just the KE selected
    columns (column-local, a few MB) instead of reading a product
    tensor back."""
    m, k2 = gu.shape
    k = k2 // 2
    if kq is None:
        kq = packing.pad_kq(k, select_num)
    if not _actq_pallas_ok(m, k, kq, per_row) or m <= _silu_gu_defuse_m():
        # engine convention: the product materializes in the
        # activation dtype before the re-quantize (see the kernel's
        # matching round)
        prod = (jax.nn.silu(gu[:, :k].astype(jnp.float32))
                * gu[:, k:].astype(jnp.float32)).astype(gu.dtype)
        return quantize_x_arc(prod, reorder_index, select_num, kq,
                              per_row)
    xa, gx = _actq_pallas(gu, None, mode="silu_mul", k=k, kq=kq)
    if select_num:
        idx = reorder_index[-select_num:].astype(jnp.int32)
        g_cols = jnp.take(gu, idx, axis=1).astype(jnp.float32)
        u_cols = jnp.take(gu, idx + k, axis=1).astype(jnp.float32)
        prod_cols = (jax.nn.silu(g_cols) * u_cols).astype(gu.dtype)
        xa = _arc_residual_into(prod_cols, xa, gx, idx, k)
    return xa, gx
