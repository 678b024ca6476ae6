#!/usr/bin/env python
"""On-chip A/B lab for the activation-quantize sites + the prefill
pieces the component profile does not cover (KV page append, RoPE,
residual/take glue).

Round-3 prefill profile found quantize_x at K=18944 costs 3.3 ms at
M=4096 (42 ps/elem vs 15 at K=3584): the single fused XLA region
spills f32 intermediates. ARC_ACTQ_CHUNK column-chunks the group qdq
(bit-exact; groups are column-independent). This lab measures the
chunk-width sweep plus the unprofiled prefill pieces.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from arcquant_tpu.config import get_model_config
from arcquant_tpu.models import llama
from arcquant_tpu.utils.timing import bench_op


def main():
    cfg = get_model_config("qwen2.5-7b")
    b, t = 4, 1024
    m = b * t
    d, inter = cfg.hidden_size, cfg.intermediate_size
    key = jax.random.PRNGKey(0)

    from arcquant_tpu.kernels import quantize as qk

    def rec(name, f, *a, n1=4, n2=20):
        dt = bench_op(f, *a, n1=n1, n2=n2)
        print(f"{name:42s} {dt*1e3:9.3f} ms", flush=True)
        return dt

    xi = jax.random.normal(key, (m, inter), jnp.bfloat16)
    x = jax.random.normal(key, (m, d), jnp.bfloat16)
    ridx_i = jnp.arange(inter, dtype=jnp.int32)
    ridx_d = jnp.arange(d, dtype=jnp.int32)

    # ---- fused Pallas act-quantize vs the XLA lowering (round 4) ----
    def set_pallas(on: bool):
        os.environ[qk._ACTQ_PALLAS_M_ENV] = "256" if on else "0"
        qk._actq_pallas_min_m.cache_clear()

    for on in (False, True):
        set_pallas(on)
        tag = "pallas" if on else "xla"
        rec(f"quantize_x K=18944 [{tag}]", lambda xx: qk.quantize_x_arc(
            xx, ridx_i, 0, per_row=True)[0], xi)
        rec(f"quantize_x K=3584 [{tag}]", lambda xx: qk.quantize_x_arc(
            xx, ridx_d, 0, per_row=True)[0], x)
        rec(f"quantize_x K=3584 ke=448 [{tag}]",
            lambda xx: qk.quantize_x_arc(
                xx, ridx_d, 448, per_row=True)[0], x)
        gu = jax.random.normal(key, (m, 2 * inter), jnp.bfloat16)
        rec(f"silu_mul_quantize_gu K=18944 [{tag}]",
            lambda g: qk.silu_mul_quantize_gu(
                g, ridx_i, 0, per_row=True)[0], gu)
        rec(f"rmsnorm_quantize K=3584 [{tag}]",
            lambda xx: qk.rmsnorm_quantize_x(
                xx, jnp.ones((d,), jnp.bfloat16), cfg.rms_eps,
                ridx_d, 0, per_row=True)[0], x)
    set_pallas(True)

    for chunk in (0, 8192):
        os.environ["ARC_ACTQ_CHUNK"] = str(chunk)
        qk._actq_chunk.cache_clear()
        set_pallas(False)
        rec(f"quantize_x K=18944 chunk={chunk} [xla]",
            lambda xx: qk.quantize_x_arc(
                xx, ridx_i, 0, per_row=True)[0], xi)
        set_pallas(True)
    os.environ["ARC_ACTQ_CHUNK"] = "8192"
    qk._actq_chunk.cache_clear()

    # silu site (gate/up as separate halves — the pre-round-4 path)
    gate = jax.random.normal(key, (m, inter), jnp.bfloat16)
    rec("silu_mul_quantize K=18944 [halves]",
        lambda g: qk.silu_mul_quantize_x(
            g, xi, ridx_i, 0, per_row=True)[0], gate)

    # ---- actq kernel internals: what dominates, the 8 full-row
    # rolls of the group-max butterfly or the qdq arithmetic?
    # (perf probes only — wrong numerics — via monkeypatched
    # _group_qdq_rows)
    real_gq = qk._group_qdq_rows

    def _no_butterfly(xs):
        scale = qk._ue4m3_qdq_bits(jnp.abs(xs) * 0.9)  # fake scale
        return qk._e2m1_qdq_scaled_i32(xs, scale)

    def _bf16_butterfly(xs):
        import jax as _j
        bm, k = xs.shape
        a = jnp.abs(xs).astype(jnp.bfloat16)
        lane = _j.lax.broadcasted_iota(jnp.int32, (bm, k), 1)
        from jax.experimental.pallas import tpu as _pt
        for dd in (1, 2, 4, 8):
            fwd = _pt.roll(a, k - dd, axis=1)
            bwd = _pt.roll(a, dd, axis=1)
            a = jnp.maximum(a, jnp.where((lane & dd) != 0, bwd, fwd))
        scale = qk._ue4m3_qdq_bits(a.astype(jnp.float32)
                                   * qk.N.INV_E2M1_MAX)
        return qk._e2m1_qdq_scaled_i32(xs, scale)

    for name, variant in (("no-butterfly", _no_butterfly),
                          ("bf16-butterfly", _bf16_butterfly)):
        qk._group_qdq_rows = variant
        qk._actq_call.clear_cache()   # kernel closes over the global
        try:
            rec(f"quantize_x K=18944 [pallas {name}]",
                lambda xx: qk.quantize_x_arc(
                    xx, ridx_i, 0, per_row=True)[0], xi)
        except Exception as e:                       # noqa: BLE001
            print(f"variant {name} failed: {type(e).__name__}: "
                  f"{e}"[:160], flush=True)
        finally:
            qk._group_qdq_rows = real_gq
    qk._actq_call.clear_cache()

    # ---- DECODE shapes (M=4): XLA act-quant fixed costs are 8-39 us
    # per site (decode_profile r4) — can the Pallas kernel beat them?
    md = 4
    xd = jax.random.normal(key, (md, d), jnp.bfloat16)
    xdi = jax.random.normal(key, (md, inter), jnp.bfloat16)
    gud = jax.random.normal(key, (md, 2 * inter), jnp.bfloat16)
    for on in (False, True):
        os.environ[qk._ACTQ_PALLAS_M_ENV] = "4" if on else "0"
        qk._actq_pallas_min_m.cache_clear()
        tag = "pallas" if on else "xla"
        rec(f"M=4 quantize_x K=3584 [{tag}]",
            lambda xx: qk.quantize_x_arc(xx, ridx_d, 0,
                                         per_row=True)[0], xd)
        rec(f"M=4 quantize_x K=18944 [{tag}]",
            lambda xx: qk.quantize_x_arc(xx, ridx_i, 0,
                                         per_row=True)[0], xdi)
        rec(f"M=4 silu_mul_gu K=18944 [{tag}]",
            lambda g: qk.silu_mul_quantize_gu(g, ridx_i, 0,
                                              per_row=True)[0], gud)
        rec(f"M=4 rmsnorm_quantize K=3584 [{tag}]",
            lambda xx: qk.rmsnorm_quantize_x(
                xx, jnp.ones((d,), jnp.bfloat16), cfg.rms_eps,
                ridx_d, 0, per_row=True)[0], xd)
    set_pallas(True)

    # ---- unprofiled prefill pieces at bs=4 x 1024 ----
    from arcquant_tpu.cache import paged
    from arcquant_tpu.engine.engine import EngineConfig

    ecfg = EngineConfig(max_batch=b, max_seq_len=t + 136)
    cache = paged.init_cache(cfg, ecfg.total_pages(), ecfg.page_size)
    pps = ecfg.pages_per_seq
    pt = 1 + (jnp.arange(b)[:, None] * pps
              + jnp.arange(pps)[None, :]).astype(jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    append_pos = positions
    kv = jax.random.normal(key, (b, t, cfg.num_kv_heads, cfg.head_dim),
                           jnp.bfloat16)

    def append(k):
        c2 = paged.append_kv(cache, 0, k, kv, pt, append_pos)
        return c2.codes[0]
    rec("append_kv (one layer, T=1024)", append, kv)

    cos, sin = llama.rope_cos_sin(cfg, positions)
    q4 = jax.random.normal(key, (b, t, cfg.num_heads, cfg.head_dim),
                           jnp.bfloat16)

    def rope(qq):
        q2, k2 = llama.apply_rope(qq, kv, cos, sin)
        return q2 + 0 * k2.sum()
    rec("apply_rope", rope, q4)

    x3 = x.reshape(b, t, d)
    rec("residual add", lambda a: (a + x3), x3)


if __name__ == "__main__":
    main()
