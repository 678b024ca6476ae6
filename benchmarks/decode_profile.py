#!/usr/bin/env python
"""Decode-step component budget at qwen2.5-7b bs=4 shapes.

Times each per-layer component of the decode step in isolation via
the two-length-scan harness, so the 28-layer step time can be
attributed: packed GEMMs, activation quantize sites, rmsnorm, rope,
KV append, paged attention, LM head, sampling.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from arcquant_tpu.config import get_model_config, QuantConfig
from arcquant_tpu.models import llama, quantized
from arcquant_tpu.quant import packing
from arcquant_tpu.kernels import gemm, quantize as qk
from arcquant_tpu.kernels.paged_decode import paged_decode
from arcquant_tpu.cache import paged
from arcquant_tpu.utils.timing import bench_op


def main():
    cfg = get_model_config("qwen2.5-7b")
    b = 4
    key = jax.random.PRNGKey(0)
    d, qs, kvs, inter = (cfg.hidden_size, cfg.q_size, cfg.kv_size,
                         cfg.intermediate_size)
    x = jax.random.normal(key, (b, d), jnp.bfloat16)

    def t(name, f, x0, *rest, mult=1):
        dt = bench_op(f, x0, *rest)
        print(f"{name:28s} {dt*1e6:9.2f} us  x{mult:3d} ="
              f" {dt*1e6*mult:9.1f} us", flush=True)
        return dt * mult

    total = 0.0
    # --- per-layer GEMMs (w8 packed) ---
    ridx = {k: jnp.arange(k, dtype=jnp.int32)
            for k in (d, qs, inter)}
    shapes = {"qkv": (qs + 2 * kvs, d), "o": (d, qs),
              "gateup": (2 * inter, d), "down": (d, inter)}
    pws = {}
    for name, (n, k) in shapes.items():
        w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                              jnp.bfloat16) * 0.02
        pws[name] = packing.pack_weight_arc(
            w, jnp.arange(k, dtype=jnp.int32), 0, fmt="w8")
        float(jnp.sum(pws[name].scales[0, :8].astype(jnp.float32)))
        del w
        xa = jnp.zeros((b, pws[name].kq), jnp.bfloat16)
        total += t(f"gemm {name}", lambda xx, pw: gemm.gemm_dequant(
            xx, pw, jnp.float32(1.0)), xa, pws[name], mult=28)

    # --- activation quantize sites ---
    for name, k in (("quant attn_in/mlp_in", d), ("quant o_in", qs)):
        xq = jax.random.normal(key, (b, k), jnp.bfloat16)
        mult = 28 * (2 if k == d else 1)
        # per_row=True matches the engine's act_scale="row" config
        # (without it the dispatch falls to the XLA path the engine
        # no longer uses at decode)
        total += t(f"{name}", lambda xx, r: qk.quantize_x_arc(
            xx, r, 0, kq=packing.pad_kq(k, 0), per_row=True)[0], xq,
            jnp.arange(k, dtype=jnp.int32), mult=mult)
    # down_in goes through the FUSED silu-mul quantize in the engine
    # (engine.py _mlp) — time that, not the plain site (the plain
    # kernel is 2 us here while the silu_mul mode costs what the
    # engine actually pays)
    gu = jax.random.normal(key, (b, 2 * inter), jnp.bfloat16)
    total += t("quant down_in (silu-gu)",
               lambda g, r: qk.silu_mul_quantize_gu(
                   g, r, 0, per_row=True)[0], gu,
               jnp.arange(inter, dtype=jnp.int32), mult=28)

    # --- rmsnorm ---
    wn = jnp.ones((d,), jnp.bfloat16)
    total += t("rmsnorm", lambda xx, w: llama.rms_norm(
        xx[:, None], w, cfg.rms_eps)[:, 0], x, wn, mult=56)

    # --- rope ---
    pos = jnp.zeros((b, 1), jnp.int32) + 17
    cos, sin = llama.rope_cos_sin(cfg, pos)
    q4 = jax.random.normal(key, (b, 1, cfg.num_heads, cfg.head_dim),
                           jnp.bfloat16)
    k4 = jax.random.normal(key, (b, 1, cfg.num_kv_heads, cfg.head_dim),
                           jnp.bfloat16)

    def rope_f(q, k4, cos, sin):
        qq, kk = llama.apply_rope(q, k4, cos, sin)
        return qq + jnp.pad(kk, ((0, 0), (0, 0),
                                 (0, q.shape[2] - k4.shape[2]),
                                 (0, 0)))
    total += t("rope(q,k)", rope_f, q4, k4, cos, sin, mult=28)

    # --- KV append + paged decode ---
    ecfg_pages = 4 * (2048 // 128) + 1
    cache = paged.init_cache(cfg.replace(num_layers=1), ecfg_pages, 128)
    pt = 1 + (jnp.arange(4)[:, None] * 16
              + jnp.arange(16)[None, :]).astype(jnp.int32)
    seq_lens = jnp.full((b,), 777, jnp.int32)
    app_pos = seq_lens[:, None]

    # append timed with the cache as the SCAN CARRY so the scatters
    # update in place (a loop-constant cache would force a full pool
    # copy per step and also lets DCE drop the codes scatter)
    v4 = k4 + 1
    import time as _time

    def mk_append_loop(length):
        @jax.jit
        def loop(codes0, params0, k4, v4):
            def body(carry, _):
                cache_l = paged.PagedKVCache((carry[0],), (carry[1],))
                c2 = paged.append_kv(cache_l, 0,
                                     k4.astype(jnp.float32),
                                     v4.astype(jnp.float32), pt,
                                     app_pos)
                return (c2.codes[0], c2.params[0]), None
            (c, p), _ = jax.lax.scan(body, (codes0, params0), None,
                                     length=length)
            return jnp.sum(p) + jnp.sum(c[0, 0, 0].astype(jnp.float32))
        return loop

    l1, l2 = mk_append_loop(64), mk_append_loop(576)
    args = (cache.codes[0], cache.params[0], k4, v4)
    float(l1(*args)); float(l2(*args))
    ts = []
    for _ in range(5):
        t0 = _time.perf_counter(); float(l1(*args))
        t1 = _time.perf_counter(); float(l2(*args))
        t2 = _time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (576 - 64))
    dt = min(ts)
    print(f"{'append_kv':28s} {dt*1e6:9.2f} us  x 28 ="
          f" {dt*1e6*28:9.1f} us", flush=True)
    total += dt * 28

    qd = jax.random.normal(key, (b, cfg.num_heads, cfg.head_dim),
                           jnp.float32)
    total += t("paged_decode", lambda qq: paged_decode(
        qq, cache, 0, pt, seq_lens), qd, mult=28)

    # --- LM head (W4A16 packed) + sampling ---
    emb = jax.random.normal(key, (cfg.vocab_size, d),
                            jnp.bfloat16) * 0.02
    gs_h = jnp.max(jnp.abs(emb)).astype(jnp.float32) / 2688.0
    hidx = jnp.arange(d, dtype=jnp.int32)
    chunks = []
    for i in range(0, cfg.vocab_size, 16384):
        pw = packing.pack_weight_arc(emb[i:i + 16384], hidx, 0,
                                     fmt="w8", global_scale=gs_h)
        float(jnp.sum(pw.scales[0, :8].astype(jnp.float32)))
        chunks.append(pw)
    head_pw = type(chunks[0])(
        codes=jnp.concatenate([c.codes for c in chunks], axis=1),
        scales=jnp.concatenate([c.scales for c in chunks], axis=1),
        global_scale=chunks[0].global_scale, bias=None)
    del chunks, emb
    xh = jnp.zeros((b, head_pw.kq), jnp.bfloat16)
    total += t("lm_head W4A16", lambda xx, pw: gemm.gemm_dequant(
        xx, pw, jnp.float32(1.0), out_dtype=jnp.float32), xh, head_pw,
        mult=1)

    logits = jax.random.normal(key, (b, cfg.vocab_size), jnp.float32)
    total += t("argmax sample", lambda l: jnp.argmax(
        l, -1)[:, None].astype(jnp.float32), logits, mult=1)

    print(f"\ncomponent total: {total*1e3:.2f} ms "
          f"(vs measured full decode step; difference = XLA glue / "
          f"fusion wins / embed)")


if __name__ == "__main__":
    main()
