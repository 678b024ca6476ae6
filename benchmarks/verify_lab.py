#!/usr/bin/env python
"""Spec-verify cost anatomy: why is verify(W=4) SLOWER than W=8?

results/r4/bench_spec_2.log measured the 28L verify round at
W=4 -> 19.31 ms but W=8 -> 17.67 ms (VERDICT r4 weak #5). The verify
chunk runs M = batch*W token rows through the prefill-chunk forward,
so W=4 is M=16 and W=8 is M=32 — this lab times the full round at
each W AND each per-layer component at the matching M so the
non-monotone term is attributable (GEMM dispatch hole vs actq vs
paged flash-prefill vs head).

Usage: python -m benchmarks.verify_lab [--layers 28] [--windows 2,4,8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--prefill_seq_len", type=int, default=1024)
    ap.add_argument("--windows", default="2,4,8")
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=24)
    args = ap.parse_args()

    from arcquant_tpu.config import QuantConfig, get_model_config
    from arcquant_tpu.engine import EngineConfig, InferenceEngine
    from arcquant_tpu.engine import engine as E
    from arcquant_tpu.kernels import quantize as qk
    from arcquant_tpu.kernels.paged_decode import paged_prefill
    from arcquant_tpu.models import llama, quantized
    from arcquant_tpu.utils.timing import bench_op

    cfg = get_model_config(args.model)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       weight_fmt="w8", act_scale="row",
                       w_scale="channel", quantize_lm_head=True)
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    windows = [int(w) for w in args.windows.split(",")]
    wmax = max(windows)
    b, t = args.batch_size, args.prefill_seq_len
    ecfg = EngineConfig(max_batch=b, max_seq_len=t + wmax + 8)
    print(f"building dummy {args.model} ({cfg.num_layers}L)...",
          file=sys.stderr, flush=True)
    eng = InferenceEngine.dummy(cfg, calib, qcfg, ecfg)

    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t)),
        jnp.int32)
    lens = jnp.full((b,), t, jnp.int32)
    state = eng.new_state()
    _, (cache0, pt, seq_lens) = eng.prefill(state, toks, lens)

    key = jax.random.PRNGKey(0)
    p0 = eng.qparams["layers"][0]
    lc = calib[0]
    d = cfg.hidden_size

    # ---- full verify round per W (bench_spec's loop, fixed lens) ----
    def rounds_loop(w, length):
        @jax.jit
        def loop(qparams, cache, first):
            def body(carry, _):
                cache, tk = carry
                logits, cache = eng._prefill_chunk_forward(
                    qparams, cache, pt, tk, seq_lens + w,
                    seq_lens, all_logits=True)
                return (cache, jnp.argmax(logits, -1)
                        .astype(jnp.int32)), ()
            (cache, tk), _ = jax.lax.scan(body, (cache, first), None,
                                          length=length)
            return cache, tk
        return lambda cache, first: loop(eng.qparams, cache, first)

    def timeit_round(w):
        out = {}
        for name, length in (("l1", args.n1), ("l2", args.n2)):
            loop = rounds_loop(w, length)
            tk0 = jnp.ones((b, w), jnp.int32)
            ts = []
            for r in range(4):
                t0 = time.perf_counter()
                _, tk = loop(cache0, tk0)
                int(jnp.sum(tk))
                ts.append(time.perf_counter() - t0)
            out[name] = min(ts[1:])
        return (out["l2"] - out["l1"]) / (args.n2 - args.n1) * 1e3

    L = cfg.num_layers
    for w in windows:
        m = b * w
        full_ms = timeit_round(w)
        print(f"\n== W={w} (M={m}): full verify round "
              f"{full_ms:8.3f} ms ==", flush=True)

        x2 = jax.random.normal(key, (m, d), jnp.bfloat16)

        def comp(name, f, x0, *rest, mult=L):
            try:
                dt = bench_op(f, x0, *rest, n1=16, n2=80)
            except Exception as e:               # noqa: BLE001
                # keep going on transient tunnel failures (round-5:
                # a remote_compile broken pipe killed the whole lab
                # at the head component)
                print(f"  {name:30s} FAILED: "
                      f"{type(e).__name__}: {e}"[:160], flush=True)
                return 0.0
            print(f"  {name:30s} {dt*1e6:9.2f} us  x{mult:3d} ="
                  f" {dt*1e3*mult:8.3f} ms", flush=True)
            return dt * 1e3 * mult

        tot = 0.0
        # weights ride as bench_op ARGUMENTS — closing over them
        # bakes them into the lowered module as constants and the
        # remote-compile request blows the tunnel's body limit
        # (HTTP 413 on the 545 MB head; r5 queue1 crash)
        # attn in: fused rmsnorm-quantize + qkv GEMM
        tot += comp("normq+qkv", lambda xx, pp: E._attn_common(
            cfg, pp, xx, lc, qcfg, b, w, jnp.bfloat16,
            norm_w=pp["attn_norm"])[0], x2, p0)
        # o: actq + GEMM
        attn2 = jax.random.normal(key, (b, w, cfg.num_heads,
                                        cfg.head_dim), jnp.bfloat16)
        tot += comp("o actq+gemm", lambda aa, pp: E._o_proj(
            cfg, pp, aa, lc, qcfg, b, w), attn2, p0)
        # mlp: normq + gateup GEMM + silu-gu quantize + down GEMM
        x3 = x2.reshape(b, w, d)
        tot += comp("mlp (normq+gu+siluq+down)",
                    lambda xx, pp: E._mlp(cfg, pp, xx, lc, qcfg,
                                          norm_w=pp["mlp_norm"]),
                    x3, p0)
        # rope + paged append + paged flash-prefill
        positions = seq_lens[:, None] + jnp.arange(w)[None, :]
        cos, sin = llama.rope_cos_sin(cfg, positions)
        q0 = jax.random.normal(key, (b, w, cfg.num_heads,
                                     cfg.head_dim), jnp.bfloat16)
        tot += comp("paged_prefill", lambda qq: paged_prefill(
            qq, cache0, 0, pt, seq_lens, seq_lens + w), q0)
        from arcquant_tpu.cache import paged
        k0 = jax.random.normal(key, (b, w, cfg.num_kv_heads,
                                     cfg.head_dim), jnp.bfloat16)
        v0 = k0
        app_pos = positions

        def app(kk):
            c = paged.append_kv(cache0, 0, kk, v0, pt, app_pos)
            # couple through one pool page so the append isn't DCE'd
            return c[0][0][0, 0]
        tot += comp("append_kv", app, k0)
        # head over ALL rows (verify wants all logits)
        tot += comp("head all_logits",
                    lambda xx, qp: eng._head_logits(qp, xx),
                    x2, eng.qparams, mult=1)
        print(f"  component total {tot:8.3f} ms vs full "
              f"{full_ms:8.3f} ms (glue {full_ms - tot:+.3f})",
              flush=True)


if __name__ == "__main__":
    main()
