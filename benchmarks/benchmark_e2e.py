#!/usr/bin/env python
"""End-to-end serving benchmark: prefill / decode / e2e latency and
throughput for the quantized engine.

Port of the reference protocol (benchmarks/benchmark_e2e_arc.py:
80-166, 202-237): named model config with dummy weights, batch
prefill then N decode steps, warmup + timed repeats, mean ± 1.96σ ms,
peak memory. Defaults mirror the reference README example
(qwen2.5-7b, bs=4, prefill 1024; README.md:72).

Timing uses a host fetch to force execution (block_until_ready does
not wait through the axon tunnel — see bench.py docstring); the
~32 ms round-trip is measured and subtracted.

Usage:
  python benchmarks/benchmark_e2e.py --model qwen2.5-7b \\
      --batch_size 4 --prefill_seq_len 1024 --decode_steps 128
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x) -> float:
    """Force execution + device->host round trip."""
    return float(jnp.sum(x.astype(jnp.float32) if hasattr(x, "astype")
                         else x))


def measure_roundtrip() -> float:
    s = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1)
    fetch(f(s))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(f(s))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def stats(samples, rt):
    xs = np.asarray(samples) - rt
    mean = float(xs.mean() * 1e3)
    ci = float(1.96 * xs.std() * 1e3)
    return mean, ci


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--prefill_seq_len", type=int, default=1024)
    ap.add_argument("--decode_steps", type=int, default=128)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--weight_fmt", default="w8", choices=["w4", "w8"])
    ap.add_argument("--act_bits", type=int, default=4,
                    choices=[4, 16],
                    help="16 = W4A16 (weight-only; skips the "
                    "activation-quantize sites)")
    ap.add_argument("--prefill_act_bits", type=int, default=0,
                    choices=[0, 4, 16],
                    help="hybrid serving mode: activation precision "
                    "for the PREFILL phase only (0 = same as "
                    "act_bits; 16 = W4A16 prefill + W4A4 decode)")
    ap.add_argument("--quant", default="NVFP4",
                    choices=["NVFP4", "BF16"],
                    help="BF16 runs the unquantized engine (baseline)")
    import argparse as _ap
    ap.add_argument("--quant_head", default=True,
                    action=_ap.BooleanOptionalAction,
                    help="quantize the LM head (W4A16; default on — "
                    "the bf16 head alone costs ~1.3 ms/step at 152k "
                    "vocab; --no-quant_head for the bf16 head)")
    ap.add_argument("--select_frac", type=float, default=0.0,
                    help="ARC outlier fraction (calibration-free runs)")
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = model default)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.models import quantized

    cfg = get_model_config(args.model)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    qcfg = QuantConfig(quant_type=args.quant, use_kernels=True,
                       weight_fmt=args.weight_fmt, act_scale="row",
                       w_scale="channel", act_bits=args.act_bits,
                       prefill_act_bits=args.prefill_act_bits,
                       quantize_lm_head=args.quant_head)
    calib = quantized.identity_calib(cfg, select_frac=args.select_frac)
    max_seq = args.prefill_seq_len + args.decode_steps + 8
    ecfg = EngineConfig(max_batch=args.batch_size,
                        max_seq_len=max_seq)
    print(f"building dummy {args.model} ({cfg.num_layers} layers, "
          f"{args.quant}/{args.weight_fmt})...", file=sys.stderr)
    eng = InferenceEngine.dummy(cfg, calib, qcfg, ecfg)

    b, t = args.batch_size, args.prefill_seq_len
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t)),
        jnp.int32)
    lens = jnp.full((b,), t, jnp.int32)
    dec_toks = jnp.ones((b,), jnp.int32)
    active = jnp.ones((b,), bool)

    rt = measure_roundtrip()

    def run_prefill(state=None):
        # pool allocation (new_state: ~30 dispatches + zero fills) is
        # a once-at-startup cost in real serving — keep it OUT of the
        # timed region (pass a pre-built, fetched state)
        if state is None:
            state = eng.new_state()
        logits, state = eng.prefill(state, toks, lens)
        return logits, state

    def run_decode(state, n):
        # fully on-device loop: scan over steps with greedy sampling
        # inside (serving-honest: each step consumes the sampled token)
        toks_out, state = eng.decode_scan(state, dec_toks, active, n)
        return toks_out, state

    # warmup / compile — MUST use the same decode_steps as the timed
    # runs (the decode scan compiles per step-count)
    for _ in range(args.warmup):
        logits, state = run_prefill()
        logits, state = run_decode(state, args.decode_steps)
        fetch(logits)

    prefill_ts, decode_ts, e2e_ts = [], [], []
    for _ in range(args.repeats):
        state0 = eng.new_state()
        fetch(state0[2])            # materialize before the clock starts
        t0 = time.perf_counter()
        logits, state = run_prefill(state0)
        fetch(logits)
        t1 = time.perf_counter()
        logits, state = run_decode(state, args.decode_steps)
        fetch(logits)
        t2 = time.perf_counter()
        prefill_ts.append(t1 - t0)
        decode_ts.append(t2 - t1)
        e2e_ts.append(t2 - t0)

    pre_m, pre_c = stats(prefill_ts, rt)
    dec_m, dec_c = stats(decode_ts, rt)
    e2e_m, e2e_c = stats(e2e_ts, 2 * rt)
    per_step = dec_m / args.decode_steps
    toks_per_s = args.batch_size * args.decode_steps / (dec_m / 1e3)

    # memory_stats() is None through the axon tunnel — fall back to
    # live-buffer accounting (weights + KV pool + state; lower bound
    # on allocator peak). Reference: benchmark_e2e_arc.py:106-111.
    from arcquant_tpu.utils.mem import device_mem_gb
    mem_gb = device_mem_gb()

    if args.json:
        print(json.dumps({
            "model": args.model, "batch": b, "prefill": t,
            "decode_steps": args.decode_steps,
            "prefill_ms": round(pre_m, 2),
            "decode_ms_total": round(dec_m, 2),
            "decode_ms_per_step": round(per_step, 3),
            "decode_tokens_per_s": round(toks_per_s, 1),
            "e2e_ms": round(e2e_m, 2),
            "peak_mem_gb": round(mem_gb, 2) if mem_gb else None,
        }))
    else:
        print(f"Prefill time: {pre_m:.2f} ms ± {pre_c:.2f}")
        print(f"Decode time ({args.decode_steps} steps): "
              f"{dec_m:.2f} ms ± {dec_c:.2f} "
              f"({per_step:.2f} ms/step, {toks_per_s:.0f} tok/s)")
        print(f"E2E time: {e2e_m:.2f} ms ± {e2e_c:.2f}")
        if mem_gb:
            print(f"Peak memory: {mem_gb:.2f} GB (live-buffer)")


if __name__ == "__main__":
    main()
