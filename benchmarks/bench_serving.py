"""Continuous-batching serving benchmark (vLLM benchmark_serving
analog; the reference has only the fixed-batch lockstep loop,
benchmarks/benchmark_e2e_arc.py:134-166).

Drives the ContinuousBatcher with a stream of requests — offline
(all submitted up front) or Poisson arrivals — and reports output
tokens/s, TTFT, and request-latency percentiles as one JSON line.

  python benchmarks/bench_serving.py --model qwen2.5-7b \
      --max_batch 8 --requests 32 --prompt_len 256 --max_new 64 \
      [--arrival_rate 4] [--spec_window 4] [--dynamic_pages]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p / 100 * len(xs)))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--prompt_len", type=int, default=256,
                    help="fixed prompt length (one prefill compile)")
    ap.add_argument("--max_new", type=int, default=64)
    ap.add_argument("--arrival_rate", type=float, default=0.0,
                    help="requests/s Poisson arrivals; 0 = offline "
                    "(all submitted up front)")
    ap.add_argument("--spec_window", type=int, default=0)
    ap.add_argument("--decode_burst", type=int, default=0)
    ap.add_argument("--dynamic_pages", action="store_true")
    ap.add_argument("--weight_fmt", default="w8")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                     ContinuousBatcher, Request)
    from arcquant_tpu.models import quantized

    cfg = get_model_config(args.model)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    use_kernels = jax.default_backend() == "tpu"
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=use_kernels,
                       weight_fmt=args.weight_fmt, act_scale="row",
                       w_scale="channel",
                       quantize_lm_head=use_kernels)
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    max_seq = args.prompt_len + args.max_new + \
        max(args.spec_window, 1) + 8
    ecfg = EngineConfig(max_batch=args.max_batch, max_seq_len=max_seq,
                        dynamic_pages=args.dynamic_pages)
    print(f"building dummy {args.model} ({cfg.num_layers} layers)...",
          file=sys.stderr)
    eng = InferenceEngine.dummy(cfg, calib, qcfg, ecfg)
    rng = np.random.RandomState(args.seed)

    def make_requests():
        return [Request(prompt=rng.randint(
            1, cfg.vocab_size, size=args.prompt_len).tolist(),
            max_new_tokens=args.max_new)
            for _ in range(args.requests)]

    def run(reqs, arrivals):
        bt = ContinuousBatcher(eng, spec_window=args.spec_window,
                               decode_burst=args.decode_burst)
        t0 = time.perf_counter()
        i = 0
        while i < len(reqs) or bt.queue or any(
                s is not None for s in bt.slots):
            now = time.perf_counter() - t0
            while i < len(reqs) and arrivals[i] <= now:
                bt.submit(reqs[i])
                i += 1
            if bt.queue or any(s is not None for s in bt.slots):
                bt.step()
            else:
                time.sleep(0.001)
        return time.perf_counter() - t0, bt

    # warmup: compile prefill + both decode paths (per-step while a
    # queue backlog exists, burst/spec once it drains)
    warm = [Request(prompt=rng.randint(
        1, cfg.vocab_size, size=args.prompt_len).tolist(),
        max_new_tokens=4) for _ in range(args.max_batch + 1)]
    run(warm, [0.0] * len(warm))

    reqs = make_requests()
    if args.arrival_rate > 0:
        gaps = rng.exponential(1.0 / args.arrival_rate,
                               size=len(reqs))
        arrivals = np.cumsum(gaps).tolist()
    else:
        arrivals = [0.0] * len(reqs)
    wall, bt = run(reqs, arrivals)

    out_tokens = sum(len(r.output) for r in reqs)
    ttfts = [r.t_first - r.t_submit for r in reqs
             if r.t_first is not None]
    lats = [r.t_done - r.t_submit for r in reqs
            if r.t_done is not None]
    result = {
        "model": args.model, "layers": cfg.num_layers,
        "max_batch": args.max_batch, "requests": args.requests,
        "prompt_len": args.prompt_len, "max_new": args.max_new,
        "arrival_rate": args.arrival_rate,
        "spec_window": args.spec_window,
        "decode_burst": args.decode_burst,
        "wall_s": round(wall, 2),
        "output_tokens_per_s": round(out_tokens / wall, 1),
        "ttft_p50_s": round(pct(ttfts, 50), 3),
        "ttft_p95_s": round(pct(ttfts, 95), 3),
        "latency_p50_s": round(pct(lats, 50), 3),
        "latency_p95_s": round(pct(lats, 95), 3),
    }
    if args.spec_window:
        result["spec"] = dict(bt.spec_stats)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
