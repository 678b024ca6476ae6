"""ARCQuant-TPU HTTP serving entry point.

Serve a W4A4-quantized model over HTTP (continuous batching, paged
int4 KV, optional per-request sampling or speculative decode):

  python serve.py --model /path/to/qwen2.5-7b --calib saved/q.npz \
      --port 8000 [--spec_window 4] [--top_k 50]

  curl -s localhost:8000/v1/completions -d \
      '{"prompt": [1,2,3], "max_tokens": 32, "temperature": 0.7}'

A registry name (e.g. qwen2.5-7b, test-tiny) serves dummy random
weights — the perf-model configuration (reference
benchmarks/modeling_arc.py), useful for load testing.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF checkpoint dir, or a registry name "
                    "(dummy weights)")
    ap.add_argument("--calib", default=None,
                    help="calibration .npz (else identity calib)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_seq_len", type=int, default=2048)
    ap.add_argument("--prefill_chunk", type=int, default=512)
    ap.add_argument("--weight_fmt", default="w8",
                    choices=["w4", "w8"])
    ap.add_argument("--prefill_act_bits", type=int, default=16,
                    choices=[0, 4, 16],
                    help="hybrid mode: prefill-phase activation "
                    "precision (16 = W4A16 prefill, W4A4 decode — "
                    "the SERVING default: prefill is MXU-bound on "
                    "v5e (no fp4 MXU) so A4 prefill only adds "
                    "quantize-site cost (0.84x bf16) while A16 "
                    "reaches 0.96x, and A16 strictly removes "
                    "activation quantization noise; accuracy A/B "
                    "results/r5/ppl_tiny_*.log. 0 = same as decode "
                    "= pure W4A4)")
    ap.add_argument("--select_frac", type=float, default=0.125)
    ap.add_argument("--dynamic_pages", action="store_true")
    ap.add_argument("--num_pages", type=int, default=0)
    ap.add_argument("--prefix_sharing", action="store_true")
    ap.add_argument("--spec_window", type=int, default=0,
                    help=">=2 enables greedy speculative decode "
                    "(prompt-lookup drafts)")
    ap.add_argument("--decode_burst", type=int, default=0,
                    help=">=2 decodes N tokens per engine dispatch "
                    "when the queue is empty and all requests are "
                    "greedy (multi-step scheduling)")
    ap.add_argument("--top_k", type=int, default=0,
                    help="static top-k for sampled requests")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (testing)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                     ContinuousBatcher)
    from arcquant_tpu.engine.server import ServingLoop, make_server
    from arcquant_tpu.models import quantized

    use_kernels = jax.default_backend() == "tpu"
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=use_kernels,
                       weight_fmt=args.weight_fmt, act_scale="row",
                       w_scale="channel",
                       prefill_act_bits=args.prefill_act_bits,
                       quantize_lm_head=use_kernels)
    ecfg = EngineConfig(
        max_batch=args.max_batch, max_seq_len=args.max_seq_len,
        num_pages=args.num_pages, dynamic_pages=args.dynamic_pages,
        prefill_chunk=args.prefill_chunk,
        prefix_sharing=args.prefix_sharing)

    tokenizer = None
    if os.path.isdir(args.model):
        from arcquant_tpu.models import hf
        cfg, params = hf.load_hf_params(args.model)
        if args.calib:
            from arcquant_tpu.calib.artifacts import load_calibration
            calib = load_calibration(args.calib)
        else:
            calib = quantized.identity_calib(cfg, args.select_frac)
        try:
            tokenizer = hf.load_tokenizer(args.model)
        except Exception as e:                      # noqa: BLE001
            print(f"no tokenizer ({e}); token-id prompts only",
                  file=sys.stderr)
        eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)
    else:
        cfg = get_model_config(args.model)
        calib = quantized.identity_calib(cfg, args.select_frac)
        print(f"serving DUMMY weights for {args.model} "
              f"({cfg.num_layers} layers)", file=sys.stderr)
        eng = InferenceEngine.dummy(cfg, calib, qcfg, ecfg)

    batcher = ContinuousBatcher(eng, top_k=args.top_k,
                                spec_window=args.spec_window,
                                decode_burst=args.decode_burst)
    loop = ServingLoop(batcher)
    srv = make_server(loop, args.host, args.port, tokenizer)
    mode = ("spec W=%d" % args.spec_window if args.spec_window
            else "burst N=%d" % args.decode_burst if args.decode_burst
            else "plain decode")
    print(f"serving {args.model} on http://{args.host}:{args.port} "
          f"(batch {args.max_batch}, seq {args.max_seq_len}, {mode})",
          file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        loop.shutdown()


if __name__ == "__main__":
    main()
