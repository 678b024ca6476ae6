#!/usr/bin/env python
"""Text-generation demo over the quantized serving engine.

Usage:
  python generate.py --model <hf_dir> --prompt "..." --max_new 64
  python generate.py --model test-tiny --tokens 5,17,301 --max_new 8
      (config-name models run with random weights — smoke only)

Uses the paged int4 KV cache + continuous batching; pass --tp N to
shard over N devices (requires N | num_kv_heads).
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--prompt", action="append", default=[],
                    help="text prompt (repeatable; needs an HF model)")
    ap.add_argument("--tokens", action="append", default=[],
                    help="comma-separated token ids (repeatable)")
    ap.add_argument("--max_new", type=int, default=64)
    ap.add_argument("--calib", default=None)
    ap.add_argument("--select_frac", type=float, default=0.125)
    ap.add_argument("--weight_fmt", default="w8", choices=["w4", "w8"])
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--max_seq_len", type=int, default=2048)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.calib import load_calibration
    from arcquant_tpu.engine import (InferenceEngine, EngineConfig,
                                     ContinuousBatcher, Request)
    from arcquant_tpu.models import llama, quantized

    tokenizer = None
    if os.path.isdir(args.model):
        from arcquant_tpu.models import hf
        cfg, params = hf.load_hf_params(args.model)
        tokenizer = hf.load_tokenizer(args.model)
    else:
        cfg = get_model_config(args.model)
        params = llama.init_params(cfg, jax.random.PRNGKey(args.seed),
                                   jnp.bfloat16)

    prompts = []
    for p in args.prompt:
        assert tokenizer is not None, "--prompt requires an HF model dir"
        prompts.append(tokenizer.encode(p))
    for t in args.tokens:
        prompts.append([int(x) for x in t.split(",")])
    if not prompts:
        prompts = [[1, 2, 3]]

    calib = (load_calibration(args.calib) if args.calib
             else quantized.identity_calib(cfg, args.select_frac))
    qcfg = QuantConfig(quant_type="NVFP4",
                       use_kernels=jax.default_backend() == "tpu",
                       weight_fmt=args.weight_fmt,
                       act_scale="row", w_scale="channel")
    ecfg = EngineConfig(max_batch=args.max_batch,
                        max_seq_len=args.max_seq_len)
    if args.tp > 1:
        from arcquant_tpu.parallel import make_mesh
        from arcquant_tpu.parallel.tp_engine import TPInferenceEngine
        mesh = make_mesh(dp=len(jax.devices()) // args.tp, tp=args.tp)
        eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    else:
        eng = InferenceEngine(cfg, params, calib, qcfg, ecfg)

    eos = tokenizer.eos_token_id if tokenizer is not None else None
    bat = ContinuousBatcher(eng)
    reqs = [Request(prompt=p, max_new_tokens=args.max_new, eos_id=eos)
            for p in prompts]
    for r in reqs:
        bat.submit(r)
    bat.run()
    for r in reqs:
        if tokenizer is not None:
            print(f"[{r.request_id}] {tokenizer.decode(r.output)}")
        else:
            print(f"[{r.request_id}] {r.output}")


if __name__ == "__main__":
    main()
