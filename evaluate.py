#!/usr/bin/env python
"""Accuracy-evaluation entry point — port of the reference's
model/main.py (:47-203) + evaluate.sh: load a model, apply NVFP4+ARC
quantization with calibration artifacts, run WikiText-2-style
perplexity and/or loglikelihood task suites.

Usage:
  python evaluate.py --model <hf_dir | config name> \\
      --calib saved/<name>_calib_wikitext2_max.npz \\
      --quant_type NVFP4 --eval_ppl --seqlen 2048
  python evaluate.py --model test-tiny --eval_ppl \\
      --dataset synthetic --quant_type NVFP4   # air-gapped smoke

Prints `Result,{dataset},{ppl}` like the reference (main.py:173) and
appends to ./results/log_*.log.
"""

import argparse
import datetime
import logging
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--calib", default=None,
                    help="calibration .npz from calibrate.py "
                    "(default: identity calibration, select 12.5%%)")
    ap.add_argument("--quant_type", default="NVFP4",
                    choices=["NVFP4", "MXFP4", "MXFP6", "INT4", "BF16"])
    ap.add_argument("--weight_fmt", default="w8", choices=["w4", "w8"])
    ap.add_argument("--act_bits", type=int, default=4,
                    choices=[4, 16],
                    help="16 = W4A16 weight-only quantization "
                    "(activations exact bf16)")
    ap.add_argument("--act_scale", default="tensor",
                    choices=["tensor", "row"])
    ap.add_argument("--use_kernels", action="store_true",
                    help="packed Pallas kernel path (TPU)")
    ap.add_argument("--kv_cache", action="store_true",
                    help="int4 asym group KV fake quant "
                    "(reference --kv_cache)")
    ap.add_argument("--kv_group_size", type=int, default=64)
    ap.add_argument("--eval_ppl", action="store_true")
    ap.add_argument("--dataset", default="synthetic",
                    choices=["wikitext2", "ptb", "c4", "synthetic"])
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--ntokens", type=int, default=2048 * 16)
    ap.add_argument("--tasks", default="",
                    help="comma-separated loglikelihood tasks "
                    "(see arcquant_tpu/evals/tasks.py)")
    ap.add_argument("--num_fewshot", type=int, default=0,
                    help="n-shot context assembly for --tasks "
                    "(reference runs mmlu with 5)")
    ap.add_argument("--select_frac", type=float, default=0.125,
                    help="ARC fraction when no --calib given")
    ap.add_argument("--lm_eval", default="",
                    help="comma-separated lm-eval-harness task names "
                    "(requires the lm_eval package + an HF model dir; "
                    "reference main.py:177-190 parity — any harness "
                    "task, not just the hand-implemented suite)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.calib import load_calibration
    from arcquant_tpu.evals import eval_ppl, get_token_stream
    from arcquant_tpu.models import llama, quantized

    tok_fn = None
    if os.path.isdir(args.model):
        from arcquant_tpu.models import hf
        cfg, params = hf.load_hf_params(args.model)
        tok_fn = hf.load_tokenizer(args.model).encode
        name = os.path.basename(args.model.rstrip("/"))
    else:
        cfg = get_model_config(args.model)
        params = llama.init_params(cfg, jax.random.PRNGKey(args.seed),
                                   jnp.bfloat16)
        name = args.model

    if args.calib:
        calib = load_calibration(args.calib)
    else:
        calib = quantized.identity_calib(cfg, args.select_frac)

    qcfg = QuantConfig(
        quant_type=args.quant_type, use_kernels=args.use_kernels,
        weight_fmt=args.weight_fmt, act_scale=args.act_scale,
        act_bits=args.act_bits,
        kv_quant=args.kv_cache, kv_group_size=args.kv_group_size)

    os.makedirs("./results", exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    logging.basicConfig(
        filename=f"./results/log_{name}_{stamp}.log",
        level=logging.INFO, format="%(message)s")
    logging.info("args: %s", vars(args))

    if args.quant_type == "BF16":
        qparams, eval_qcfg, eval_calib = params, None, None
    else:
        print("quantizing...", file=sys.stderr)
        qparams = quantized.quantize_model_params(cfg, params, calib,
                                                  qcfg)
        eval_qcfg, eval_calib = qcfg, calib

    if args.eval_ppl:
        stream = get_token_stream(args.dataset, "test", tok_fn,
                                  vocab_size=cfg.vocab_size,
                                  n_tokens=args.ntokens, seed=args.seed)
        ppl = eval_ppl(cfg, qparams, jnp.asarray(stream),
                       seqlen=args.seqlen, qcfg=eval_qcfg,
                       calib=eval_calib)
        print(f"Result,{args.dataset},{ppl}")
        logging.info("Result,%s,%s", args.dataset, ppl)

    if args.lm_eval:
        try:
            import lm_eval
        except ImportError:
            sys.exit("--lm_eval needs the lm_eval package (not in "
                     "this environment); use --tasks for the "
                     "built-in suite")
        from arcquant_tpu.evals.lm_eval_adapter import make_lm
        from arcquant_tpu.models import hf
        tokenizer = hf.load_tokenizer(args.model)
        lm = make_lm(cfg, qparams, eval_calib, eval_qcfg, tokenizer,
                     max_len=args.seqlen)
        res = lm_eval.simple_evaluate(model=lm,
                                      tasks=args.lm_eval.split(","))
        for task, metrics in res["results"].items():
            print(f"LmEval,{task},{metrics}")
            logging.info("LmEval,%s,%s", task, metrics)

    if args.tasks:
        from arcquant_tpu.evals.tasks import evaluate_tasks
        results = evaluate_tasks(
            cfg, qparams, args.tasks.split(","), tok_fn,
            qcfg=eval_qcfg, calib=eval_calib, seed=args.seed,
            num_fewshot=args.num_fewshot)
        for task, acc in results.items():
            print(f"Task,{task},{acc:.4f},shots={args.num_fewshot}")
            logging.info("Task,%s,%.4f,shots=%d", task, acc,
                         args.num_fewshot)


if __name__ == "__main__":
    main()
