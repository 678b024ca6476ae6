#!/usr/bin/env python
"""Calibration driver — port of the reference's reorder_indices.py
(:19-97): compute per-site activation statistics, channel reorder
indices, and ARC outlier-channel counts, then persist them for the
eval/serving entry points.

Usage:
  python calibrate.py --model <hf_model_dir | config name> \\
      --dataset wikitext2 --samples 128 --seqlen 2048 \\
      --act_sort_metric max --output ./saved

With a config name (e.g. test-tiny) the model gets random weights —
useful for air-gapped smoke runs; with an HF directory the real
checkpoint is loaded (models/hf.py).
"""

import argparse
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF model dir or built-in config name")
    ap.add_argument("--dataset", default="synthetic",
                    choices=["wikitext2", "ptb", "c4", "pile",
                             "humaneval", "synthetic"])
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--act_sort_metric", default="max",
                    choices=["max", "hessian", "score"])
    ap.add_argument("--select_batch", type=int, default=32,
                    help="samples used for outlier-count search "
                    "(reference reorder_indices.py:83)")
    ap.add_argument("--output", default="./saved")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from arcquant_tpu.config import MODEL_CONFIGS, get_model_config
    from arcquant_tpu.calib import compute_calibration, save_calibration
    from arcquant_tpu.evals import get_calib_samples
    from arcquant_tpu.models import llama

    if os.path.isdir(args.model):
        from arcquant_tpu.models import hf
        cfg, params = hf.load_hf_params(args.model)
        tokenizer = hf.load_tokenizer(args.model)
        tok_fn = tokenizer.encode
        name = os.path.basename(args.model.rstrip("/"))
    else:
        cfg = get_model_config(args.model)
        tok_fn = None
        name = args.model
        # big dummy models: a full bf16 7B (15 GB) cannot sit in HBM
        # next to the S x T residual stream, so materialize layers
        # one at a time (compute_calibration streams + frees them)
        if cfg.num_layers * cfg.hidden_size > 16 * 4096:
            keys = jax.random.split(jax.random.PRNGKey(args.seed),
                                    cfg.num_layers + 1)
            params = {
                "embed": jax.random.normal(
                    keys[0], (cfg.vocab_size, cfg.hidden_size),
                    jnp.bfloat16) * 0.02,
                "final_norm": jnp.ones((cfg.hidden_size,),
                                       jnp.bfloat16),
                "layers": lambda li: llama.init_layer_params(
                    cfg, keys[li + 1], jnp.bfloat16),
            }
        else:
            params = llama.init_params(cfg,
                                       jax.random.PRNGKey(args.seed),
                                       jnp.bfloat16)

    tokens = get_calib_samples(args.dataset, tok_fn,
                               nsamples=args.samples,
                               seqlen=args.seqlen,
                               vocab_size=cfg.vocab_size,
                               seed=args.seed)
    print(f"calibrating {name}: {args.samples}x{args.seqlen} tokens "
          f"({args.dataset}), metric={args.act_sort_metric}",
          file=sys.stderr)
    calib, stats, avg_bits = compute_calibration(
        cfg, params, jnp.asarray(tokens),
        metric=args.act_sort_metric,
        select_batch=args.select_batch)

    os.makedirs(args.output, exist_ok=True)
    out = os.path.join(
        args.output,
        f"{name}_calib_{args.dataset}_{args.act_sort_metric}.npz")
    save_calibration(out, calib, meta={
        "model": name, "dataset": args.dataset,
        "metric": args.act_sort_metric, "samples": args.samples,
        "seqlen": args.seqlen, "average_bits": avg_bits})
    print(f"average bits: {avg_bits:.3f}")
    print(f"saved: {out}")


if __name__ == "__main__":
    main()
