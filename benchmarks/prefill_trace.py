#!/usr/bin/env python
"""Capture a profiler trace of ONE engine prefill (qwen2.5-7b, 14
layers, bs=4 x 1024) and print the per-op device-time table — the
full accounting of the e2e prefill measurement that the component
profile (prefill_profile.py) cannot see (KV appends, rope, layout
copies, scheduling stalls).

  python -m benchmarks.prefill_trace [--quant BF16] [--layers 14]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="NVFP4",
                    choices=["NVFP4", "BF16"])
    ap.add_argument("--layers", type=int, default=14)
    ap.add_argument("--out", default="/tmp/arcquant_prefill_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.models import quantized

    cfg = get_model_config("qwen2.5-7b").replace(num_layers=args.layers)
    qcfg = QuantConfig(quant_type=args.quant, use_kernels=True,
                       weight_fmt="w8", act_scale="row",
                       w_scale="channel", quantize_lm_head=True)
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    b, t = 4, 1024
    ecfg = EngineConfig(max_batch=b, max_seq_len=t + 136)
    eng = InferenceEngine.dummy(cfg, calib, qcfg, ecfg)

    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t)),
        jnp.int32)
    lens = jnp.full((b,), t, jnp.int32)

    # warm (compile) outside the trace
    state = eng.new_state()
    logits, _ = eng.prefill(state, toks, lens)
    float(jnp.sum(logits))

    state = eng.new_state()
    float(jnp.sum(state[2].astype(jnp.float32)))
    jax.profiler.start_trace(args.out)
    logits, _ = eng.prefill(state, toks, lens)
    float(jnp.sum(logits))
    jax.profiler.stop_trace()

    from benchmarks import trace_summary
    sys.argv = ["trace_summary", args.out, "--top", str(args.top)]
    trace_summary.main()


if __name__ == "__main__":
    main()
