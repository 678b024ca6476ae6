#!/usr/bin/env python
"""Dump the compiled HLO of a 1-layer engine prefill and summarize
the `copy` instructions by shape — the tool that identifies XLA
layout-conversion copies (round-4 prefill trace: 45.5 ms of the 14L
prefill is `copy.*` ops).

  python -m benchmarks.prefill_hlo [--quant BF16] [--out FILE]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def summarize_copies(txt: str, top: int = 40):
    """Aggregate `x = shape copy(...)` instructions by shape."""
    sizes = collections.Counter()
    pat = re.compile(r"=\s*([a-z0-9]+\[[0-9,]*\][^ ]*)\s+copy\(")
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            sizes[m.group(1)] += 1
    out = []
    for shape, cnt in sizes.most_common(top):
        m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape)
        nbytes = 0
        if m:
            dt = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
                  "u8": 1, "s16": 2, "u16": 2, "pred": 1,
                  "f8e4m3fn": 1}.get(m.group(1), 4)
            n = 1
            for d in filter(None, m.group(2).split(",")):
                n *= int(d)
            nbytes = n * dt
        out.append((cnt, shape, nbytes))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="NVFP4",
                    choices=["NVFP4", "BF16"])
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--out", default="/tmp/prefill_hlo.txt")
    args = ap.parse_args()

    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.engine.engine import _xla_options
    from arcquant_tpu.models import quantized

    cfg = get_model_config("qwen2.5-7b").replace(
        num_layers=args.layers)
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
    cache, pt, _ = eng.new_state()

    def f(qparams, cache, pt, tokens, lens):
        return eng._prefill_forward(qparams, cache, pt, tokens, lens)

    txt = (jax.jit(f, donate_argnums=(1,),
                   compiler_options=_xla_options())
           .lower(eng.qparams, cache, pt, toks, lens)
           .compile().as_text())
    with open(args.out, "w") as fh:
        fh.write(txt)
    total_b = 0
    for cnt, shape, nbytes in summarize_copies(txt):
        total_b += cnt * nbytes
        print(f"{cnt:4d} x {shape:60s} {cnt * nbytes / 2**20:8.1f} MiB")
    print(f"total copied: {total_b / 2**20:.1f} MiB "
          f"(~{total_b / 819e9 * 1e6:.0f} us at 819 GB/s)")
    print(f"hlo: {args.out}")


if __name__ == "__main__":
    main()
