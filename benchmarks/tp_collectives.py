#!/usr/bin/env python
"""Measure what the TP engine CLAIMS (round-2 VERDICT weak #9):

  --exp count   (any backend): build the dp x tp engine on the mesh,
                lower one decode step, and COUNT the collectives in
                the compiled HLO (all-reduce / all-gather / permute),
                with psum payload bytes per step. No more unmeasured
                "overlap" assertions — this is the communication bill.
  --exp overhead (TPU): time the SAME model through the plain engine
                vs tp=1-via-shard_map — bounds the shard_map/jit
                plumbing overhead separately from real ICI cost
                (single-chip hardware cannot measure ICI).

Results land in BASELINE.md's TP communication table.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(model: str, layers: int, mesh, batch: int, quant_head=False):
    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import EngineConfig
    from arcquant_tpu.models import llama, quantized
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    cfg = get_model_config(model)
    if layers:
        cfg = cfg.replace(num_layers=layers)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel",
                       quantize_lm_head=quant_head)
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               jnp.float32)
    ecfg = EngineConfig(max_batch=batch, max_seq_len=64, page_size=16)
    eng = TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh)
    return cfg, eng


def exp_count(args):
    from arcquant_tpu.parallel import make_mesh
    n = len(jax.devices())
    tp = args.tp or (2 if n >= 2 else 1)
    dp = max(1, min(args.dp or n // tp, n // tp))
    mesh = make_mesh(dp=dp, tp=tp)
    cfg, eng = build(args.model, args.layers, mesh, batch=2 * dp)
    state = eng.new_state()
    toks = jnp.zeros((2 * dp,), jnp.int32)
    act = jnp.ones((2 * dp,), bool)

    # trigger tracing/compile of the decode step
    cache, pt, seq_lens = state

    def f(qparams, cache, pt, seq_lens, toks, active):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        body = shard_map(eng._decode_local, mesh=mesh,
                         in_specs=eng._in_specs(),
                         out_specs=(eng._bspec, eng._cache_spec,
                                    eng._bspec),
                         check_vma=False)
        return body(*eng._args(cache, pt, toks, seq_lens, active))

    lowered = jax.jit(f).lower(eng.qparams, cache, pt, seq_lens, toks,
                               act)
    hlo = lowered.compile().as_text()
    counts = {}
    bytes_by_op = {}
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1}
    for op in ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all"):
        # HLO text: `%name = f32[2,32]{1,0} all-reduce(%operand), ...`
        # (result shape AFTER the `=`; shape is the per-shard payload)
        pat = re.compile(
            r"=\s*\(?(\w+)\[([\d,]*)\][^\n]*?\s" + op +
            r"(?:-start)?\(")
        hits = pat.findall(hlo)
        counts[op] = len(hits)
        total = 0
        for dt, dims in hits:
            elems = int(np.prod([int(d) for d in dims.split(",") if d]
                                or [1]))
            total += elems * dt_bytes.get(dt, 4)
        bytes_by_op[op] = total
    print(f"mesh dp={dp} tp={tp}, {cfg.num_layers} layers, "
          f"batch {2 * dp}")
    for op in counts:
        print(f"  {op:20s} x{counts[op]:4d}   "
              f"{bytes_by_op[op] / 1e6:8.3f} MB/step")
    l = cfg.num_layers
    print(f"  expected: 2 psum/layer (o + down) x {l} layers = {2*l} "
          "all-reduces + per-row pmax scale reductions")


def exp_overhead(args):
    """tp=1 shard_map vs plain engine decode (real chip)."""
    import time
    from jax.sharding import Mesh
    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.models import llama, quantized
    from arcquant_tpu.parallel.tp_engine import TPInferenceEngine

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                ("dp", "tp"))
    cfg = get_model_config(args.model)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       act_scale="row", w_scale="channel")
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    params = llama.init_params(cfg, jax.random.PRNGKey(0),
                               jnp.float32)
    ecfg = EngineConfig(max_batch=4, max_seq_len=256, page_size=128)

    def run(eng):
        state = eng.new_state()
        toks = jnp.zeros((4, 16), jnp.int32)
        lens = jnp.full((4,), 16, jnp.int32)
        _, state = eng.prefill(state, toks, lens)
        first = jnp.zeros((4,), jnp.int32)
        act = jnp.ones((4,), bool)
        # warm
        o, st = eng.decode_scan(state, first, act, num_steps=8)
        float(jnp.sum(o))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o, st = eng.decode_scan(st, first, act, num_steps=64)
            float(jnp.sum(o))
            ts.append(time.perf_counter() - t0)
        return min(ts) / 64 * 1e3

    plain = run(InferenceEngine(cfg, params, calib, qcfg, ecfg))
    tp1 = run(TPInferenceEngine(cfg, params, calib, qcfg, ecfg, mesh))
    print(f"{cfg.num_layers} layers decode ms/step: plain {plain:.3f} "
          f"vs tp=1 shard_map {tp1:.3f} "
          f"(shard_map overhead {tp1 - plain:+.3f} ms)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="count",
                    choices=["count", "overhead"])
    ap.add_argument("--model", default="test-tiny")
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--tp", type=int, default=0)
    ap.add_argument("--dp", type=int, default=0)
    ap.add_argument("--platform", default="",
                    help="force a jax platform (the axon plugin "
                    "ignores the JAX_PLATFORMS env var; 'cpu' + "
                    "--xla_force_host_platform_device_count=8 gives "
                    "the virtual mesh)")
    args = ap.parse_args()
    if args.exp == "count" and not args.platform:
        # HLO counting needs no real chip — default to the host
        # platform so a wedged TPU tunnel can't hang the count
        args.platform = "cpu"
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.exp == "count":
        exp_count(args)
    else:
        exp_overhead(args)


if __name__ == "__main__":
    main()
