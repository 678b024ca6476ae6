"""Speculative-decode benchmark: verify-step cost vs window W.

The decode step is weight-bandwidth bound, so a W-token verify step
costs barely more than a 1-token decode step — the packed weights are
read once either way. This benchmark measures that directly on the
dummy engine (no drafter in the loop: the measured quantity is the
TARGET-side cost per verify round) and reports the implied speedup
  speedup(alpha) = E[tokens/round] * decode_ms / verify_ms(W)
with E[tokens/round] = 1 + alpha*(W-1) (alpha = draft acceptance
rate; greedy spec decode commits a prefix of the drafts + 1 bonus).

Timed like everything else here: two-length serially-dependent scans
(the next round's tokens are the argmax of the previous round's full
logits — XLA cannot slice the forward away), fixed seq_lens so every
round does identical work.

Usage: python benchmarks/bench_spec.py --model qwen2.5-7b \
         --batch_size 4 --prefill_seq_len 1024 --windows 2,4,8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen2.5-7b")
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--prefill_seq_len", type=int, default=1024)
    ap.add_argument("--windows", default="2,4,8")
    ap.add_argument("--layers", type=int, default=0)
    ap.add_argument("--weight_fmt", default="w8")
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=24)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--ondevice", action="store_true",
                    help="ALSO time the fully on-device spec loop "
                    "(generate_ondevice) on a looping workload vs "
                    "the greedy decode_scan — end-to-end tokens/s "
                    "with drafting+acceptance included")
    ap.add_argument("--gen_tokens", type=int, default=128,
                    help="tokens per row for the --ondevice run")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from arcquant_tpu.config import get_model_config, QuantConfig
    from arcquant_tpu.engine import InferenceEngine, EngineConfig
    from arcquant_tpu.models import quantized

    cfg = get_model_config(args.model)
    if args.layers:
        cfg = cfg.replace(num_layers=args.layers)
    qcfg = QuantConfig(quant_type="NVFP4", use_kernels=True,
                       weight_fmt=args.weight_fmt, act_scale="row",
                       w_scale="channel", quantize_lm_head=True)
    calib = quantized.identity_calib(cfg, select_frac=0.0)
    wmax = max(int(w) for w in args.windows.split(","))
    max_seq = args.prefill_seq_len + wmax + 8
    ecfg = EngineConfig(max_batch=args.batch_size, max_seq_len=max_seq)
    print(f"building dummy {args.model} ({cfg.num_layers} layers)...",
          file=sys.stderr)
    eng = InferenceEngine.dummy(cfg, calib, qcfg, ecfg)

    b, t = args.batch_size, args.prefill_seq_len
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, cfg.vocab_size, (b, t)),
        jnp.int32)
    lens = jnp.full((b,), t, jnp.int32)
    state = eng.new_state()
    _, (cache0, pt, seq_lens) = eng.prefill(state, toks, lens)

    def rounds_loop(w, length):
        """`length` serially-dependent verify rounds at FIXED
        seq_lens (same page traffic every round); each round's tokens
        are the previous round's greedy argmax. qparams are jit
        ARGUMENTS — closing over them bakes 8.66 GB of weights into
        the lowered module as constants (round-4 queue: the lowering
        alone blew the step timeout)."""
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

    def decode_loop(length):
        @jax.jit
        def loop(qparams, cache, first):
            def body(carry, _):
                cache, tk = carry
                logits, cache, _ = eng._decode_forward(
                    qparams, cache, pt, seq_lens, tk,
                    jnp.ones((b,), bool))
                return (cache, jnp.argmax(logits, -1)
                        .astype(jnp.int32)), ()
            (cache, tk), _ = jax.lax.scan(body, (cache, first), None,
                                          length=length)
            return cache, tk
        return lambda cache, first: loop(eng.qparams, cache, first)

    def timeit(mk, tk0):
        l1, l2 = mk(args.n1), mk(args.n2)
        out = {}
        for name, loop in (("l1", l1), ("l2", l2)):
            # warm (compile), then best-of-repeats; the fetch forces
            # execution through the tunnel
            ts = []
            for r in range(args.repeats + 1):
                t0 = time.perf_counter()
                _, tk = loop(cache0, tk0)
                int(jnp.sum(tk))
                ts.append(time.perf_counter() - t0)
            out[name] = min(ts[1:])
        return (out["l2"] - out["l1"]) / (args.n2 - args.n1) * 1e3

    dec_ms = timeit(decode_loop, jnp.ones((b,), jnp.int32))
    print(f"decode 1-token step: {dec_ms:.3f} ms", file=sys.stderr)
    results = {"model": args.model, "layers": cfg.num_layers,
               "batch": b, "prefill": t,
               "decode_ms_per_step": round(dec_ms, 3), "windows": {}}
    for wstr in args.windows.split(","):
        w = int(wstr)
        def mk(length, w=w):
            return rounds_loop(w, length)
        v_ms = timeit(mk, jnp.ones((b, w), jnp.int32))
        sp = {f"alpha={a}": round((1 + a * (w - 1)) * dec_ms / v_ms, 2)
              for a in (0.5, 0.8, 1.0)}
        results["windows"][w] = {"verify_ms": round(v_ms, 3),
                                 "vs_decode": round(v_ms / dec_ms, 2),
                                 "speedup": sp}
        print(f"W={w}: verify {v_ms:.3f} ms "
              f"({v_ms / dec_ms:.2f}x decode step), "
              f"speedup {sp}", file=sys.stderr)

    if args.ondevice:
        # end-to-end: on-device spec loop vs the greedy decode scan,
        # on a LOOPING workload (random-weight greedy output cycles,
        # so prompt-lookup drafting gets realistic acceptance)
        from arcquant_tpu.engine import SpeculativeEngine, NgramDrafter
        n_tok = args.gen_tokens
        prompts = [[7 + i, 9, 7 + i, 9] * 2 for i in range(b)]
        eng2 = InferenceEngine(eng.cfg, eng.qparams, eng.calib,
                               eng.qcfg,
                               EngineConfig(max_batch=b,
                                            max_seq_len=max(
                                                n_tok + 32, 256)),
                               quantize_params=False)
        spec = SpeculativeEngine(eng2, NgramDrafter(), window=4)

        def t_ondevice():
            t0 = time.perf_counter()
            out = spec.generate_ondevice(prompts, n_tok)
            dt = time.perf_counter() - t0
            return dt, sum(len(o) for o in out)

        def t_scan():
            toks, lens, _ = eng2._pad_prompts(prompts)
            st = eng2.new_state()
            t0 = time.perf_counter()
            lg, st = eng2.prefill(st, jnp.asarray(toks),
                                  jnp.asarray(lens))
            first = jnp.argmax(lg, -1).astype(jnp.int32)
            tk, st = eng2.decode_scan(st, first,
                                      jnp.ones((b,), bool),
                                      n_tok - 1)
            int(jnp.sum(tk))
            return time.perf_counter() - t0, b * n_tok

        for f in (t_ondevice, t_scan):     # compile
            f()
        od = min(t_ondevice()[0] for _ in range(args.repeats))
        sc = min(t_scan()[0] for _ in range(args.repeats))
        results["ondevice"] = {
            "spec_tokens_per_s": round(b * n_tok / od, 1),
            "scan_tokens_per_s": round(b * n_tok / sc, 1),
            "speedup": round(sc / od, 2),
            "rounds": spec.stats["rounds"]}
        print(f"ondevice spec: {b * n_tok / od:.0f} tok/s vs scan "
              f"{b * n_tok / sc:.0f} tok/s ({sc / od:.2f}x), "
              f"{spec.stats['rounds']} rounds for {n_tok}/row",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
