#!/usr/bin/env python
"""Headline benchmark: fused NVFP4 dequant-GEMM vs bf16 GEMM.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol mirrors the reference's kernel latency harness
(kernels/bench.py:13-43: decode-shape GEMM, quantize excluded from
timing). vs_baseline is the speedup over a plain bf16 jnp.dot with the
same logical shape.

De-noising (round-4): single-shot runs wobble ~11% across processes
(chip-state variance — driver 28.78 µs vs builder same-day 25.98 µs in
round 3). The parent process now spawns ARC_BENCH_RUNS (default 3)
child processes, each doing one full measurement, and reports the
per-path MEDIAN. A persistent compilation cache keeps children cheap.

Timing notes (hard-won on this environment):
  - block_until_ready does NOT wait for execution through the axon
    TPU tunnel; only a host fetch of a value does, and one fetch
    round-trip costs ~32 ms. Each measurement therefore runs a long
    serially-dependent scan inside ONE jit and is timed as the
    difference between two scan lengths, which cancels the constant
    dispatch+fetch overhead.
  - Each scan step's input depends on the previous step's FULL output
    (sum-coupled); consuming a single element lets XLA slice the
    whole GEMM away (it can, and does).
"""

import json
import os
import statistics
import subprocess
import sys
import time

_CHILD_ENV = "ARC_BENCH_CHILD"
_RUNS_ENV = "ARC_BENCH_RUNS"


def bench_op(f, x0, *rest, n1=64, n2=576):
    """Per-op latency via two-length scan difference (see module
    docstring)."""
    import jax
    import jax.numpy as jnp

    def mkloop(length):
        @jax.jit
        def loop(x, *rest):
            def body(xc, _):
                y = f(xc, *rest)
                d = (jnp.sum(y.astype(jnp.float32)) * 1e-18).astype(
                    xc.dtype)
                return xc + d, None
            xo, _ = jax.lax.scan(body, x, None, length=length)
            return xo
        return loop

    l1, l2 = mkloop(n1), mkloop(n2)
    float(jnp.sum(l1(x0, *rest)))   # compile + warm
    float(jnp.sum(l2(x0, *rest)))

    def t(loop):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jnp.sum(loop(x0, *rest)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(l2) - t(l1)) / (n2 - n1)


def measure() -> dict:
    """One full measurement pass; returns raw per-path seconds."""
    import jax
    import jax.numpy as jnp

    from arcquant_tpu.quant import packing
    from arcquant_tpu.kernels import autotune, gemm, quantize as qk

    # Pin dispatch to the SHIPPED autotune table: a stale /tmp user
    # table must not make driver and builder runs take different
    # paths (VERDICT r4 next #9 — run-to-run comparability).
    os.environ["ARC_AUTOTUNE_FILE"] = autotune._shipped_table_path()
    autotune.invalidate_cache()

    on_tpu = jax.default_backend() == "tpu"
    # Decode-bound GEMM shape: M small, N=K=4096 (reference
    # kernels/bench.py uses N=K=4096).
    m, n, k = (32, 4096, 4096) if on_tpu else (8, 256, 512)
    ke = 0
    n1, n2 = (64, 576) if on_tpu else (2, 6)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, k),
                          jnp.bfloat16) * 0.02
    ridx = jnp.arange(k, dtype=jnp.int32)

    pw = packing.pack_weight_arc(w, ridx, ke, fmt="w8")
    xa, gx = qk.quantize_x_arc(x, ridx, ke, kq=pw.kq)
    xa = xa.astype(jnp.bfloat16)
    wT = w.T.copy()

    # Report the dispatch decisions the fused path will take so
    # driver/builder numbers are attributable run-to-run.
    blk = autotune.lookup_blocks("w8", m, pw.kq, pw.n)
    blocks = blk if blk is not None else gemm._decode_blocks_w8(
        m, pw.kq, pw.n)
    print(f"dispatch: fused blocks bk={blocks[0]} bn={blocks[1]} "
          f"({'table' if blk else 'heuristic'}), table choice at "
          f"{m}x{pw.kq}x{pw.n} = {autotune.lookup('w8', m, pw.kq, pw.n)}",
          file=sys.stderr)

    # Two production decode paths, bit-exact (tests/test_kernels.py
    # test_dma_stream_matches_fused), selected by ARC_GEMM_DMA_M: the
    # auto-pipelined fused kernel and the manual-DMA-streamed kernel.
    os.environ[gemm._DMA_M_ENV] = "0"
    t_fused = bench_op(
        lambda xx: gemm.gemm_dequant(xx, pw, gx), xa, n1=n1, n2=n2)
    try:
        os.environ[gemm._DMA_M_ENV] = "64"
        t_dma = bench_op(
            lambda xx: gemm.gemm_dequant(xx, pw, gx), xa, n1=n1, n2=n2)
    except Exception as e:                      # noqa: BLE001
        print(f"dma path failed: {type(e).__name__}: {e}"[:200],
              file=sys.stderr)
        t_dma = float("inf")
    finally:
        os.environ[gemm._DMA_M_ENV] = "0"
    t_base = bench_op(
        lambda xx: jnp.dot(xx, wT, preferred_element_type=jnp.float32)
        .astype(jnp.bfloat16), x, n1=n1, n2=n2)
    return {"t_fused": t_fused, "t_dma": t_dma, "t_base": t_base}


def _enable_compile_cache():
    """Persistent compile cache so repeated child processes are cheap."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/arc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass


def _report(t_fused: float, t_dma: float, t_base: float, runs: int):
    print(f"fused {t_fused*1e6:.2f} us, dma {t_dma*1e6:.2f} us, "
          f"bf16 {t_base*1e6:.2f} us (median of {runs})",
          file=sys.stderr)
    t_quant = min(t_fused, t_dma)
    print(json.dumps({
        "metric": "nvfp4_gemm_decode_latency",
        "value": round(t_quant * 1e6, 2),
        "unit": "us",
        "vs_baseline": round(t_base / t_quant, 3),
    }))


def main():
    _enable_compile_cache()
    if os.environ.get(_CHILD_ENV):
        print("CHILD " + json.dumps(measure()))
        return

    runs = int(os.environ.get(_RUNS_ENV, "3"))
    results = []
    for i in range(max(1, runs)):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, _CHILD_ENV: "1"},
                capture_output=True, text=True, timeout=1200)
            for line in p.stdout.splitlines():
                if line.startswith("CHILD "):
                    r = json.loads(line[6:])
                    results.append(r)
                    print(f"run {i}: fused {r['t_fused']*1e6:.2f} "
                          f"dma {r['t_dma']*1e6:.2f} "
                          f"bf16 {r['t_base']*1e6:.2f} us",
                          file=sys.stderr)
                    break
            else:
                print(f"run {i} produced no result; stderr tail: "
                      + p.stderr[-300:], file=sys.stderr)
        except Exception as e:                  # noqa: BLE001
            print(f"run {i} failed: {e}", file=sys.stderr)

    if not results:        # subprocess machinery broken — run inline
        r = measure()
        results = [r]
    med = {k: statistics.median(r[k] for r in results)
           for k in ("t_fused", "t_dma", "t_base")}
    _report(med["t_fused"], med["t_dma"], med["t_base"], len(results))


if __name__ == "__main__":
    main()
