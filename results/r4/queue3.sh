#!/bin/bash
# Round-4 queue 3: measure the fused Pallas act-quantize kernel
# (prefill headline A/B), retry the four fixed failures, re-tune the
# GEMM table with trustworthy scan lengths.
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo

rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue3_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1

status() { echo "=== $(date +%H:%M:%S) $*" >> "$R/queue_status.log"; }
trap 'status "QUEUE3 EXITING (trap)"' EXIT
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name (rc=$?)"
}

# per-site Pallas-vs-XLA act-quantize A/B (the round's kernel)
step actq_lab 2400 python -m benchmarks.quantize_lab

# THE headline: 14L prefill A/B with the fused act-quantize
step e2e_14L_quant3 1800 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json
step e2e_14L_bf16_3 1800 python -m benchmarks.benchmark_e2e --layers 14 --quant BF16 --repeats 5 --json
step prefill_trace3 1800 python -m benchmarks.prefill_trace --layers 14

# fresh 28L headline
step e2e_28L_3 2400 python -m benchmarks.benchmark_e2e --repeats 5 --json

# retries of the four round-4 fixes
step moe_e2e_2 2400 python -m benchmarks.benchmark_e2e --model qwen1.5-moe-a2.7b --weight_fmt w4 --repeats 3 --json
step moe_tests_2 2400 env ARC_TEST_TPU=1 python -m pytest tests/test_moe.py -q
step spec_tests_2 2400 env ARC_TEST_TPU=1 python -m pytest tests/test_spec.py tests/test_sampling.py -q
step bench_spec_2 2400 python -m benchmarks.bench_spec --json
step bench_spec_ondevice_2 2400 python -m benchmarks.bench_spec --ondevice --json

# trustworthy autotune table (bench.py scan lengths) + cross-check
step gemm_autotune_2 2400 python -m benchmarks.gemm_autotune --model qwen2.5-7b --m 32 --shapes 4096x4096
step dmaprod 1500 python -m benchmarks.gemm_lab --exp dmaprod

status "QUEUE3 COMPLETE"
