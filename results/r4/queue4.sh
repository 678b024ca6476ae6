#!/bin/bash
# Round-4 queue 4: diagnose the decode regression (11.99 -> 13.61
# ms/step between queue1 and queue3 snapshots), measure the rmsnorm
# fusion, tune remaining batch buckets, retry fixed MoE tests.
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo

rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue4_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1

status() { echo "=== $(date +%H:%M:%S) $*" >> "$R/queue_status.log"; }
trap 'status "QUEUE4 EXITING (trap)"' EXIT
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name (rc=$?)"
}

# decode component budget at HEAD — compare against the BASELINE.md
# round-3 table to locate the regression
step decode_profile 2400 python -m benchmarks.decode_profile

# 14L A/B at HEAD (rmsnorm fusion + shipped autotune table)
step e2e_14L_quant4 1800 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json
step e2e_14L_bf16_4 1800 python -m benchmarks.benchmark_e2e --layers 14 --quant BF16 --repeats 5 --json
step e2e_28L_4 2400 python -m benchmarks.benchmark_e2e --repeats 5 --json
step prefill_trace4 1800 python -m benchmarks.prefill_trace --layers 14

# decode A/B at the queue1 snapshot commit (regression bisect
# control: same chip session, old code)
OLD=/tmp/r4old
rm -rf "$OLD"; mkdir -p "$OLD"
git -C /root/repo archive fca1482 | tar -x -C "$OLD"
cd "$OLD"
step e2e_14L_quant_old 1800 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json
cd "$SNAP"

# autotune the decode batch buckets the shipped table lacks
step gemm_autotune_m16 1800 python -m benchmarks.gemm_autotune --model qwen2.5-7b --m 4
step gemm_autotune_m64 1800 python -m benchmarks.gemm_autotune --model qwen2.5-7b --m 64

# fixed MoE tests on-chip (full run)
step moe_tests_3 2700 env ARC_TEST_TPU=1 python -m pytest tests/test_moe.py -q

status "QUEUE4 COMPLETE"
