#!/bin/bash
# Round-4 on-chip measurement queue.
# Runs from a git snapshot (/tmp/r4repo) so live edits in /root/repo
# don't change what is being measured. Logs land in results/r4.
# Heartbeat + exit trap so a dead step is visible (round-3 queue died
# silently after e2e_28L_dma and half the round went unmeasured).
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo
mkdir -p "$R"

rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1

status() { echo "=== $(date +%H:%M:%S) $*" >> "$R/queue_status.log"; }
trap 'status "QUEUE EXITING (trap: $?)"' EXIT
( while true; do date +%H:%M:%S > "$R/heartbeat"; sleep 60; done ) &
HB=$!
trap 'kill $HB 2>/dev/null; status "QUEUE EXITING (trap)"' EXIT

step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name (rc=$?)"
}

# 1-2. THE headline lever: 14L prefill A/B with the landed round-3
# prefill fixes (chunked act-quant, tall-K dispatch, pool-alloc out of
# the timed window). VERDICT r3 next-steps #1.
step e2e_14L_quant 1800 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json
step e2e_14L_bf16  1800 python -m benchmarks.benchmark_e2e --layers 14 --quant BF16 --repeats 5 --json

# 3. Account whatever prefill gap remains.
step prefill_trace 1800 python -m benchmarks.prefill_trace --layers 14

# 4. vmap-on-hardware verification for gemm_dequant_batched +
# the whole MoE stack on the real chip. VERDICT #2.
step moe_tests 2400 env ARC_TEST_TPU=1 python -m pytest tests/test_moe.py -x -q

# 5. qwen1.5-moe w4 e2e (also books the ~7 GB single-chip mem claim).
step moe_e2e 2400 python -m benchmarks.benchmark_e2e --model qwen1.5-moe-a2.7b --weight_fmt w4 --repeats 3 --json

# 6-7. Speculative decoding benchmarks.
step bench_spec 1800 python -m benchmarks.bench_spec --json
step bench_spec_ondevice 1800 python -m benchmarks.bench_spec --ondevice --json

# 8-9. Serving benchmarks (offline + Poisson burst).
step bench_serving 1800 python -m benchmarks.bench_serving
step bench_serving_burst 1800 python -m benchmarks.bench_serving --decode_burst 8

# 10. On-chip spec/sampling tests.
step spec_tests 2400 env ARC_TEST_TPU=1 python -m pytest tests/test_spec.py tests/test_sampling.py -x -q

# 11. Fresh 28L e2e headline.
step e2e_28L 2400 python -m benchmarks.benchmark_e2e --repeats 5 --json

status "QUEUE COMPLETE"
kill $HB 2>/dev/null
