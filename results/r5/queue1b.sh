#!/bin/bash
# Round-5 queue 1b (reprioritized): megakernel A/B first, then
# prefill attribution, then the remaining autotune + bench.
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo1b
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue1b_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue1b_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue1b begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"
until probe; do sleep 20; done
status "TUNNEL ALIVE"

# --- megakernel A/B (the round's biggest decode lever) ---
step mlp_lab 2400 python -m benchmarks.mlp_lab --ms 4,16
step e2e_28L_mega 1500 env ARC_MLP_FUSED_M=16 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_mega 1500 env ARC_MLP_FUSED_M=16 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

# --- prefill attribution + defuse-at-prefill A/B ---
step prefill_profile_r5b 3600 python -m benchmarks.prefill_profile
step e2e_14L_defuse_all 1500 env ARC_SILU_GU_DEFUSE_M=1073741824 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

# --- spec-verify anatomy (re-run, failure-isolated) ---
step verify_lab_r2 3600 python -m benchmarks.verify_lab --layers 28

# --- remaining autotune (resume /tmp table; reps=5) ---
export ARC_AUTOTUNE_FILE=/tmp/arc_r5_tune.json
step tune_q7b_m4b 5400 python -m benchmarks.gemm_autotune \
  --model qwen2.5-7b --m 4 --reps 5
step tune_q7b_m32f 3600 python -m benchmarks.gemm_autotune \
  --model "" --shapes 4096x4096 --m 32 --reps 5 --force
step tune_llama8b_m4 3600 python -m benchmarks.gemm_autotune \
  --model llama-3.1-8b --m 4 --reps 5
step tune_w4_moe_m4 5400 python -m benchmarks.gemm_autotune \
  --model qwen1.5-moe-a2.7b --m 4 --fmt w4 --reps 5
step tune_w4_4096_m32 3600 python -m benchmarks.gemm_autotune \
  --model "" --shapes 4096x4096 --m 32 --fmt w4 --reps 5
cp /tmp/arc_r5_tune.json "$R/tune_r5.json" 2>/dev/null
unset ARC_AUTOTUNE_FILE

step prefill_trace_quant 2400 python -m benchmarks.prefill_trace --layers 14 --top 100
step prefill_trace_bf16 2400 python -m benchmarks.prefill_trace --layers 14 --quant BF16 --top 100
step bench_r5_pinned 1500 python bench.py
status "queue1b COMPLETE"
