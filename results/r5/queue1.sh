#!/bin/bash
# Round-5 queue 1: (a) confirm the promoted silu-gu defuse default at
# 28L; (b) verify_lab — attribute the non-monotone spec-verify cost
# (VERDICT #5); (c) noise-robust autotune refresh: reps=5, m=4
# buckets, w4 + llama-3.1-8b coverage incl. the 4096^2 flip-flop and
# the first w4 DMA measurement (VERDICT #3/#4); (d) fresh prefill
# profile + trace pair for the prefill attack (VERDICT #1).
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo1
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue1_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue1_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue1 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"
until probe; do sleep 20; done
status "TUNNEL ALIVE"

# (a) defuse-default confirmation, 28L then 14L A/B refresh
step e2e_28L_r5 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_quant_r5 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_bf16_r5 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 --quant BF16 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

# (b) spec-verify anatomy
step verify_lab 3000 python -m benchmarks.verify_lab --layers 28

# (c) autotune refresh: force re-measure everything with reps=5 into
# a fresh user table (becomes the shipped table if sane)
export ARC_AUTOTUNE_FILE=/tmp/arc_r5_tune.json
step tune_q7b_m4 3600 python -m benchmarks.gemm_autotune \
  --model qwen2.5-7b --m 4 --reps 5 --head --force
step tune_q7b_m16 2400 python -m benchmarks.gemm_autotune \
  --model qwen2.5-7b --m 16 --reps 5 --force
step tune_q7b_m32 2400 python -m benchmarks.gemm_autotune \
  --model qwen2.5-7b --m 32 --shapes 4096x4096 --reps 5 --force
step tune_llama8b_m4 2400 python -m benchmarks.gemm_autotune \
  --model llama-3.1-8b --m 4 --reps 5 --force
step tune_w4_moe_m4 3600 python -m benchmarks.gemm_autotune \
  --model qwen1.5-moe-a2.7b --m 4 --fmt w4 --reps 5 --force
step tune_w4_4096_m32 2400 python -m benchmarks.gemm_autotune \
  --model "" --shapes 4096x4096 --m 32 --fmt w4 --reps 5 --force
cp /tmp/arc_r5_tune.json "$R/tune_r5.json" 2>/dev/null
unset ARC_AUTOTUNE_FILE

# (d) prefill attribution pair at HEAD
step prefill_profile_r5 3000 python -m benchmarks.prefill_profile
step prefill_trace_quant 2400 python -m benchmarks.prefill_trace --layers 14
step prefill_trace_bf16 2400 python -m benchmarks.prefill_trace --layers 14 --quant BF16
status "queue1 COMPLETE"
