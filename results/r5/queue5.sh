#!/bin/bash
# Round-5 queue 5: hybrid-mode 14L e2e refresh (megakernel era) and
# qwen1.5-moe w4 e2e with the shipped w4 block table (was 42.1
# ms/step on fallback heuristics in r4).
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo5
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue5_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue5_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue5 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"

step e2e_14L_hybrid_r5 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_act_bits 16 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

step e2e_moe_w4_r5 2400 python -m benchmarks.benchmark_e2e \
  --model qwen1.5-moe-a2.7b --weight_fmt w4 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
status "queue5 COMPLETE"
