#!/bin/bash
# Round-5 queue 7: attn/o single-GEMM megakernel on-chip exactness +
# A/B, then the 28L/14L e2e rebook with ALL site fusions active.
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo7
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue7_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue7_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue7 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"

step attn_o_lab 2400 python -m benchmarks.attn_o_lab

step e2e_28L_allfused 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_allfused 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
status "queue7 COMPLETE"
