#!/bin/bash
# Round-5 queue 3 (chains after queue2): MLP megakernel on-chip A/B.
# mlp_lab first (bit-exactness cross-check + microbench — fast Mosaic
# lowering failure signal), then 28L/14L decode e2e with the flag on,
# then bench.py with the dispatch pinning (VERDICT #9 sanity).
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo3
until grep -q "queue1 COMPLETE" "$R/queue1_status.log" 2>/dev/null; do
  sleep 60
done
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue3_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue3_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue3 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"

step mlp_lab 2400 python -m benchmarks.mlp_lab --ms 4,16

step e2e_28L_mega 1500 env ARC_MLP_FUSED_M=16 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_mega 1500 env ARC_MLP_FUSED_M=16 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

step bench_r5_pinned 1500 python bench.py
status "queue3 COMPLETE"
