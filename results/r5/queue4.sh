#!/bin/bash
# Round-5 queue 4 (chains after queue2): final confirmations at
# DEFAULTS (megakernel + norm mode + defuse + shipped table), the
# norm-mode on-chip exactness/timing, bench_spec re-book, and the
# final pinned bench.py.
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo4
until grep -q "queue2 COMPLETE" "$R/queue2_status.log" 2>/dev/null; do
  sleep 60
done
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue4_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue4_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue4 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"

step mlp_lab_norm 3000 python -m benchmarks.mlp_lab --ms 4,16

step e2e_28L_final 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_final 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

step bench_spec_r5 2400 python -m benchmarks.bench_spec \
  --model qwen2.5-7b --windows 2,4,8

# second model family at current defaults (r1 booked 21.2 ms/step
# pre-optimization; llama gateup streams at bk=1024 via the table)
step e2e_llama8b 2400 python -m benchmarks.benchmark_e2e \
  --model llama-3.1-8b --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

step bench_r5_final 1500 python bench.py
status "queue4 COMPLETE"
