#!/bin/bash
# Round-5 queue 6: qwen1.5-moe with w8 experts (they FIT: ~8.5 GB —
# the speed format was never tried on the MoE family), and a
# post-megakernel decode_profile re-attribution for round 6.
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo6
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue6_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue6 begins"

step e2e_moe_w8 2400 python -m benchmarks.benchmark_e2e \
  --model qwen1.5-moe-a2.7b --weight_fmt w8 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3

step decode_profile_r5 3000 python -m benchmarks.decode_profile
status "queue6 COMPLETE"
