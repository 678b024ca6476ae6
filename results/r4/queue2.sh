#!/bin/bash
# Round-4 follow-up queue: waits for queue.sh to finish (the axon
# tunnel serves ONE client at a time — discovered round 4 when a
# concurrent probe got "Unable to initialize backend 'axon'"),
# then runs the diagnosis + autotune steps.
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo

while ! grep -q "QUEUE COMPLETE" "$R/queue_status.log" 2>/dev/null; do
  sleep 60
done

# refresh the snapshot so the follow-ups run the latest committed code
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue2_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1

status() { echo "=== $(date +%H:%M:%S) $*" >> "$R/queue_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name (rc=$?)"
}

# identify the 45.5 ms of prefill layout copies
step prefill_hlo 1800 python -m benchmarks.prefill_hlo --out "$R/prefill_hlo.txt"

# measured fused-vs-DMA table (VERDICT #4), incl. the 4096^2 shape the
# square heuristic mispredicted
step gemm_autotune 2400 python -m benchmarks.gemm_autotune --model qwen2.5-7b --m 32 --shapes 4096x4096

status "QUEUE2 COMPLETE"
