#!/bin/bash
# Round-5 queue 9 (after queue8): re-run the 3 engine-level megakernel
# tests ON CHIP with the PAGE=128 fix.
set -u
R=/root/repo/results/r5
until grep -q "queue8 COMPLETE" "$R/queue8_status.log" 2>/dev/null; do
  sleep 30
done
SNAP=/tmp/r5repo9
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue9_status.log"; }
status "queue9 begins"
timeout 3600 env ARC_TEST_TPU=1 python -m pytest \
  tests/test_mlp_fused.py -q -k "engine" \
  > "$R/mlp_engine_tests_tpu.log" 2>&1
status "DONE mlp_engine_tests_tpu rc=$?"
status "queue9 COMPLETE"
