#!/bin/bash
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo11
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue11_status.log"; }
status "queue11 begins"
timeout 2700 env ARC_TEST_TPU=1 python -m pytest \
  tests/test_mlp_fused.py -q -k "engine" \
  > "$R/mlp_engine_tests_tpu3.log" 2>&1
status "DONE rc=$?"
status "queue11 COMPLETE"
