#!/bin/bash
# Round-5 queue 10: the 3 engine-level megakernel tests on chip with
# the cosine-bound contract.
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo10
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue10_status.log"; }
status "queue10 begins"
timeout 3000 env ARC_TEST_TPU=1 python -m pytest \
  tests/test_mlp_fused.py -q -k "engine" \
  > "$R/mlp_engine_tests_tpu2.log" 2>&1
status "DONE rc=$?"
status "queue10 COMPLETE"
