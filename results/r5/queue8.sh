#!/bin/bash
# Round-5 queue 8: ON-CHIP spec + sampling + megakernel test files —
# token-identity and bit-exactness on real hardware with every
# round-5 kernel default active (r4 booked 26/26 with the old
# kernels; the decode path changed substantially since).
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo8
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue8_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue8_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue8 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"

step mlp_tests_tpu 3600 env ARC_TEST_TPU=1 python -m pytest \
  tests/test_mlp_fused.py -q
step spec_tests_tpu 3600 env ARC_TEST_TPU=1 python -m pytest \
  tests/test_spec.py tests/test_sampling.py -q
status "queue8 COMPLETE"
