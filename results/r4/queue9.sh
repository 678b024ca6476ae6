#!/bin/bash
# Round-4 queue 9 (continuation session): re-measure at HEAD
# (6a190ee + ee6c65f — completed autotune dispatch table with measured
# block shapes) since queue7/queue8 never ran (tunnel was down).
# The bf16 e2e side is NOT re-run: those commits only change packed-
# GEMM dispatch, so e2e_14L_bf16_f.log (238.98 ms prefill /
# 10.665 ms/step, repeats=3) remains the HEAD bf16 baseline.
# Runs against a HEAD snapshot in /tmp/r4repo so live edits in
# /root/repo don't skew measurements.
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
# DO NOT set PYTHONPATH: any PYTHONPATH value breaks axon plugin
# registration ("Backend 'axon' is not in the list of known
# backends") in this environment — cwd alone resolves the modules.
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue9_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
status "queue9 v2 waiting for tunnel (HEAD=$(git -C /root/repo rev-parse --short HEAD))"
until probe; do sleep 30; done
status "TUNNEL ALIVE"
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
step bench_head 1200 python bench.py
step e2e_14L_quant_h 1500 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_28L_h 900 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step decode_profile_h 1200 python -m benchmarks.decode_profile
step silu_m4_lab 900 python -m benchmarks.silu_m4_lab
status "queue9 COMPLETE"
