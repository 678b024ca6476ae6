#!/bin/bash
# Round-5 queue 2 (chains after queue1): prefill attack measurements.
# (a) improved prefill_profile: the engine's ACTUAL four actq sites
#     incl. silu-gu fused vs defused at M=4096;
# (b) 14L prefill e2e with the silu-gu defuse forced at ALL M — if
#     XLA folds silu*mul into the gateup conv epilogue, the down_in
#     quantize drops from ~2.34 ms/layer toward ~1 ms/layer;
# (c) hybrid accuracy A/B (VERDICT #1): tinyllama synthetic PPL at
#     act_bits=4 vs act_bits=16 vs BF16 — justifies (or kills) the
#     W4A16-prefill hybrid default;
# (d) Poisson-arrival serving (VERDICT #6): 3 rates around the
#     measured 134 tok/s capacity.
set -u
R=/root/repo/results/r5
SNAP=/tmp/r5repo2
until grep -q "queue1b COMPLETE" "$R/queue1b_status.log" 2>/dev/null; do
  sleep 60
done
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue2_commit.txt"
cd "$SNAP"
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue2_status.log"; }
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
status "queue2 begins (HEAD=$(git -C /root/repo rev-parse --short HEAD))"

# (c) hybrid accuracy A/B on the synthetic protocol (random weights,
# fake-quant path; the SAME protocol every BASELINE.md accuracy row
# uses). seqlen/ntokens sized for the 1-core host + tunnel.
step ppl_tiny_a4 2400 python evaluate.py --model tinyllama-1.1b \
  --eval_ppl --dataset synthetic --seqlen 512 --ntokens 8192 \
  --act_bits 4 --act_scale row --select_frac 0.125
step ppl_tiny_a16 2400 python evaluate.py --model tinyllama-1.1b \
  --eval_ppl --dataset synthetic --seqlen 512 --ntokens 8192 \
  --act_bits 16 --act_scale row --select_frac 0.125
step ppl_tiny_bf16 2400 python evaluate.py --model tinyllama-1.1b \
  --eval_ppl --dataset synthetic --seqlen 512 --ntokens 8192 \
  --quant_type BF16

# (d) Poisson-arrival serving at 3 rates. Offline capacity at this
# config = 129.7 out-tok/s / 64 tok/req ~= 2.0 req/s; probe 25%, 50%,
# 90% of capacity.
step serving_poisson_05 2400 python -m benchmarks.bench_serving \
  --model qwen2.5-7b --layers 28 --requests 48 --decode_burst 8 \
  --arrival_rate 0.5
step serving_poisson_10 2400 python -m benchmarks.bench_serving \
  --model qwen2.5-7b --layers 28 --requests 48 --decode_burst 8 \
  --arrival_rate 1.0
step serving_poisson_18 2400 python -m benchmarks.bench_serving \
  --model qwen2.5-7b --layers 28 --requests 48 --decode_burst 8 \
  --arrival_rate 1.8
status "queue2 COMPLETE"
