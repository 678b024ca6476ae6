#!/bin/bash
# Round-4 queue 10 (continuation session): silu-gu M=4 root-cause lab,
# then e2e confirmation of the de-fused dispatch via the env flag
# (ARC_SILU_GU_DEFUSE_M=16) — no code change needed to A/B; the
# default flips in code only if these logs show a win.
# repeats=1 to fit the tunnel window before the driver's round-end
# bench (booked repeats=3 numbers stay the comparison baseline).
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo10
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
# no PYTHONPATH (breaks axon registration); cwd resolves modules
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue10_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
status "queue10 waiting for tunnel (HEAD=$(git -C /root/repo rev-parse --short HEAD))"
until probe; do sleep 20; done
status "TUNNEL ALIVE"
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
step silu_m4_lab 700 python -m benchmarks.silu_m4_lab
step e2e_14L_defuse 800 env ARC_SILU_GU_DEFUSE_M=16 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 1
step e2e_28L_defuse 600 env ARC_SILU_GU_DEFUSE_M=16 \
  python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 1
status "queue10 COMPLETE"
