#!/bin/bash
# Round-4 queue 7: silu_mul M=4 root-cause lab + retry the m=32
# bench-shape block sweep (queue6's attempt hit a wedged tunnel).
set -u
R=/root/repo/results/r4
cd /root/repo
export PYTHONUNBUFFERED=1 PYTHONPATH=/root/repo
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue7_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
status "queue7 waiting for tunnel"
until probe; do sleep 45; done
status "TUNNEL ALIVE"
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
step silu_lab2 1200 python /tmp/silu_lab2.py
step autotune_m32_bench2 1800 python -m benchmarks.gemm_autotune \
  --model "" --shapes 4096x4096 --m 32 --force
status "queue7 COMPLETE"
