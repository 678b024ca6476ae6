#!/bin/bash
# Round-4 queue 6: measured fused-GEMM block shapes + M=4 silu_mul
# root-cause lab.
#   1. silu_lab2: isolate why silu_mul actq at M=4 costs 37 us
#      (exp? two-view DMA? aliased operand?) vs 2.1 us plain.
#   2. gemm_autotune --force at m=4 (decode bucket 16) with the block
#      sweep (gemm.fused_block_candidates) + the W4A16 lm_head shape.
#   3. same at m=32 for the bench.py headline shape 4096x4096.
#   4. merge /tmp/arc_gemm_autotune.json into the shipped v5e table.
set -u
R=/root/repo/results/r4
cd /root/repo
export PYTHONUNBUFFERED=1
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue6_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }

status "queue6 waiting for tunnel"
until probe; do sleep 45; status "probe: busy"; done
status "TUNNEL ALIVE - starting"

step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}

step silu_lab2 900 python /tmp/silu_lab2.py
step autotune_m4_blocks 3000 python -m benchmarks.gemm_autotune \
  --model qwen2.5-7b --m 4 --force --head
step autotune_m32_bench 1500 python -m benchmarks.gemm_autotune \
  --model "" --shapes 4096x4096 --m 32 --force

python - <<'EOF' >> "$R/queue6_status.log" 2>&1
import json
src = json.load(open('/tmp/arc_gemm_autotune.json'))
p = '/root/repo/arcquant_tpu/kernels/autotune_tables/tpu_v5_lite.json'
dst = json.load(open(p))
dst.update(src)
json.dump(dst, open(p, 'w'), indent=1, sort_keys=True)
print('merged', len(src), 'entries into shipped table')
EOF
status "queue6 COMPLETE"
