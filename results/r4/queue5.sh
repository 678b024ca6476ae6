#!/bin/bash
# Round-4 queue 5: decode-regression hypothesis tests.
#   H1: product-space encode made the XLA decode-shape act-quant
#       slower (old-snapshot A/B at M=4).
#   H2: the Pallas actq kernel beats the XLA path at decode shapes
#       too (quantize_lab M=4 section; e2e with ARC_ACTQ_PALLAS_M=4).
set -u
R=/root/repo/results/r4
SNAP=/tmp/r4repo
OLD=/tmp/r4old

while ! grep -q "QUEUE4 COMPLETE" "$R/queue_status.log" 2>/dev/null; do
  sleep 60
done

rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
git -C /root/repo rev-parse HEAD > "$R/queue5_commit.txt"
export PYTHONUNBUFFERED=1

status() { echo "=== $(date +%H:%M:%S) $*" >> "$R/queue_status.log"; }
trap 'status "QUEUE5 EXITING (trap)"' EXIT
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name (rc=$?)"
}

cat > /tmp/actq_m4_bench.py <<'EOF'
import jax, jax.numpy as jnp
from arcquant_tpu.kernels import quantize as qk
from arcquant_tpu.utils.timing import bench_op
key = jax.random.PRNGKey(0)
for k in (3584, 18944):
    x = jax.random.normal(key, (4, k), jnp.bfloat16)
    ridx = jnp.arange(k, dtype=jnp.int32)
    dt = bench_op(lambda xx: qk.quantize_x_arc(xx, ridx, 0,
                                               per_row=True)[0], x)
    print(f"M=4 quantize_x K={k}: {dt*1e6:.2f} us", flush=True)
EOF

# H1 control: the SAME microbench on the pre-product-space snapshot
cd "$OLD"
step actq_m4_old 1500 python /tmp/actq_m4_bench.py
cd "$SNAP"
step actq_m4_new 1500 python /tmp/actq_m4_bench.py

# H2: full lab (prefill sites + M=4 pallas-vs-xla section)
step actq_lab2 2400 python -m benchmarks.quantize_lab

# e2e with the kernel extended to decode shapes
step e2e_14L_actq4 1800 env ARC_ACTQ_PALLAS_M=4 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json
step e2e_28L_actq4 2400 env ARC_ACTQ_PALLAS_M=4 python -m benchmarks.benchmark_e2e --repeats 5 --json

# fresh headline with the shipped dispatch table
step bench2 1500 python bench.py

status "QUEUE5 COMPLETE"
