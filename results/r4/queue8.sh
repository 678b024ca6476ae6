#!/bin/bash
# Round-4 queue 8: final re-measurement at HEAD (block-tuned table +
# silu_mul small-M fix): component profile, 14L A/B, 28L e2e, bench,
# on-chip actq parity tests.
set -u
R=/root/repo/results/r4
cd /root/repo
export PYTHONUNBUFFERED=1 PYTHONPATH=/root/repo
status() { echo "$(date +%H:%M:%S) $*" >> "$R/queue8_status.log"; }
probe() { timeout 60 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
status "queue8 waiting for tunnel"
until probe; do sleep 45; done
status "TUNNEL ALIVE"
step() {
  local name=$1 tmo=$2; shift 2
  status "START $name"
  timeout "$tmo" "$@" > "$R/$name.log" 2>&1
  status "DONE  $name rc=$?"
}
step actq_tests_tpu2 2400 env ARC_TEST_TPU=1 \
  python -m pytest tests/test_actq.py -q
step decode_profile3 2400 python -m benchmarks.decode_profile
step e2e_14L_quant5 2400 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step e2e_14L_bf16_5 2400 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 14 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3 --quant BF16
step e2e_28L_5 2400 python -m benchmarks.benchmark_e2e \
  --model qwen2.5-7b --layers 28 --batch_size 4 \
  --prefill_seq_len 1024 --decode_steps 128 --repeats 3
step bench_final 1800 python bench.py
status "queue8 COMPLETE"
