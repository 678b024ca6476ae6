#!/bin/bash
# Round-3 on-chip measurement queue (reconstructed after /tmp wipe).
set -u
R=/root/repo/results/r3
cd /root/repo
export PYTHONUNBUFFERED=1
step() { echo "=== $(date +%H:%M:%S) START $1" >> $R/queue_status.log; }
done_() { echo "=== $(date +%H:%M:%S) DONE  $1 (rc=$2)" >> $R/queue_status.log; }

step bench
timeout 900 python bench.py > $R/bench.log 2>&1; done_ bench $?

step e2e_14L_quant
timeout 1500 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json > $R/e2e_14L_quant.log 2>&1; done_ e2e_14L_quant $?

step e2e_14L_bf16
timeout 1500 python -m benchmarks.benchmark_e2e --layers 14 --quant BF16 --repeats 5 --json > $R/e2e_14L_bf16.log 2>&1; done_ e2e_14L_bf16 $?

step dmaprod
timeout 900 python -m benchmarks.gemm_lab --exp dmaprod > $R/dmaprod.log 2>&1; done_ dmaprod $?

step e2e_28L
timeout 2400 python -m benchmarks.benchmark_e2e --repeats 5 --json > $R/e2e_28L.log 2>&1; done_ e2e_28L $?

step e2e_28L_dma
ARC_GEMM_DMA_M=64 timeout 2400 python -m benchmarks.benchmark_e2e --repeats 5 --json > $R/e2e_28L_dma.log 2>&1; done_ e2e_28L_dma $?

step moe_tests
ARC_TEST_TPU=1 timeout 1800 python -m pytest tests/test_moe.py -x -q > $R/moe_tests.log 2>&1; done_ moe_tests $?

step moe_e2e
timeout 2400 python -m benchmarks.benchmark_e2e --model qwen1.5-moe-a2.7b --weight_fmt w4 --repeats 3 --json > $R/moe_e2e.log 2>&1; done_ moe_e2e $?

step bench_spec
timeout 1800 python -m benchmarks.bench_spec --json > $R/bench_spec.log 2>&1; done_ bench_spec $?

step bench_serving
timeout 1800 python -m benchmarks.bench_serving > $R/bench_serving.log 2>&1; done_ bench_serving $?

step spec_tests
ARC_TEST_TPU=1 timeout 1800 python -m pytest tests/test_spec.py tests/test_sampling.py -x -q > $R/spec_tests.log 2>&1; done_ spec_tests $?

echo "=== $(date +%H:%M:%S) QUEUE COMPLETE" >> $R/queue_status.log
