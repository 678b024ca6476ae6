R=/root/repo/results/r3b
cd /root/repo
export PYTHONUNBUFFERED=1
step() { echo "=== $(date +%H:%M:%S) START $1" >> $R/queue_status.log; }
done_() { echo "=== $(date +%H:%M:%S) DONE  $1 (rc=$2)" >> $R/queue_status.log; }

step prefill_profile
timeout 2400 python -m benchmarks.prefill_profile > $R/prefill_profile.log 2>&1; done_ prefill_profile $?

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
