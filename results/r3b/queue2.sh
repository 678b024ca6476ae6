R=/root/repo/results/r3b
cd /root/repo
export PYTHONUNBUFFERED=1
step() { echo "=== $(date +%H:%M:%S) START $1" >> $R/queue_status.log; }
done_() { echo "=== $(date +%H:%M:%S) DONE  $1 (rc=$2)" >> $R/queue_status.log; }

step verify_bench
timeout 900 python bench.py > $R/verify_bench.log 2>&1; done_ verify_bench $?

step verify_cli
(timeout 900 python calibrate.py --model test-tiny --dataset synthetic --samples 4 --seqlen 64 --output /tmp/s && \
 timeout 900 python evaluate.py --model test-tiny --eval_ppl --dataset synthetic --seqlen 128 --ntokens 512 --tasks synthetic:16) > $R/verify_cli.log 2>&1; done_ verify_cli $?

step verify_e2e_small
timeout 1500 python -m benchmarks.benchmark_e2e --model qwen2.5-7b --layers 2 --batch_size 4 --prefill_seq_len 256 --decode_steps 16 --repeats 3 > $R/verify_e2e_small.log 2>&1; done_ verify_e2e_small $?

step quantize_lab
timeout 2400 python -m benchmarks.quantize_lab > $R/quantize_lab.log 2>&1; done_ quantize_lab $?

step prefill_trace_quant
timeout 1500 python -m benchmarks.prefill_trace > $R/prefill_trace_quant.log 2>&1; done_ prefill_trace_quant $?

step prefill_trace_bf16
timeout 1500 python -m benchmarks.prefill_trace --quant BF16 --out /tmp/arcquant_prefill_trace_bf16 > $R/prefill_trace_bf16.log 2>&1; done_ prefill_trace_bf16 $?

step e2e_14L_quant_fixed
timeout 1500 python -m benchmarks.benchmark_e2e --layers 14 --repeats 5 --json > $R/e2e_14L_quant_fixed.log 2>&1; done_ e2e_14L_quant_fixed $?

step e2e_14L_w4a16
timeout 1500 python -m benchmarks.benchmark_e2e --layers 14 --act_bits 16 --repeats 5 --json > $R/e2e_14L_w4a16.log 2>&1; done_ e2e_14L_w4a16 $?

step e2e_14L_hybrid
timeout 1500 python -m benchmarks.benchmark_e2e --layers 14 --prefill_act_bits 16 --repeats 5 --json > $R/e2e_14L_hybrid.log 2>&1; done_ e2e_14L_hybrid $?

step e2e_14L_bf16_fixed
timeout 1500 python -m benchmarks.benchmark_e2e --layers 14 --quant BF16 --repeats 5 --json > $R/e2e_14L_bf16_fixed.log 2>&1; done_ e2e_14L_bf16_fixed $?

step e2e_28L_fixed
timeout 2400 python -m benchmarks.benchmark_e2e --repeats 5 --json > $R/e2e_28L_fixed.log 2>&1; done_ e2e_28L_fixed $?

echo "=== $(date +%H:%M:%S) QUEUE2 COMPLETE" >> $R/queue_status.log
