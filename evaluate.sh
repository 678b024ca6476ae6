#!/bin/bash
# Accuracy evaluation suite — port of the reference evaluate.sh
# (3 invocations: zero-shot task suite, 5-shot MMLU, WikiText-2 PPL;
# all NVFP4 + act_sort_metric max).
#
# Usage: bash evaluate.sh <model_dir_or_config> [calib.npz]
set -e

MODEL=${1:?usage: evaluate.sh <model> [calib.npz]}
CALIB=${2:-}
CALIB_ARG=""
if [ -n "$CALIB" ]; then CALIB_ARG="--calib $CALIB"; fi

# 1. zero-shot task suite (reference evaluate.sh:9-17)
python evaluate.py --model "$MODEL" $CALIB_ARG \
    --quant_type NVFP4 \
    --tasks piqa,arc_challenge,boolq,hellaswag,winogrande,lambada,arc_easy

# 2. 5-shot MMLU (reference evaluate.sh:19-26)
python evaluate.py --model "$MODEL" $CALIB_ARG \
    --quant_type NVFP4 --tasks mmlu --num_fewshot 5

# 3. WikiText-2 perplexity (reference evaluate.sh:29-35)
python evaluate.py --model "$MODEL" $CALIB_ARG \
    --quant_type NVFP4 --eval_ppl --dataset wikitext2 --seqlen 2048
