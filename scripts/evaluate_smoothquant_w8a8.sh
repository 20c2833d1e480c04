#!/usr/bin/env bash
# SmoothQuant W8A8 (reference new_scripts/evaluate_smoothquant8.sh)
set -euo pipefail
MODEL=${1:-/checkpoints/Meta-Llama-3-8B}
python -m llama3_quantization_tpu.cli \
    --model "$MODEL" --quant_method smoothquant --wbits 8 --abits 8 \
    --calib_dataset wikitext2 --nsamples 128 \
    --eval_ppl --tasks piqa,arc_easy,arc_challenge,hellaswag,winogrande
