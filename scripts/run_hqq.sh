#!/usr/bin/env bash
# Calibration-free HQQ quantization + save (reference new_scripts/run_hqq.sh)
set -euo pipefail
MODEL=${1:-/checkpoints/Meta-Llama-3-8B}
BITS=${2:-4}
python -m llama3_quantization_tpu.cli \
    --model "$MODEL" --quant_method hqq --wbits "$BITS" --group_size 64 \
    --save_dir "./quantized/hqq_w${BITS}" --eval_ppl
