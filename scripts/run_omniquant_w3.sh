#!/usr/bin/env bash
# OmniQuant LWC(+LET) extreme low-bit (reference scripts/eval_fake_ptq.sh path)
set -euo pipefail
MODEL=${1:-/checkpoints/Meta-Llama-3-8B}
python -m llama3_quantization_tpu.cli \
    --model "$MODEL" --quant_method omniquant --wbits 3 --group_size 128 \
    --lwc --let --epochs 20 --calib_dataset wikitext2 --nsamples 128 \
    --eval_ppl --tasks piqa,arc_easy,arc_challenge,hellaswag,winogrande
