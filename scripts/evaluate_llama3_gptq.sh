#!/usr/bin/env bash
# Quantize + evaluate Llama-3-8B with GPTQ W4 g128, then PPL + CommonSenseQA
# (the `new_scripts/evaluate_*.sh` equivalent of the reference repo).
set -euo pipefail
MODEL=${1:-/checkpoints/Meta-Llama-3-8B}
python -m llama3_quantization_tpu.cli \
    --model "$MODEL" \
    --quant_method gptq --wbits 4 --group_size 128 \
    --calib_dataset wikitext2 --nsamples 128 --seqlen 2048 \
    --eval_ppl --ppl_datasets wikitext2,c4,ptb \
    --tasks piqa,arc_easy,arc_challenge,hellaswag,winogrande
