#!/usr/bin/env bash
# TPU-native counterpart of `scripts/eval_irqlora_commonsenseqa.sh`:
# IR-QLoRA (NF4 + ICQ tau + ICE LoRA) zero-shot CommonSenseQA eval.
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${MODEL:-}"
TASKS="${TASKS-piqa,arc_easy,arc_challenge,hellaswag,winogrande}"
MODEL_ARG=""
[ -n "$MODEL" ] && MODEL_ARG="--model $MODEL"

python -m llama3_quantization_tpu.cli $MODEL_ARG --net "${NET:-tiny-llama}" \
  --quant_method irqlora --wbits 4 \
  --tasks "$TASKS" ${EXTRA:-}
