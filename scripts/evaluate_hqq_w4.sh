#!/usr/bin/env bash
# TPU-native counterpart of the reference study job (see scripts/README.md).
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${MODEL:-}"
TASKS="${TASKS-piqa,arc_easy,arc_challenge,hellaswag,winogrande}"
MODEL_ARG=""
[ -n "$MODEL" ] && MODEL_ARG="--model $MODEL"

python -m llama3_quantization_tpu.cli $MODEL_ARG --net "${NET:-tiny-llama}" \
  --quant_method hqq --wbits 4 --group_size 64 \
  --eval_ppl --tasks "$TASKS" ${EXTRA:-}
