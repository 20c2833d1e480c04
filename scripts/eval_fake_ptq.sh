#!/usr/bin/env bash
# TPU-native counterpart of `scripts/eval_fake_ptq.sh`: evaluate a
# fake-quant (dequantized-weight) checkpoint — RTN with unpacked storage,
# i.e. the reference's save_pretrained fake-quant models.
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${MODEL:-}"
TASKS="${TASKS-piqa,arc_easy,arc_challenge,hellaswag,winogrande}"
MODEL_ARG=""
[ -n "$MODEL" ] && MODEL_ARG="--model $MODEL"

python -m llama3_quantization_tpu.cli $MODEL_ARG --net "${NET:-tiny-llama}" \
  --quant_method rtn --wbits "${WBITS:-4}" --group_size "${GS:-128}" \
  --eval_ppl --tasks "$TASKS" ${EXTRA:-}
