#!/usr/bin/env bash
# TPU-native counterpart of `new_scripts/run_beir.sh` (reference: boots
# Elasticsearch for BM25, then UPR-reranks with a quantized LLaMA; here
# BM25 is in-process — no ES lifecycle needed).
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${MODEL:-}"
MODEL_ARG=""
[ -n "$MODEL" ] && MODEL_ARG="--model $MODEL"

python -m llama3_quantization_tpu.tools.benchmark_ir $MODEL_ARG \
  --net "${NET:-tiny-llama}" \
  --quant_method "${METHOD:-hqq}" --wbits "${WBITS:-4}" --group_size "${GS:-128}" \
  ${DATA_DIR:+--data_dir "$DATA_DIR"} ${DATA_DIR:---synthetic 64} \
  --top_k "${TOP_K:-100}" ${EXTRA:-}
