#!/usr/bin/env bash
# TPU-native counterpart of `new_scripts/run_mteb_sts.sh`: STS bi-encoder
# eval (Spearman) on STS12-16/STSBenchmark/SICK-R-format tsv files.
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL="${MODEL:-}"
MODEL_ARG=""
[ -n "$MODEL" ] && MODEL_ARG="--model $MODEL"

python -m llama3_quantization_tpu.tools.benchmark_sts $MODEL_ARG \
  --net "${NET:-tiny-llama}" \
  --wbits "${WBITS:-4}" --group_size "${GS:-128}" \
  ${DATA_TSV:+--data_tsv "$DATA_TSV"} ${DATA_TSV:---synthetic 64} ${EXTRA:-}
