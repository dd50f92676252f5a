#!/usr/bin/env bash
# Benchmark grid driver: strategies x datasets, one train.py run per cell —
# the equivalent of the reference's scripts/schedule_*.sh family.
#
# Usage: DATA_ROOT=/data VOCAB=/path/vocab.gz ./scripts/schedule_benchmark.sh [prompt_index]
set -euo pipefail

PROMPT_INDEX="${1:-0}"
DATASETS=(bkai_polyp clinicdb_polyp kvasir_polyp busi chexlocalize dfu isic camus)
MODELS=(coop/clipseg cocoop/clipseg vpt_clipseg maple_clipseg \
        shared_separate_clipseg shared_attn_clipseg coop/cris cocoop/cris)

for model in "${MODELS[@]}"; do
  for ds in "${DATASETS[@]}"; do
    echo "=== model=${model} ds=${ds} prompt_index=${PROMPT_INDEX} ==="
    python -m tunevlseg_tpu.train \
      "model=${model}" \
      "ds_name=${ds}" \
      "prompt_index=${PROMPT_INDEX}" \
      "paths.data_root=${DATA_ROOT:?set DATA_ROOT}" \
      ${VOCAB:+"vocab_path=${VOCAB}"} \
      ${PRETRAINED:+"pretrained_checkpoint=${PRETRAINED}"} \
      "exp_name=bench_${model//\//_}_${ds}_p${PROMPT_INDEX}" \
      || echo "FAILED: ${model} ${ds}"
  done
done
