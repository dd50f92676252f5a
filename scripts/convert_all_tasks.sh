#!/bin/bash
# Reduce every PhraseCut refer_*.json split in a dataset root
# (reference scripts/convert_all_tasks.sh).
set -euo pipefail

ROOT_DIR=${1:?usage: convert_all_tasks.sh DATASET_ROOT}

for task_file in "$ROOT_DIR"/refer_*.json; do
  python scripts/reduce_and_save_phrasecut.py \
    --task-json-path "$task_file" \
    --image-root "$ROOT_DIR/images" \
    --mask-output-dir "$ROOT_DIR/masks" \
    --task-output-dir "$ROOT_DIR/filtered_tasks"
done
