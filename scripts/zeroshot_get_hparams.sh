#!/usr/bin/env bash
# Alpha/beta grid search over CACHED zero-shot features (reference
# scripts/zeroshot_get_hparams.sh): first run writes the npz cache once,
# then the grid re-reads it without touching the models.
set -euo pipefail
DS="${1:?usage: zeroshot_get_hparams.sh <ds_name>}"

common=(ds_name="$DS" "paths.data_root=${DATA_ROOT:?}" \
        ${VOCAB:+vocab_path=$VOCAB} \
        +model.cache_dir="${CACHE_DIR:-cache_$DS}")

# pass 1: populate the cache
python -m tunevlseg_tpu.eval_zeroshot "${common[@]}" model.write_cache=true

# pass 2: sweep alpha/beta from the cache only
for alpha in 0.0 0.25 0.5 0.75 0.9 0.95 1.0; do
  for beta in 0.0 0.25 0.5 0.75 1.0; do
    python -m tunevlseg_tpu.eval_zeroshot "${common[@]}" \
      model.read_cache=true "model.alpha=${alpha}" "model.beta=${beta}"
  done
done
