#!/bin/bash
# Canonical paper benchmark grid — the 8-dataset x 6-strategy x 2-VLSM
# matrix the reference enumerates across its 22 schedule_*.sh files
# (schedule_coop_clipseg.sh, schedule_vpt.sh, schedule_cocoop_cris.sh, ...),
# written down once as DATA (scripts/paper_grid.tsv) and replayed here.
#
# Each row runs the per-strategy TPE sweep (scripts/sweep.py over
# configs/hparams_search/<space>.yaml), mirroring the reference's
# `-m hparams_search=<strategy>_optuna` multiruns. CRIS rows cover
# coop/cocoop only — the only strategies the reference wires to CRIS
# (src/models/core_models/coop_cris.py).
#
#   TRIALS=10 bash scripts/schedule_paper_grid.sh paths.data_root=/data
#   FILTER='kvasir' bash scripts/schedule_paper_grid.sh   # subset by regex
set -euo pipefail

GRID=${GRID:-scripts/paper_grid.tsv}
TRIALS=${TRIALS:-10}
METRIC=${METRIC:-val_loss}
FILTER=${FILTER:-.}

tail -n +2 "$GRID" | grep -E "$FILTER" | \
while IFS=$'\t' read -r experiment model vlsm strategy ds_name preset bs space; do
  echo ">>> $vlsm/$strategy on $ds_name (batch $bs)"
  python scripts/sweep.py --space "$space" --trials "$TRIALS" \
    --metric "$METRIC" -- "experiment=$experiment" "model=$model" \
    "ds_name=$ds_name" "data=$preset" "data.batch_size=$bs" "$@"
done
