#!/bin/bash
# Generic sweep launcher — replaces the reference's per-strategy
# schedule_*.sh family (schedule_coop_clipseg.sh, schedule_vpt.sh, ...):
# loops datasets for one experiment, running the TPE sweep for each.
#
#   EXPERIMENT=coop/clipseg DATASETS="kvasir_polyp dfu" TRIALS=10 \
#     bash scripts/schedule_runs.sh paths.data_root=/data
set -euo pipefail

EXPERIMENT=${EXPERIMENT:-coop/clipseg}
TRIALS=${TRIALS:-10}
METRIC=${METRIC:-val_loss}
DATASETS=${DATASETS:-"bkai_polyp clinicdb_polyp kvasir_polyp busi chexlocalize dfu isic"}

for ds_name in $DATASETS; do
  python scripts/sweep.py --trials "$TRIALS" --metric "$METRIC" -- \
    "experiment=$EXPERIMENT" "ds_name=$ds_name" "$@"
done
