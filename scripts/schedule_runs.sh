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
# per-strategy search space (configs/hparams_search/<name>.yaml) — mirrors
# the reference's hparams_search=<strategy>_optuna pairing; default derives
# the strategy from the experiment name (coop/clipseg -> coop)
SPACE=${SPACE:-$(basename "$(dirname "$EXPERIMENT")")}
[ -z "$SPACE" ] || [ "$SPACE" = "." ] && SPACE=coop

for ds_name in $DATASETS; do
  python scripts/sweep.py --space "$SPACE" --trials "$TRIALS" \
    --metric "$METRIC" -- "experiment=$EXPERIMENT" "ds_name=$ds_name" "$@"
done
