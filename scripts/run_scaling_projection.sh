#!/bin/bash
# Scaling characterization sweep (virtual CPU mesh — no chip needed).
# Weak scaling holds per-chip batch at the canonical recipe, so compute
# time comes from the MEASURED single-chip rate (BENCH_FAMILIES_r04) and
# only the comm term is projected. Output: PERF_r04/scaling_projection.json
set -u
cd "$(dirname "$0")/.."
OUT=PERF_r04/scaling_projection.json
LOG=PERF_r04/scaling_projection.log
: > "$OUT"; : > "$LOG"

run() { echo "=== $*" >> "$LOG"; python "$@" >> "$OUT" 2>> "$LOG"; }

# flagship prompt tuning: weak scaling dp8 (b64/chip), measured 16.97 steps/s
run scripts/scaling_projection.py --model coop_clipseg --devices 8 \
    --batch 512 --measured-steps-per-sec 16.97
# flagship at the dryrun-proven dp4xtp2 layout, global b64 (strong scaling)
run scripts/scaling_projection.py --model coop_clipseg --devices 8 --tp 2 \
    --batch 64 --mfu 0.53
# full fine-tune: the real grad-sync regime, weak scaling dp8 (b32/chip),
# measured 4.18 steps/s
run scripts/scaling_projection.py --model trans_seg --devices 8 \
    --batch 256 --measured-steps-per-sec 4.18
# same under fsdp (ZeRO-3): all-gather weights + reduce-scatter grads
run scripts/scaling_projection.py --model trans_seg --devices 8 --fsdp \
    --batch 256 --measured-steps-per-sec 4.18
echo DONE >> "$LOG"
