#!/bin/bash
# r5 predicted-vs-measured collective-byte cross-check (VERDICT r4 #9).
# Virtual CPU mesh — no chip needed. Output: PERF_r05/scaling_check.json
set -u
cd "$(dirname "$0")/.."
mkdir -p PERF_r05
OUT=PERF_r05/scaling_check.json
LOG=PERF_r05/scaling_check.log
: > "$OUT"; : > "$LOG"

run() { echo "=== $*" >> "$LOG"; python "$@" >> "$OUT" 2>> "$LOG"; }

# flagship dp8 weak scaling: prediction = trainable grad bytes
run scripts/scaling_projection.py --model coop_clipseg --devices 8 \
    --batch 512 --measured-steps-per-sec 19.10
# flagship dp4xtp2: prediction = Megatron activation all-reduce accounting
run scripts/scaling_projection.py --model coop_clipseg --devices 8 --tp 2 \
    --batch 64 --mfu 0.53
# full fine-tune dp8: prediction = grad floor; largest[] attributes the rest
run scripts/scaling_projection.py --model trans_seg --devices 8 \
    --batch 256 --measured-steps-per-sec 4.18
# fsdp8: prediction = sharded-leaf gather bytes (x1 / x2) + grad sync
run scripts/scaling_projection.py --model trans_seg --devices 8 --fsdp \
    --batch 256 --measured-steps-per-sec 4.18
echo DONE >> "$LOG"
