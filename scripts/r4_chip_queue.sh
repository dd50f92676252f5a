#!/bin/bash
# r4 serial chip queue: perf artifacts (VERDICT r3 #6) + pending A/Bs +
# family bench. One job at a time — concurrent chip work skews ±15%.
# Usage: nohup bash scripts/r4_chip_queue.sh > /tmp/r4_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p PERF_r04

# r3-pending decoder-pad A/B (676 -> 704): 0 = no pad, auto = pad
python scripts/ab_env.py --family coop_cris --env TUNEVLSEG_PAD_SEQ \
    --a 0 --b auto > PERF_r04/ab_cris_padseq.log 2>&1

# zsseg + DenseCLIP machine-readable throughput artifacts
python scripts/zsbench.py --fused --alpha 1.0 \
    > PERF_r04/zsbench_alpha1.json 2> PERF_r04/zsbench_alpha1.err
python scripts/zsbench.py --fused --alpha 0.95 \
    > PERF_r04/zsbench_alpha095.json 2> PERF_r04/zsbench_alpha095.err
python scripts/dcbench.py \
    > PERF_r04/dcbench.json 2> PERF_r04/dcbench.err

# all-family bench, flagship LAST (the r4 BENCH_FAMILIES artifact)
python bench.py --model all > BENCH_FAMILIES_r04.json 2> PERF_r04/bench_all.err

# timing check: the default (flagship-only) driver invocation must finish
# fast — record wall time alongside the line
( time python bench.py ) > PERF_r04/bench_default.json 2> PERF_r04/bench_default.time
echo QUEUE_DONE
