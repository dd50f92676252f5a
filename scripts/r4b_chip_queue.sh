#!/bin/bash
# r4 part-5 serial chip queue: pipelined zsseg measurement + regenerated
# family artifact (now incl. the DenseCLIP train row) + flagship sanity.
# One job at a time; the box must be otherwise IDLE (CLAUDE.md measurement
# discipline). Usage: nohup bash scripts/r4b_chip_queue.sh > /tmp/r4b_queue.log 2>&1 &
set -x
cd /root/repo
mkdir -p PERF_r04

# pipelined vs sequential fused zsseg, interleaved A/B/A/B to ride out the
# ±25% per-launch transport variance on this host-orchestrated path
for rep in 1 2; do
  python scripts/zsbench.py --fused --alpha 1.0 \
      >> PERF_r04/zsbench_pipe_seq.jsonl 2>> PERF_r04/zsbench_pipe.err
  python scripts/zsbench.py --fused --alpha 1.0 --pipeline 2 \
      >> PERF_r04/zsbench_pipe_d2.jsonl 2>> PERF_r04/zsbench_pipe.err
done
python scripts/zsbench.py --fused --alpha 0.95 --pipeline 2 \
    >> PERF_r04/zsbench_pipe_d2_a095.jsonl 2>> PERF_r04/zsbench_pipe.err

# all-family bench artifact: denseclip-train row first, flagship LAST
python bench.py --model all > BENCH_FAMILIES_r04.json.new 2> PERF_r04/bench_all2.err \
  && mv BENCH_FAMILIES_r04.json.new BENCH_FAMILIES_r04.json

# driver-shaped default invocation sanity (must be fast, flagship-only)
( time python bench.py ) > PERF_r04/bench_default2.json 2> PERF_r04/bench_default2.time
echo QUEUE_DONE
