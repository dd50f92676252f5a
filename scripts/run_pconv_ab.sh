#!/bin/sh
# r4 chip runbook for the flat-space Pallas conv A/Bs. Run on an IDLE box
# (CLAUDE.md: concurrent CPU load depresses host-orchestrated paths) via
#   nohup sh scripts/run_pconv_ab.sh > PERF_r04/pconv_ab.log 2>&1 &
#
# STATUS after the micro leg ran on chip (PERF_r04/micro_conv_pallas.json,
# docs/ROOFLINE.md "Flat-space Pallas conv kernel"): the kernel measures
# 2-4x BEHIND the XLA conv emitter at every constituent shape (stem-conv3
# 17.8ms vs 4.7ms; layer1 1x1s 5.5-6.6 vs 2.6-3.4ms), so the e2e legs
# below are SUPERSEDED — a kernel slower at every stage cannot win e2e.
# They are kept (commented) for reproducibility if the kernel economics
# change; the diagnosis probe is scripts/micro_pconv_probe.py.
set -x
cd /root/repo
mkdir -p PERF_r04

TUNEVLSEG_PCONV=strict python scripts/micro_conv_pallas.py \
    2>&1 | tee PERF_r04/micro_conv_pallas.log

python scripts/micro_pconv_probe.py \
    2>&1 | tee PERF_r04/micro_pconv_probe.log

# --- superseded by the micro result (see header) ---
# TUNEVLSEG_PCONV=strict python scripts/ab_env.py \
#     --family coop_cris --env TUNEVLSEG_PALLAS_CONV --a 0 --b 1 \
#     2>&1 | tee PERF_r04/ab_cris_pconv.log
# TUNEVLSEG_PCONV=strict python scripts/ab_env.py \
#     --family coop_cris --env TUNEVLSEG_PALLAS_CONV --a 0 --b stem,1,2 \
#     2>&1 | tee PERF_r04/ab_cris_pconv_early.log
# TUNEVLSEG_PCONV=strict python scripts/ab_env.py \
#     --family trans_seg --env TUNEVLSEG_PALLAS_CONV --a 0 --b 1 \
#     2>&1 | tee PERF_r04/ab_transseg_pconv.log
# TUNEVLSEG_PALLAS_CONV=0 python scripts/dcbench.py \
#     2>&1 | tee PERF_r04/dcbench_pconv0.log
# TUNEVLSEG_PCONV=strict TUNEVLSEG_PALLAS_CONV=1 python scripts/dcbench.py \
#     2>&1 | tee PERF_r04/dcbench_pconv1.log
# TUNEVLSEG_PCONV=strict TUNEVLSEG_PALLAS_CONV=1 python scripts/zsbench.py \
#     --fused --alpha 1.0 2>&1 | tee PERF_r04/zsbench_pconv1.log

# SPMD sanity: DONE (PERF_r04/chip_spmd_sanity.log, commit 80998bd) —
# cp-wrapped flash + flat-conv kernels compile and run on axon.
# python scripts/chip_spmd_sanity.py 2>&1 | tee PERF_r04/chip_spmd_sanity.log

# CRIS decoder 676->704 MXU pad (r3 item, equivalence-tested): first r4
# attempt compared A to itself (import-time env read, since fixed); the
# re-measure died on the axon outage — rerun:
python scripts/ab_env.py \
    --family coop_cris --env TUNEVLSEG_PAD_SEQ --a 0 --b auto \
    2>&1 | tee PERF_r04/ab_cris_padseq2.log

echo RUNBOOK_DONE
