#!/bin/sh
# r4 chip runbook for the flat-space Pallas conv A/Bs. Run on an IDLE box
# (CLAUDE.md: concurrent CPU load depresses host-orchestrated paths) via
#   nohup sh scripts/run_pconv_ab.sh > PERF_r04/pconv_ab.log 2>&1 &
# Sequence: micro kernel-vs-XLA grid, then interleaved e2e A/Bs on the two
# families whose backbones/upsamplers route through the kernel. strict
# mode makes any silent kernel->jnp fallback a loud failure instead of a
# bogus B measurement.
set -x
cd /root/repo
mkdir -p PERF_r04

TUNEVLSEG_PCONV=strict python scripts/micro_conv_pallas.py \
    2>&1 | tee PERF_r04/micro_conv_pallas.log

TUNEVLSEG_PCONV=strict python scripts/ab_env.py \
    --family coop_cris --env TUNEVLSEG_PALLAS_CONV --a 0 --b 1 \
    2>&1 | tee PERF_r04/ab_cris_pconv.log

# early-stages-only variant: layer3/4 are large-C GEMMs the XLA emitter
# already handles at peak (docs/ROOFLINE.md); the floor was stem/1/2
TUNEVLSEG_PCONV=strict python scripts/ab_env.py \
    --family coop_cris --env TUNEVLSEG_PALLAS_CONV --a 0 --b stem,1,2 \
    2>&1 | tee PERF_r04/ab_cris_pconv_early.log

TUNEVLSEG_PCONV=strict python scripts/ab_env.py \
    --family trans_seg --env TUNEVLSEG_PALLAS_CONV --a 0 --b 1 \
    2>&1 | tee PERF_r04/ab_transseg_pconv.log

# inference pipelines: one process per variant (weaker than interleaved,
# but the backbone dominates both so a real effect is >> the +-15% drift)
TUNEVLSEG_PALLAS_CONV=0 python scripts/dcbench.py \
    2>&1 | tee PERF_r04/dcbench_pconv0.log
TUNEVLSEG_PCONV=strict TUNEVLSEG_PALLAS_CONV=1 python scripts/dcbench.py \
    2>&1 | tee PERF_r04/dcbench_pconv1.log

# zsseg (FreeSOLO R101 @800 fused single-launch): the stride-1 D2ResNet
# blocks route through the kernel; compare vs PERF_r04/zsbench_alpha1.json
TUNEVLSEG_PCONV=strict TUNEVLSEG_PALLAS_CONV=1 python scripts/zsbench.py \
    --fused --alpha 1.0 2>&1 | tee PERF_r04/zsbench_pconv1.log


# SPMD sanity: the custom_partitioning-wrapped kernels (sdy custom call +
# Mosaic) must compile/run on this platform before TUNEVLSEG_KERNELS_SPMD
# stays default-on for multi-chip (ops/spmd.py; CPU-mesh semantics already
# proven in tests/test_spmd_kernels.py)
python scripts/chip_spmd_sanity.py 2>&1 | tee PERF_r04/chip_spmd_sanity.log

# CRIS decoder 676->704 MXU pad (r3 item, equivalence-tested): the first
# r4 attempt compared A to itself (import-time env read, since fixed) and
# the re-measure died on the axon outage (see ab_cris_padseq.log tail) —
# still an open measurement
python scripts/ab_env.py \
    --family coop_cris --env TUNEVLSEG_PAD_SEQ --a 0 --b auto \
    2>&1 | tee PERF_r04/ab_cris_padseq2.log

echo RUNBOOK_DONE
