"""Benchmark harness: flagship training-step throughput on real hardware.

Canonical recipe (BASELINE.md): CLIPSeg ViT-B/16 CoOp prompt tuning,
img 352², global batch 64, AdamW — the reference runs this on one GPU via
Lightning; here it is one jitted train step on the available chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no numbers and cannot run here
(no GPU, no lightning/monai in this image — BASELINE.md). `REF_STEPS_PER_SEC`
is a recorded estimate of the reference's single-GPU step rate on this recipe
(batch 64 @ 352², frozen towers fwd + text-tower bwd ≈ 1.1 TFLOP/step;
a ~30 TFLOPs-effective GPU at ~40%% MFU ≈ 2 steps/s). Replace with a measured
value when reference hardware is available.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

REF_STEPS_PER_SEC = 2.0
WARMUP = 3
ITERS = 20
WINDOWS = 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="coop_clipseg",
                    choices=("coop_clipseg", "coop_cris", "trans_seg"))
    ap.add_argument("--strategy", default=None,
                    choices=("coop", "cocoop", "vpt", "maple",
                             "shared_separate", "shared_attn"),
                    help="override the prompt strategy for the clipseg "
                         "model (vpt/maple train THROUGH the frozen "
                         "vision tower and exercise the Pallas backward)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--scan", type=int, default=5,
                    help="steps fused per executable (steps-per-execution); "
                         "1 = a separate launch per step")
    ap.add_argument("--windows", type=int, default=WINDOWS,
                    help="independent timed windows; the reported value is "
                         "the MEDIAN (axon transport is ±15%% run-to-run "
                         "with occasional contention outliers — one window "
                         "is a coin flip)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.task import SegmentationTask

    n_chips = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_chips)

    BATCH = args.batch
    if args.model == "coop_cris":
        from tunevlseg_tpu.models.presets import build_cris, cris_rn50_config
        IMG = args.img or 416
        model, spec = build_cris("coop", prompt_depth=3, num_context=4,
                                 config=cris_rn50_config(IMG),
                                 dtype=jnp.bfloat16)
        metric = f"cris_rn50_coop_train_steps_per_sec_per_chip_b{BATCH}_{IMG}"
    elif args.model == "trans_seg":
        import dataclasses

        from tunevlseg_tpu.models.trans_segmentor.model import (
            TransformerSegmentor, TransSegmentorConfig)
        from tunevlseg_tpu.training.optim import FreezeSpec
        IMG = args.img or 352
        config = dataclasses.replace(TransSegmentorConfig(), image_size=IMG,
                                     decoder_dropout=0.0)
        model = TransformerSegmentor(config, dtype=jnp.bfloat16)
        spec = FreezeSpec(freeze_all=False, family="trans_segmentor")
        metric = (f"trans_seg_vitb16_full_finetune_train_steps_per_sec_"
                  f"per_chip_b{BATCH}_{IMG}")
    else:
        from tunevlseg_tpu.models.presets import build_clipseg
        IMG = args.img or 352
        strat = args.strategy or "coop"
        model, spec = build_clipseg(strat, prompt_depth=3, num_context=4,
                                    dtype=jnp.bfloat16)
        metric = (f"clipseg_vitb16_{strat}_train_steps_per_sec_per_chip_"
                  f"b{BATCH}_{IMG}")
    task = SegmentationTask(model, spec, learning_rate=2e-4)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(BATCH, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 9:] = 49407
    batch = {
        "image": rng.integers(0, 255, (BATCH, 3, IMG, IMG), dtype=np.uint8),
        "mask": (rng.random((BATCH, 1, IMG, IMG)) > 0.7).astype(np.float32),
        "input_ids": ids,
        "attention_mask": (ids != 49407).astype(np.int32),
        "valid": np.ones((BATCH,), np.float32),
    }

    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    K = max(1, args.scan)
    if K > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        train = task.compile_train_multistep(mesh, K)
        stacked_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
        # device-resident once — otherwise every launch re-ships the full
        # stacked batch from host, which dwarfs the step on this transport
        sharded = {k: jax.device_put(np.stack([v] * K), stacked_sh)
                   for k, v in batch.items()}
    else:
        train, _, _ = task.compile_steps(mesh)
        sharded = mesh_lib.shard_batch(mesh, batch)

    # NOTE on sync: on the experimental axon platform `block_until_ready`
    # does not actually wait, so we use device->host scalar reads as the
    # barrier. A per-step read costs a full ~30ms HTTP round trip (measured
    # with a jitted no-op), which is NOT part of training: in steady state
    # the host queues steps back-to-back and each step consumes the previous
    # step's state, so ONE final read of the last step's loss (plus a
    # trainable leaf, forcing the last optimizer update) transitively forces
    # every queued step. Warmup keeps per-step syncs to stay honest about
    # compile completion.
    for _ in range(WARMUP):
        state, metrics = train(state, frozen, sharded)
        float(metrics["loss"])

    samples = []
    for _ in range(max(1, args.windows)):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = train(state, frozen, sharded)
        float(metrics["loss"])
        float(jnp.sum(jax.tree_util.tree_leaves(state.trainable)[0]))
        dt = time.perf_counter() - t0
        samples.append(ITERS * K / dt / n_chips)

    per_chip = float(np.median(samples))
    print(json.dumps({
        "metric": metric,
        "value": round(per_chip, 4),
        "unit": "steps/s/chip",
        "vs_baseline": round(per_chip / REF_STEPS_PER_SEC, 3),
        "samples": [round(s, 4) for s in samples],
    }))


if __name__ == "__main__":
    main()
