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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="coop_clipseg",
                    choices=("coop_clipseg", "coop_cris"))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=None)
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
    else:
        from tunevlseg_tpu.models.presets import build_clipseg
        IMG = args.img or 352
        model, spec = build_clipseg("coop", prompt_depth=3, num_context=4,
                                    dtype=jnp.bfloat16)
        metric = (f"clipseg_vitb16_coop_train_steps_per_sec_per_chip_"
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
    train, _, _ = task.compile_steps(mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)

    # NOTE: sync via device->host value transfer every step — on the
    # experimental axon platform `block_until_ready` does not actually wait,
    # yielding impossible (>peak-FLOPs) rates. A scalar read is an honest
    # barrier and costs microseconds against a ~100ms step.
    for _ in range(WARMUP):
        state, metrics = train(state, frozen, sharded)
        float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train(state, frozen, sharded)
        float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = ITERS / dt
    per_chip = steps_per_sec / n_chips
    print(json.dumps({
        "metric": metric,
        "value": round(per_chip, 4),
        "unit": "steps/s/chip",
        "vs_baseline": round(per_chip / REF_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
