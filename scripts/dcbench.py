"""DenseCLIP segmentor throughput on the chip — the last family without a
perf datum. Reference recipe: RN50 backbone, ADE20K 150 classes, slide
inference 512x512 crop / 341 stride over a 2048x512 eval image (mmseg
test_cfg in denseclip_configs/denseclip_fpn_res50_512x512_80k.py).

Prints one JSON line per mode (whole 512², slide 512x2048), bf16.

`--train` instead benchmarks the r4 training path (DenseCLIPTask: decode
CE + identity aux, paramwise AdamW, poly+warmup) — one jitted train step
on the 512² crop, steps/s + MFU via XLA cost analysis, mirroring bench.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def bench_train(batch: int, remat: bool, iters: int = 10,
                windows: int = 5, scan: int = 5):
    import jax
    import jax.numpy as jnp

    from bench import peak_tflops
    from tunevlseg_tpu.models.denseclip.model import (DenseCLIP,
                                                      DenseCLIPConfig)
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.denseclip_task import DenseCLIPTask

    cfg = DenseCLIPConfig()           # RN50 @512, ADE-150
    rng = np.random.default_rng(0)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids, dtype=jnp.bfloat16,
                      bn_train=True)
    task = DenseCLIPTask(model, remat=remat)

    labels = rng.integers(0, cfg.num_classes,
                          (batch, 512, 512)).astype(np.int32)
    labels[:, :24] = 255              # an ignore band, like real ADE crops
    batch_np = {"image": rng.normal(size=(batch, 3, 512, 512)
                                    ).astype(np.float32),
                "label": labels}

    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), batch_np)
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    sharded = mesh_lib.shard_batch(mesh, batch_np)

    # FLOPs of one step with the Pallas kernels lowered away, so the
    # custom-call FLOPs stay visible to the counter (same as bench.py)
    flops = None
    prev = os.environ.get("TUNEVLSEG_FLASH")
    os.environ["TUNEVLSEG_FLASH"] = "0"
    try:
        t_nf, _ = task.compile_steps(mesh)
        lowered = t_nf.lower(state, frozen, sharded)
        for stage in (lowered, None):
            try:
                ca = (stage.cost_analysis() if stage is not None
                      else lowered.compile().cost_analysis())
                ca = ca[0] if isinstance(ca, list) else ca
                if ca and "flops" in ca:
                    flops = float(ca["flops"])
                    break
            except Exception:
                continue
    finally:
        if prev is None:
            os.environ.pop("TUNEVLSEG_FLASH", None)
        else:
            os.environ["TUNEVLSEG_FLASH"] = prev

    task.donate_state = False         # reuse the state across timed windows
    if scan > 1:
        # steps-per-execution: the per-launch dispatch/sync on this remote
        # transport measured ~15 ms/step — 150 ms of the 258 ms single-
        # launch step (PERF_r04/profile_denseclip.log)
        from jax.sharding import NamedSharding, PartitionSpec as P
        train = task.compile_train_multistep(mesh, scan)
        stacked_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
        sharded = {k: jax.device_put(np.stack([v] * scan), stacked_sh)
                   for k, v in batch_np.items()}
    else:
        train, _ = task.compile_steps(mesh)
    state, m = train(state, frozen, sharded)        # compile + warm
    float(m["loss"])
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train(state, frozen, sharded)
        float(m["loss"])                            # device sync barrier
        ts.append((time.perf_counter() - t0) / (iters * scan))
    dt = float(np.median(ts))
    rec = {"metric": "denseclip_rn50_train512_steps_per_sec",
           "value": round(1.0 / dt, 3), "unit": "steps/s",
           "ms_per_step": round(dt * 1e3, 1),
           "imgs_per_sec": round(batch / dt, 1),
           "batch": batch, "remat": remat, "scan": scan,
           "samples": [round(1.0 / t, 3) for t in ts]}
    if flops is not None:
        achieved = flops / dt / 1e12
        rec.update(flops_per_step=round(flops),
                   achieved_tflops=round(achieved, 2),
                   mfu_pct=round(100.0 * achieved / peak_tflops(), 2))
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="benchmark ONLY the jitted train step (512² crop)")
    ap.add_argument("--batch", type=int, default=16,
                    help="train-step batch size (default 16 = mmseg 4/gpu "
                         "x 4 'gpus' worth on one chip)")
    ap.add_argument("--remat", action="store_true",
                    help="train with jax.checkpoint on the loss")
    ap.add_argument("--scan", type=int, default=5,
                    help="steps per execution for --train (lax.scan)")
    args = ap.parse_args()
    if args.train:
        bench_train(args.batch, args.remat, scan=args.scan)
        return

    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.denseclip.inference import slide_predict
    from tunevlseg_tpu.models.denseclip.model import (DenseCLIP,
                                                      DenseCLIPConfig)

    cfg = DenseCLIPConfig()           # RN50 @512, ADE-150
    rng = np.random.default_rng(0)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids, dtype=jnp.bfloat16)

    x512 = jnp.asarray(rng.normal(size=(1, 3, 512, 512)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x512)

    apply_fn = jax.jit(lambda v, img: model.apply(v, img))

    # whole 512² (the training crop shape)
    out = apply_fn(variables, x512)
    float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = apply_fn(variables, x512)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"metric": "denseclip_rn50_whole512_imgs_per_sec",
                      "value": round(1.0 / dt, 3), "unit": "imgs/s",
                      "ms_per_image": round(dt * 1e3, 1)}), flush=True)

    # slide over a wide eval image (mmseg contract: crop 512, stride 341);
    # the window fn must be JITTED — all windows share one compiled program
    win_fn = lambda img: apply_fn(variables, img)  # noqa: E731
    wide = jnp.asarray(rng.normal(size=(1, 3, 512, 2048)), jnp.float32)
    pred = slide_predict(win_fn, wide, (512, 512), (341, 341))
    float(jnp.sum(pred.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(3):
        pred = slide_predict(win_fn, wide, (512, 512), (341, 341))
    float(jnp.sum(pred.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({"metric": "denseclip_rn50_slide_512x2048_imgs_per_sec",
                      "value": round(1.0 / dt, 3), "unit": "imgs/s",
                      "ms_per_image": round(dt * 1e3, 1)}), flush=True)

    # fully-fused slide: the whole 6-window sweep traced into ONE executable
    # (slide_inference is pure jnp) — amortizes the per-window dispatch
    slide_jit = jax.jit(lambda v, img: slide_predict(
        lambda c: model.apply(v, c), img, (512, 512), (341, 341)))
    pred = slide_jit(variables, wide)
    float(jnp.sum(pred.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(5):
        pred = slide_jit(variables, wide)
    float(jnp.sum(pred.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 5
    print(json.dumps({
        "metric": "denseclip_rn50_slide_512x2048_fused_imgs_per_sec",
        "value": round(1.0 / dt, 3), "unit": "imgs/s",
        "ms_per_image": round(dt * 1e3, 1)}), flush=True)


if __name__ == "__main__":
    main()
