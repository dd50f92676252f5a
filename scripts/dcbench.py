"""DenseCLIP segmentor throughput on the chip — the last family without a
perf datum. Reference recipe: RN50 backbone, ADE20K 150 classes, slide
inference 512x512 crop / 341 stride over a 2048x512 eval image (mmseg
test_cfg in denseclip_configs/denseclip_fpn_res50_512x512_80k.py).

Prints one JSON line per mode (whole 512², slide 512x2048), bf16.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
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
