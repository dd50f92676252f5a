"""Zero-shot RIS (zsseg) pipeline throughput on the chip (VERDICT r2 #8).

The reference contract is a batch-1 host loop (eval.py + model=zsseg,
zero_shot_ris/__init__.py:401-474); no throughput number existed for it
anywhere. This bench runs the REAL pipeline — FreeSOLO proposals →
masked-CLIP visual features (+ crop features when alpha<1) → text ensemble →
cosine argmax — with random weights (identical compute to trained weights)
on synthetic images, and prints one JSON line:

    {"metric": "zsseg_imgs_per_sec", ...}

Modes:
  --alpha 1.0   mask-features only (the device-friendly path)
  --alpha 0.95  reference default (adds the host-side crop loop)

Usage:  python scripts/zsbench.py --images 12 --alpha 1.0
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--img", type=int, default=800,
                    help="input resolution (reference zsseg resizes shortest "
                         "side to 800 for FreeSOLO)")
    ap.add_argument("--n-devices", type=int, default=1,
                    help="shard the proposal batch over a data mesh "
                         "(ZeroShotRIS(mesh=...)); needs that many chips")
    ap.add_argument("--fused", action="store_true",
                    help="use the single-launch fused device path (works at "
                         "ANY alpha — the device crop-resize branch covers "
                         "alpha<1; measured 3.4 imgs/s at the reference's "
                         "alpha=0.95 vs 0.015 for the host crop loop)")
    ap.add_argument("--pipeline", type=int, default=0, metavar="DEPTH",
                    help="with --fused: keep DEPTH launches in flight "
                         "(predict_fused_many) so the ~30ms remote dispatch "
                         "+ per-image host sync overlaps device compute; "
                         "0 = sequential predict_fused")
    args = ap.parse_args()

    from tunevlseg_tpu.models.clip.config import CLIPSegConfig
    from tunevlseg_tpu.models.solov2.model import SOLOv2, SOLOv2Config
    from tunevlseg_tpu.models.zero_shot_ris.model import (MaskedCLIP,
                                                          ZeroShotRIS)

    clip_cfg = CLIPSegConfig(
        text=CLIPSegConfig().text, vision=CLIPSegConfig().vision)
    solo_cfg = SOLOv2Config()

    rng = jax.random.PRNGKey(0)
    clip = MaskedCLIP(clip_cfg)
    clip_params = clip.init(rng, jnp.ones((1, 3, 224, 224)),
                            jnp.ones((1, 14, 14)), -3,
                            method=clip.get_image_features)["params"]
    text_params = clip.init(
        jax.random.PRNGKey(1), jnp.ones((2, 77), jnp.int32),
        jnp.ones((2, 77), jnp.int32),
        method=clip.get_text_features)["params"]
    from tunevlseg_tpu.config.composer import deep_merge
    clip_params = deep_merge(dict(text_params), clip_params)
    solo = SOLOv2(solo_cfg)
    from tunevlseg_tpu.models.solov2.model import preprocess_image
    solo_params = solo.init(rng, preprocess_image(
        jnp.ones((3, args.img, args.img)), solo_cfg))["params"]

    mesh = None
    if args.n_devices > 1:
        from tunevlseg_tpu.parallel.mesh import make_mesh
        assert len(jax.devices()) >= args.n_devices, jax.devices()
        mesh = make_mesh(args.n_devices)
    ris = ZeroShotRIS(clip_config=clip_cfg, solo_config=solo_cfg,
                      clip_params=clip_params, solo_params=solo_params,
                      alpha=args.alpha, mesh=mesh)

    nrng = np.random.default_rng(0)
    ids = nrng.integers(3, 1000, size=(2, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 12:] = 49407
    amask = (ids != 49407).astype(np.int32)
    amask[:, 12] = 1
    images = [nrng.uniform(0, 255, (3, args.img, args.img)).astype(np.float32)
              for _ in range(3)]

    call = (ris.predict_fused if args.fused else ris.__call__)

    # warmup (compiles)
    out = call(images[0], ids, amask)
    np.asarray(out)

    t0 = time.perf_counter()
    if args.fused and args.pipeline > 0:
        items = ({"image": images[i % len(images)], "input_ids": ids,
                  "attention_mask": amask} for i in range(args.images))
        for out in ris.predict_fused_many(items, depth=args.pipeline):
            pass
    else:
        for i in range(args.images):
            out = call(images[i % len(images)], ids, amask)
        np.asarray(out)
    dt = time.perf_counter() - t0
    ips = args.images / dt
    print(json.dumps({
        "metric": f"zsseg_imgs_per_sec_alpha{args.alpha}"
                  + ("_fused" if args.fused else "")
                  + (f"_pipe{args.pipeline}" if args.pipeline else ""),
        "value": round(ips, 4),
        "unit": "imgs/s",
        "ms_per_image": round(1e3 * dt / args.images, 1),
        "n_devices": args.n_devices,
        "pipeline_depth": args.pipeline,
    }), flush=True)


if __name__ == "__main__":
    main()
