"""r4: bound the host input-pipeline requirement (VERDICT r3 weakness #6).

Measures single-core decode+augment throughput for the flagship recipe
(coop_clipseg b64@352: JPEG decode -> train_transforms(352) -> CHW uint8)
and derives the host cores needed to feed the measured TPU step rate:

    cores_needed = steps_per_sec * batch / imgs_per_sec_per_core

This sandbox HAS exactly 1 CPU, so the single-threaded measurement IS the
per-core rate (no contention correction needed) — run it with the machine
otherwise idle. Results + arithmetic land in docs/PIPELINE.md.

Usage: python scripts/host_pipeline_bench.py [--images 64] [--size 640 480]
"""
import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import cv2  # noqa: E402
import numpy as np  # noqa: E402

cv2.setNumThreads(0)


def synth_dataset(root: Path, n: int, w: int, h: int):
    """Natural-ish JPEGs (smooth gradients + noise compress like photos,
    unlike pure noise which inflates decode cost) + binary PNG masks."""
    rng = np.random.default_rng(0)
    imgs, masks = [], []
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        base = (127 + 90 * np.sin(xx / (17 + i % 13))[..., None]
                * np.cos(yy / (23 + i % 7))[..., None])
        img = np.clip(base + rng.normal(0, 12, (h, w, 3)), 0, 255
                      ).astype(np.uint8)
        p = root / f"img_{i}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        imgs.append(p)
        m = ((xx - w / 2) ** 2 + (yy - h / 2) ** 2
             < (min(h, w) * (0.2 + 0.1 * (i % 3))) ** 2).astype(np.uint8)
        mp = root / f"mask_{i}.png"
        cv2.imwrite(str(mp), m * 255)
        masks.append(mp)
    return imgs, masks


def timeit(fn, items, repeats=3):
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        for it in items:
            fn(it)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return len(items) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, nargs=2, default=(640, 480))
    ap.add_argument("--img-size", type=int, default=352)
    ap.add_argument("--steps-per-sec", type=float, default=17.0)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from tunevlseg_tpu.data.datasets import load_image
    from tunevlseg_tpu.data.tokenizer import load_default_tokenizer
    from tunevlseg_tpu.data.transforms import to_chw, train_transforms
    from tunevlseg_tpu.native import get_imgcodec

    w, h = args.size
    out = {"image_px": f"{w}x{h}", "train_img_size": args.img_size,
           "codec_native": bool(get_imgcodec())}
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        imgs, masks = synth_dataset(root, args.images, w, h)

        out["decode_jpeg_imgs_per_sec_core"] = round(
            timeit(lambda p: load_image(p), imgs), 1)
        out["decode_mask_png_imgs_per_sec_core"] = round(
            timeit(lambda p: load_image(p, cv2.IMREAD_GRAYSCALE, None),
                   masks), 1)

        # production flagship path ships uint8 and normalizes on-TPU
        tf = train_transforms(args.img_size, normalize_on_device=True)
        rng = np.random.default_rng(0)

        def full_sample(pair):
            ip, mp = pair
            img = load_image(ip)
            msk = load_image(mp, cv2.IMREAD_GRAYSCALE, None
                             ).astype(np.float32) / 255
            img, msk = tf(img, msk, rng)
            return to_chw(img, msk)

        out["decode_augment_imgs_per_sec_core"] = round(
            timeit(full_sample, list(zip(imgs, masks))), 1)

    tok = load_default_tokenizer()
    prompts = [f"a photo of object number {i} in a scene." for i in range(256)]
    out["tokenize_prompts_per_sec_core"] = round(
        timeit(lambda s: tok(s), prompts), 1)

    need = args.steps_per_sec * args.batch
    rate = out["decode_augment_imgs_per_sec_core"]
    out["flagship_imgs_per_sec_needed"] = round(need, 1)
    out["cores_needed_flagship"] = round(need / rate, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
