#!/usr/bin/env python
"""Zero-shot RIS exploration — script port of the reference notebooks
`freesolo_limit.ipynb` and `zero-shot-topk.ipynb`.

Two analyses over a ZeroShotDataset (composed exactly like
tunevlseg_tpu.eval_zeroshot, so the same config overrides apply):

  limit  — the FreeSOLO ORACLE upper bound: for every image, the max
           dice/IoU over ALL class-agnostic proposals.  This bounds what
           any CLIP-based proposal selection can achieve (the notebook's
           headline numbers were the mean of these per-image maxima).
  topk   — best-of-top-k selection quality: rank proposals by CLIP
           similarity and score the BEST of the k highest-ranked masks for
           each k (notebook reference points at 224²: top-1 0.427 dice,
           top-5 0.557, top-10 0.635 on Kvasir).

Outputs a JSON line per analysis plus (with --plots) the notebook's
panels: per-image max-dice/IoU histograms and the worst/best example
triptych (image / gt / best proposal).

Usage:
    python scripts/analyze_zeroshot.py limit  [eval_zeroshot overrides...]
    python scripts/analyze_zeroshot.py topk --topk 1 5 10 [overrides...]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def dice_iou(pred: np.ndarray, gt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(P, H, W) binary preds vs (H, W) gt -> per-proposal dice/IoU."""
    gt = gt.astype(bool)
    pred = pred.astype(bool)
    inter = (pred & gt).sum((-2, -1)).astype(np.float64)
    psum = pred.sum((-2, -1))
    gsum = gt.sum()
    dice = 2 * inter / np.maximum(psum + gsum, 1)
    iou = inter / np.maximum(psum + gsum - inter, 1)
    return dice, iou


def main() -> None:
    import os
    if os.environ.get("TUNEVLSEG_FORCE_CPU"):
        # JAX_PLATFORMS is ignored by the axon TPU plugin; this is the
        # reliable pre-backend-init CPU force (see tests/conftest.py)
        import jax
        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=("limit", "topk"))
    ap.add_argument("--topk", type=int, nargs="+", default=(1, 5, 10))
    ap.add_argument("--limit-images", type=int, default=None)
    ap.add_argument("--plots", action="store_true",
                    help="save histogram/triptych PNGs next to the metrics")
    ap.add_argument("--out-dir", type=Path, default=Path("zeroshot_analysis"))
    ap.add_argument("overrides", nargs="*", default=())
    args = ap.parse_args()

    from tunevlseg_tpu.config.composer import compose
    from tunevlseg_tpu.data.datasets import ZeroShotDataset
    from tunevlseg_tpu.data.transforms import eval_transforms
    from tunevlseg_tpu.data.tokenizer import load_default_tokenizer
    from tunevlseg_tpu.eval_zeroshot import build_ris
    from tunevlseg_tpu.train import CONFIG_DIR

    cfg = compose(CONFIG_DIR, "eval_zeroshot", list(args.overrides))
    tokenizer = load_default_tokenizer(cfg.get("vocab_path"))
    d = cfg["data"]
    transforms = eval_transforms(cfg.get("img_size", 1024),
                                 cfg.get("img_mean"), cfg.get("img_std"))
    dataset = ZeroShotDataset(
        image_dir=d["image_dir"], mask_dir=d["mask_dir"],
        task_path=d["test_task_path"], prompt_index=cfg["prompt_index"],
        insert_stop_at_last=cfg.get("insert_stop_at_last", True),
        tokenizer=tokenizer, max_length=cfg.get("max_length", 77),
        transforms=transforms, seed=cfg.get("seed", 0))
    ris = build_ris(cfg)
    if args.mode == "topk":
        ris.num_masks = max(args.topk)

    n = len(dataset)
    if args.limit_images is not None:
        n = min(n, args.limit_images)

    max_dices, max_ious = [], []
    per_k = {k: ([], []) for k in args.topk}
    worst = (2.0, None)
    best = (-1.0, None)
    for i in range(n):
        item = dataset[i]
        gt = np.asarray(item["mask"]).squeeze()
        if args.mode == "limit":
            masks, _, valid = ris.get_freesolo_predictions(
                item["image"], cache_name=item.get("cache_name"))
            masks = masks[valid.astype(bool)]
            if not len(masks):
                max_dices.append(0.0)
                max_ious.append(0.0)
                # a zero-proposal image IS the worst case (dice 0): keep it
                # eligible for the worst-example triptych with an empty mask
                if 0.0 < worst[0]:
                    worst = (0.0, (item["image"], gt,
                                   np.zeros_like(gt, dtype=np.float32), 0.0))
                continue
            dice, iou = dice_iou(masks > 0.5, gt > 0.5)
        else:
            pred = ris(item["image"], item["input_ids"],
                       item["attention_mask"],
                       cache_name=item.get("cache_name"))
            dice, iou = dice_iou(pred[:, 0] > 0.5, gt > 0.5)
            for k in args.topk:
                dk, ik = per_k[k]
                dk.append(float(dice[:k].max()) if len(dice) else 0.0)
                ik.append(float(iou[:k].max()) if len(iou) else 0.0)
        md, mi = float(dice.max()), float(iou.max())
        max_dices.append(md)
        max_ious.append(mi)
        amax = int(dice.argmax())
        shown = masks[amax] if args.mode == "limit" else pred[amax, 0]
        if md < worst[0]:
            worst = (md, (item["image"], gt, shown, mi))
        if md > best[0]:
            best = (md, (item["image"], gt, shown, mi))
        if i % 25 == 24:
            print(f"{i + 1}/{n}: running max-dice "
                  f"{np.mean(max_dices):.4f}", file=sys.stderr)

    result = {"mode": args.mode, "images": n,
              "oracle_mean_max_dice": float(np.mean(max_dices)),
              "oracle_mean_max_iou": float(np.mean(max_ious))}
    if args.mode == "topk":
        for k in args.topk:
            dk, ik = per_k[k]
            result[f"top{k}_dice"] = float(np.mean(dk))
            result[f"top{k}_iou"] = float(np.mean(ik))
    print(json.dumps(result))

    args.out_dir.mkdir(parents=True, exist_ok=True)
    (args.out_dir / f"{args.mode}_metrics.json").write_text(
        json.dumps(result, indent=2))
    np.savez(args.out_dir / f"{args.mode}_per_image.npz",
             max_dices=np.array(max_dices), max_ious=np.array(max_ious))

    if args.plots:
        import matplotlib
        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, sharex=True, sharey=True,
                                       figsize=(14, 7))
        ax1.hist(max_dices, bins="auto")
        ax1.set_title("Max Dices")
        ax2.hist(max_ious, bins="auto")
        ax2.set_title("Max IoU")
        fig.savefig(args.out_dir / f"{args.mode}_hist.png", dpi=120)
        plt.close(fig)

        def rescale(img):
            mn = img.min((0, 1))
            return (img - mn) / (img.max((0, 1)) - mn + 1e-8)

        for tag, (score, payload) in (("best", best), ("worst", worst)):
            if payload is None:
                continue
            image, gt, pm, iou = payload
            fig, (a1, a2, a3) = plt.subplots(1, 3, figsize=(20, 7))
            a1.imshow(rescale(np.moveaxis(np.asarray(image), 0, -1)))
            a1.set_title("Original Image")
            a2.imshow(gt)
            a2.set_title("Original Mask")
            a3.imshow(pm)
            a3.set_title(f"Best Prediction: Dice={score:4f}, iou={iou:4f}")
            fig.savefig(args.out_dir / f"{args.mode}_{tag}.png", dpi=120)
            plt.close(fig)


if __name__ == "__main__":
    main()
