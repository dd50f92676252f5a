#!/usr/bin/env python
"""Offline Dice/IoU from saved prediction PNGs vs ground-truth masks.

The cross-implementation check of the reference (scripts/eval_metrics.py):
re-computes metrics from files, independent of the in-loop metric path.
Semantics mirrored: gt thresholded at >127, pred at >threshold; per-image
IoU x100 and Dice x100 with MONAI's ignore_empty=False convention (both
empty -> 1, empty gt with non-empty pred -> 0); the all-ones-dice diff
column; per-image CSV plus mean/std printout. Pure numpy, process pool.

Usage:
    python scripts/eval_metrics.py --seg-path <pred_dir> --gt-path <gt_dir> \
        [--csv-path out.csv] [--threshold 127] [--max-workers N]
"""
from __future__ import annotations

import argparse
import csv
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import cv2
import numpy as np


def _binary_metrics(pred: np.ndarray, gt: np.ndarray) -> dict[str, float]:
    inter = float(np.logical_and(pred, gt).sum())
    p, g = float(pred.sum()), float(gt.sum())

    def dice_of(pred_sum: float, intersection: float) -> float:
        denom = pred_sum + g
        if g > 0:
            return 2.0 * intersection / denom if denom else 0.0
        return 0.0 if pred_sum > 0 else 1.0

    dice = dice_of(p, inter)
    union = p + g - inter
    if g > 0:
        iou = inter / union if union else 0.0
    else:
        iou = 0.0 if p > 0 else 1.0
    ones_dice = dice_of(float(gt.size), g)
    return {"iou": iou * 100, "dice": dice * 100,
            "ones_dice_diff": dice * 100 - ones_dice * 100}


def compute_metrics(args: tuple[Path, Path, int]) -> dict[str, float | str]:
    gt_path, pred_path, threshold = args
    gt = cv2.imread(str(gt_path), cv2.IMREAD_GRAYSCALE)
    pred = cv2.imread(str(pred_path), cv2.IMREAD_GRAYSCALE)
    if gt is None or pred is None:
        raise ValueError(f"unreadable image pair: {gt_path}, {pred_path}")
    if gt.shape != pred.shape:
        raise ValueError(f"size mismatch: {gt_path} {gt.shape} vs "
                         f"{pred_path} {pred.shape}")
    out = _binary_metrics(pred > threshold, gt > 127)
    return {"image": pred_path.name, **out}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seg-path", type=Path, required=True)
    ap.add_argument("--gt-path", type=Path, required=True)
    ap.add_argument("--csv-path", type=Path, default=Path("metrics.csv"))
    ap.add_argument("--threshold", type=int, default=127)
    ap.add_argument("--max-workers", type=int, default=None)
    args = ap.parse_args()

    pred_paths = sorted(p for p in args.seg_path.rglob("*.png"))
    jobs = [(args.gt_path / p.relative_to(args.seg_path), p, args.threshold)
            for p in pred_paths]
    if not jobs:
        raise SystemExit(f"no predictions found under {args.seg_path}")

    with ProcessPoolExecutor(args.max_workers) as pool:
        rows = list(pool.map(compute_metrics, jobs))

    with open(args.csv_path, "w", newline="") as fp:
        writer = csv.DictWriter(fp, fieldnames=list(rows[0]))
        writer.writeheader()
        writer.writerows(rows)

    np.set_printoptions(precision=5)
    for key in ("iou", "dice", "ones_dice_diff"):
        values = np.asarray([r[key] for r in rows], np.float64)
        print(f"{key}: mean={values.mean():.5f} std={values.std():.5f}")
    print(f"wrote {len(rows)} rows to {args.csv_path}")


if __name__ == "__main__":
    main()
