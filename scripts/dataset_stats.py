#!/usr/bin/env python
"""Dataset statistics utilities, consolidating the reference's ad-hoc
get_mask_mean.py / get_shape_info.py / get_duplicate_pairs.py scripts into
one CLI with explicit paths.

  mask-mean:  mean mask intensity over a directory (and the matching logit
              bias via -log((1-p)/p) — the `output_bias` recipe used by
              configs/experiment/phrasecut.yaml)
  shape-info: min/max/mean/std of image dimensions
  duplicates: phrase-duplicate mask files ("taskid-phrase.png" layout)
"""
from __future__ import annotations

import argparse
import math
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import cv2
import numpy as np


def _mask_mean(path: Path) -> float:
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise ValueError(f"unreadable: {path}")
    return float(img.mean()) / 255.0


def cmd_mask_mean(args) -> None:
    paths = sorted(args.mask_dir.glob(args.glob))
    with ProcessPoolExecutor(args.max_workers) as pool:
        means = list(pool.map(_mask_mean, paths))
    p = float(np.mean(means))
    print(f"files: {len(means)}  mean foreground fraction: {p:.6f}")
    if 0 < p < 1:
        print(f"suggested output_bias (logit of mean): "
              f"{-math.log((1 - p) / p):.6f}")


def cmd_shape_info(args) -> None:
    shapes = []
    for path in sorted(args.image_dir.glob(args.glob)):
        img = cv2.imread(str(path))
        if img is not None:
            shapes.append(img.shape[:2])
    arr = np.asarray(shapes)
    print(f"images: {len(arr)}")
    for name, fn in (("min", arr.min), ("max", arr.max),
                     ("mean", arr.mean), ("std", arr.std)):
        print(f"{name}: {fn(0)}")


def cmd_duplicates(args) -> None:
    seen: set[str] = set()
    dups = 0
    for path in sorted(args.mask_dir.glob("*.png")):
        if "-" not in path.stem:
            continue
        _, phrase = path.stem.split("-", 1)
        if phrase in seen:
            dups += 1
            print(path)
        else:
            seen.add(phrase)
    print(f"non-unique image-phrase pairs: {dups}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("mask-mean")
    p.add_argument("mask_dir", type=Path)
    p.add_argument("--glob", default="*.png")
    p.add_argument("--max-workers", type=int, default=None)
    p.set_defaults(fn=cmd_mask_mean)

    p = sub.add_parser("shape-info")
    p.add_argument("image_dir", type=Path)
    p.add_argument("--glob", default="*.jpg")
    p.set_defaults(fn=cmd_shape_info)

    p = sub.add_parser("duplicates")
    p.add_argument("mask_dir", type=Path)
    p.set_defaults(fn=cmd_duplicates)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
