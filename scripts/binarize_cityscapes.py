#!/usr/bin/env python
"""Binarize Cityscapes gtFine labelIds into per-class 0/255 masks.

Output layout + semantics match reference scripts/binarize_cityscapes.py:
the 19 evaluation classes (ignoreInEval=False in the official label table),
masks written under annotations/<split_long>/<class_name>/, source images
copied once with the `_leftImg8bit` suffix stripped.

Usage: python scripts/binarize_cityscapes.py <cityscapes_root> <dump_path>
"""
from __future__ import annotations

import argparse
from pathlib import Path

from _binarize_common import extract_id_mask, run_binarize

# (name, labelId) for the official 19 eval classes
EVAL_CLASSES = (
    ("road", 7), ("sidewalk", 8), ("building", 11), ("wall", 12),
    ("fence", 13), ("pole", 17), ("traffic light", 19), ("traffic sign", 20),
    ("vegetation", 21), ("terrain", 22), ("sky", 23), ("person", 24),
    ("rider", 25), ("car", 26), ("truck", 27), ("bus", 28), ("train", 31),
    ("motorcycle", 32), ("bicycle", 33),
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cityscapes_path", type=Path)
    ap.add_argument("dump_path", type=Path)
    ap.add_argument("--max-workers", type=int, default=None)
    args = ap.parse_args()

    for split, split_long in (("train", "training"), ("val", "validation")):
        ann_root = args.cityscapes_path / "gtFine" / split
        img_root = args.cityscapes_path / "leftImg8bit" / split
        masks = sorted(ann_root.rglob("*gtFine_labelIds.png"))
        if not masks:
            raise FileNotFoundError(f"no masks under {ann_root}")
        pairs = []
        for m in masks:
            city = m.parent.name
            img = img_root / city / m.name.replace("gtFine_labelIds",
                                                   "leftImg8bit")
            stem = m.name.replace("_gtFine_labelIds.png", "")
            pairs.append((m, img, stem))
        run_binarize(
            pairs, EVAL_CLASSES, extract_id_mask,
            args.dump_path / "annotations" / split_long,
            args.dump_path / "images" / split_long,
            args.max_workers)


if __name__ == "__main__":
    main()
