#!/usr/bin/env python
"""Binarize ADE20k (SceneParse150) annotations into per-class 0/255 masks
(reference scripts/binarize_ade20k.py semantics: label ids 1..150 from the
scene-parsing benchmark; class names via --names-file, one per line in id
order, e.g. the objectInfo150 names).

Usage: python scripts/binarize_ade20k.py <ADEChallengeData2016_root> <dump> \
           --names-file objectnames.txt
"""
from __future__ import annotations

import argparse
from pathlib import Path

from _binarize_common import extract_id_mask, run_binarize


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ade_root", type=Path)
    ap.add_argument("dump_path", type=Path)
    ap.add_argument("--names-file", type=Path, required=True)
    ap.add_argument("--max-workers", type=int, default=None)
    args = ap.parse_args()

    names = [ln.strip() for ln in args.names_file.read_text().splitlines()
             if ln.strip()]
    classes = [(name, i + 1) for i, name in enumerate(names)]

    for split in ("training", "validation"):
        ann_root = args.ade_root / "annotations" / split
        img_root = args.ade_root / "images" / split
        masks = sorted(ann_root.glob("*.png"))
        if not masks:
            raise FileNotFoundError(f"no masks under {ann_root}")
        pairs = [(m, img_root / f"{m.stem}.jpg", m.stem) for m in masks]
        run_binarize(pairs, classes, extract_id_mask,
                     args.dump_path / "annotations" / split,
                     args.dump_path / "images" / split,
                     args.max_workers)


if __name__ == "__main__":
    main()
