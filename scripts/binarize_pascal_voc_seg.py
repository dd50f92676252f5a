#!/usr/bin/env python
"""Binarize Pascal VOC 2012 SegmentationClass color masks into per-class
0/255 masks (reference scripts/binarize_pascal_voc_seg.py semantics: the 20
object classes matched by their palette colors).

Usage: python scripts/binarize_pascal_voc_seg.py <VOC2012_root> <dump_path>
"""
from __future__ import annotations

import argparse
from pathlib import Path

import cv2

from _binarize_common import extract_color_mask, run_binarize

VOC_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor")


def voc_palette_color(index: int) -> tuple[int, int, int]:
    """The standard VOC color palette (bit-interleaved generator)."""
    c, color = index, [0, 0, 0]
    for shift in range(8):
        for ch in range(3):
            color[ch] |= ((c >> ch) & 1) << (7 - shift)
        c >>= 3
    return tuple(color)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("voc_root", type=Path)
    ap.add_argument("dump_path", type=Path)
    ap.add_argument("--split-file", type=Path, default=None,
                    help="ImageSets/Segmentation list (default: val.txt)")
    ap.add_argument("--split-name", default="validation")
    ap.add_argument("--max-workers", type=int, default=None)
    args = ap.parse_args()

    classes = [(name, voc_palette_color(i + 1))
               for i, name in enumerate(VOC_CLASSES)]
    split_file = args.split_file or (
        args.voc_root / "ImageSets" / "Segmentation" / "val.txt")
    stems = split_file.read_text().split()
    pairs = [(args.voc_root / "SegmentationClass" / f"{s}.png",
              args.voc_root / "JPEGImages" / f"{s}.jpg", s) for s in stems]
    run_binarize(pairs, classes, extract_color_mask,
                 args.dump_path / "annotations" / args.split_name,
                 args.dump_path / "images" / args.split_name,
                 args.max_workers, read_flags=cv2.IMREAD_COLOR, to_rgb=True)


if __name__ == "__main__":
    main()
