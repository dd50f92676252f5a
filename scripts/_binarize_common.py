"""Shared machinery for the dataset binarization scripts.

Converts multi-class semantic-segmentation ground truth into the framework's
binary `ImageDirTextMaskDataset` layout (data/datasets.py):

    <dump>/images/<split>/<image>.png
    <dump>/annotations/<split>/<class_name>/<image>.png   (0/255 masks)

The class name doubles as the text prompt for the zero-shot suites
(reference scripts/binarize_*.py semantics).
"""
from __future__ import annotations

import shutil
from concurrent.futures import ProcessPoolExecutor, as_completed
from pathlib import Path
from typing import Callable, Iterable, Optional, Sequence

import cv2
import numpy as np

MaskExtractor = Callable[[np.ndarray, object], Optional[np.ndarray]]


def extract_id_mask(mask: np.ndarray, class_id: int) -> Optional[np.ndarray]:
    """Label-id encoded ground truth (Cityscapes labelIds, ADE20k, VOC
    SegmentationClass ids)."""
    if class_id not in mask:
        return None
    return (mask == class_id).astype(np.uint8) * 255


def extract_color_mask(mask_rgb: np.ndarray,
                       color: Sequence[int]) -> Optional[np.ndarray]:
    """Color-palette encoded ground truth (VOC color PNGs)."""
    hit = np.all(mask_rgb == np.asarray(color, np.uint8), axis=-1)
    if not hit.any():
        return None
    return hit.astype(np.uint8) * 255


def binarize_one(mask_path: Path, image_path: Path, out_stem: str,
                 classes: Iterable, extractor: MaskExtractor,
                 annotations_dir: Path, images_dir: Path,
                 read_flags: int = cv2.IMREAD_UNCHANGED,
                 to_rgb: bool = False) -> int:
    mask = cv2.imread(str(mask_path), read_flags)
    if mask is None:
        raise ValueError(f"unreadable mask: {mask_path}")
    if to_rgb and mask.ndim == 3:
        mask = cv2.cvtColor(mask, cv2.COLOR_BGR2RGB)

    written = 0
    for name, key in classes:
        binary = extractor(mask, key)
        if binary is None:
            continue
        out_dir = annotations_dir / name
        out_dir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out_dir / f"{out_stem}.png"), binary)
        written += 1
    if written:
        dst = images_dir / f"{out_stem}{image_path.suffix}"
        if not dst.exists():
            images_dir.mkdir(parents=True, exist_ok=True)
            shutil.copy(image_path, dst)
    return written


def run_binarize(pairs: Sequence[tuple[Path, Path, str]], classes, extractor,
                 annotations_dir: Path, images_dir: Path,
                 max_workers: Optional[int] = None,
                 read_flags: int = cv2.IMREAD_UNCHANGED,
                 to_rgb: bool = False) -> int:
    total = 0
    with ProcessPoolExecutor(max_workers) as pool:
        futures = {
            pool.submit(binarize_one, m, i, stem, classes, extractor,
                        annotations_dir, images_dir, read_flags, to_rgb): m
            for m, i, stem in pairs
        }
        for n, fut in enumerate(as_completed(futures), 1):
            total += fut.result()
            if n % 200 == 0:
                print(f"processed {n}/{len(pairs)} masks, "
                      f"{total} class masks written")
    print(f"done: {len(pairs)} masks -> {total} class masks")
    return total
