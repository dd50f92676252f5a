#!/usr/bin/env python
"""PhraseCut preparation: rasterize polygon annotations into binary mask PNGs
and emit the framework's JSON task list.

Contract mirrored from reference scripts/reduce_and_save_phrasecut.py +
src/data/core_datasets/open_domain/phrasecutdataset.py:
  * per task (task_id "imgid__...", phrase, Polygons): fill all polygons at
    255 on the source image's canvas;
  * mask name "{task_id}-{safe_phrase}.png" (phrase with "/" -> "\\\\",
    NULs stripped);
  * tasks referencing the known-invalid COCO image ids are dropped;
  * the reduced task JSON keeps {task_id, image_id, phrase, mask_name}.

Usage:
    python scripts/reduce_and_save_phrasecut.py \
        --refer-input-path refer_<split>.json --image-root <VG images> \
        --mask-output-dir masks/ --task-output-path anns/<split>.json
"""
from __future__ import annotations

import argparse
import json
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import cv2
import numpy as np

# invalid COCO-sourced VG image ids (clipseg's exclusion list, mirrored from
# phrasecutdataset.py:74-92)
INVALID_IMAGE_IDS = frozenset((
    150333, 285814, 498246, 498269, 498010, 498042, 498187, 498277, 498344,
    498390, 498393, 498453, 498476, 498504, 498748, 498911, 498921,
))


def safe_phrase(phrase: str) -> str:
    return phrase.replace("\x00", "").replace("/", "\\")


def mask_name_for(task: dict) -> str:
    return f"{task['task_id']}-{safe_phrase(task['phrase'])}.png"


def process_task(task: dict, image_root: Path, mask_dir: Path) -> bool:
    img = cv2.imread(str(image_root / f"{task['image_id']}.jpg"))
    if img is None:
        return False
    mask = np.zeros(img.shape[:2], np.uint8)
    for poly in task["Polygons"]:
        pts = [np.round(np.asarray(p)).astype(np.int32) for p in poly]
        cv2.fillPoly(mask, pts, 255)
    cv2.imwrite(str(mask_dir / mask_name_for(task)), mask)
    return True


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--refer-input-path", type=Path, required=True)
    ap.add_argument("--image-root", type=Path, required=True)
    ap.add_argument("--mask-output-dir", type=Path, required=True)
    ap.add_argument("--task-output-path", type=Path, required=True)
    ap.add_argument("--max-workers", type=int, default=None)
    args = ap.parse_args()

    tasks = json.loads(args.refer_input_path.read_text())
    kept = [t for t in tasks if t["image_id"] not in INVALID_IMAGE_IDS]
    args.mask_output_dir.mkdir(parents=True, exist_ok=True)

    with ProcessPoolExecutor(args.max_workers) as pool:
        ok = list(pool.map(process_task, kept,
                           [args.image_root] * len(kept),
                           [args.mask_output_dir] * len(kept)))

    reduced = [
        {"task_id": t["task_id"], "image_id": t["image_id"],
         "phrase": t["phrase"], "mask_name": mask_name_for(t)}
        for t, good in zip(kept, ok) if good
    ]
    args.task_output_path.parent.mkdir(parents=True, exist_ok=True)
    args.task_output_path.write_text(json.dumps(reduced))
    print(f"kept {len(reduced)}/{len(tasks)} tasks")


if __name__ == "__main__":
    main()
