#!/usr/bin/env python
"""RefCOCO(+/g) preparation: rasterize referring-expression annotations into
binary mask PNGs + JSON task list.

Contract mirrored from reference scripts/reduce_and_save_refcoco.py and
src/data/core_datasets/open_domain/refcocodataset.py: tasks carry
{image_id, image_name, ann_id, sent_id, phrase}; masks are named
"{image_id}-{ann_id}-{sent_id}.png".

Input: a flattened task JSON with `Polygons` per task (as produced by the
standard refer-toolkit export).
"""
from __future__ import annotations

import argparse
import json
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import cv2
import numpy as np


def output_name(task: dict) -> str:
    return f"{task['image_id']}-{task['ann_id']}-{task['sent_id']}.png"


def process_task(task: dict, image_root: Path, mask_dir: Path) -> bool:
    img = cv2.imread(str(image_root / task["image_name"]))
    if img is None:
        return False
    mask = np.zeros(img.shape[:2], np.uint8)
    for poly in task["Polygons"]:
        pts = [np.round(np.asarray(p)).astype(np.int32) for p in poly]
        cv2.fillPoly(mask, pts, 255)
    cv2.imwrite(str(mask_dir / output_name(task)), mask)
    return True


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task-input-path", type=Path, required=True)
    ap.add_argument("--image-root", type=Path, required=True)
    ap.add_argument("--mask-output-dir", type=Path, required=True)
    ap.add_argument("--task-output-path", type=Path, required=True)
    ap.add_argument("--max-workers", type=int, default=None)
    args = ap.parse_args()

    tasks = json.loads(args.task_input_path.read_text())
    args.mask_output_dir.mkdir(parents=True, exist_ok=True)
    with ProcessPoolExecutor(args.max_workers) as pool:
        ok = list(pool.map(process_task, tasks,
                           [args.image_root] * len(tasks),
                           [args.mask_output_dir] * len(tasks)))
    reduced = [
        {"image_id": t["image_id"], "image_name": t["image_name"],
         "ann_id": t["ann_id"], "sent_id": t["sent_id"],
         "phrase": t["phrase"]}
        for t, good in zip(tasks, ok) if good
    ]
    args.task_output_path.parent.mkdir(parents=True, exist_ok=True)
    args.task_output_path.write_text(json.dumps(reduced))
    print(f"wrote {len(reduced)}/{len(tasks)} tasks")


if __name__ == "__main__":
    main()
