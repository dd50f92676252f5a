"""Smoke tests for the notebook-port analysis scripts
(scripts/analyze_phrasecut.py, scripts/analyze_zeroshot.py)."""
import json
import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _make_phrasecut(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    tasks = []
    rng = np.random.default_rng(0)
    for img_id, phrase in ((10, "red car"), (11, "tree"), (12, "red car")):
        cv2.imwrite(str(tmp_path / "images" / f"{img_id}.jpg"),
                    rng.integers(0, 255, (24, 32, 3)).astype(np.uint8))
        tid = f"{img_id}__0"
        cv2.imwrite(str(tmp_path / "masks" / f"{tid}-{phrase}.png"),
                    np.full((24, 32), 255, np.uint8))
        tasks.append({"task_id": tid, "phrase": phrase})
    (tmp_path / "tasks.json").write_text(json.dumps(tasks))
    return tmp_path


def test_analyze_phrasecut(tmp_path):
    root = _make_phrasecut(tmp_path)
    out = tmp_path / "analysis"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "analyze_phrasecut.py"),
         "--task-json", str(root / "tasks.json"),
         "--image-dir", str(root / "images"),
         "--mask-dir", str(root / "masks"),
         "--target-size", "16", "--plots", "--out-dir", str(out)],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    stats = json.loads((out / "stats.json").read_text())
    assert stats["tasks"] == 3
    assert stats["unique_phrases"] == 2
    assert stats["images_per_phrase"]["max"] == 2
    assert stats["image_shapes"]["scanned"] == 3
    # SmallestMaxSize(16) on 24x32: scale 16/24 -> (16, 21), headroom (0, 5)
    assert stats["crop_headroom_after_smallest_max_size"]["max_extra_hw"] \
        == [0, 5]
    assert (out / "images_per_phrase.png").exists()


VOCAB = ("/root/reference/src/models/components/denseclip/"
         "bpe_simple_vocab_16e6.txt.gz")


@pytest.mark.skipif(not Path(VOCAB).exists(), reason="vocab unavailable")
def test_analyze_zeroshot_limit_and_topk(tmp_path):
    """End-to-end `limit` + `topk` on a tiny synthetic zero-shot suite
    (tiny models, random weights) — the freesolo_limit / zero-shot-topk
    notebook ports."""
    root = tmp_path / "data" / "zsds"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    (root / "anns").mkdir()
    rng = np.random.default_rng(0)
    tasks = []
    for i in range(2):
        cv2.imwrite(str(root / "images" / f"{i}.png"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        cv2.imwrite(str(root / "masks" / f"{i}.png"),
                    np.full((64, 64), 255, np.uint8))
        tasks.append({"img_name": f"{i}.png", "mask_name": f"{i}.png",
                      "prompts": {"p0": "a thing"},
                      "object_class": "thing"})
    (root / "anns" / "test.json").write_text(json.dumps(tasks))

    overrides = [
        "ds_name=zsds",
        f"paths.data_root={tmp_path / 'data'}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "+tiny_model=true",
        "img_size=64",
    ]
    import os
    env = {**os.environ, "TUNEVLSEG_FORCE_CPU": "1"}
    for mode, extra in (("limit", []), ("topk", ["--topk", "1", "2"])):
        out = tmp_path / f"zs_{mode}"
        res = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "analyze_zeroshot.py"),
             mode, *extra, "--plots", "--out-dir", str(out), "--",
             *overrides],
            capture_output=True, text=True, env=env)
        assert res.returncode == 0, res.stderr
        metrics = json.loads((out / f"{mode}_metrics.json").read_text())
        assert metrics["images"] == 2
        assert 0.0 <= metrics["oracle_mean_max_dice"] <= 1.0
        assert (out / f"{mode}_hist.png").exists()
    assert "top1_dice" in metrics and "top2_dice" in metrics
