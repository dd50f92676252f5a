"""Tests for the ops-tooling scripts and open-domain datasets."""
import json
import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
VOCAB = "/root/reference/src/models/components/denseclip/bpe_simple_vocab_16e6.txt.gz"


def test_eval_metrics_cli(tmp_path):
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    gt = np.zeros((20, 20), np.uint8)
    gt[5:15, 5:15] = 255
    pred = np.zeros((20, 20), np.uint8)
    pred[5:15, 5:10] = 255  # half overlap
    cv2.imwrite(str(gt_dir / "a.png"), gt)
    cv2.imwrite(str(pred_dir / "a.png"), pred)
    # empty pair -> dice 100 (ignore_empty=False convention)
    cv2.imwrite(str(gt_dir / "b.png"), np.zeros((8, 8), np.uint8))
    cv2.imwrite(str(pred_dir / "b.png"), np.zeros((8, 8), np.uint8))

    csv_path = tmp_path / "out.csv"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "eval_metrics.py"),
         "--seg-path", str(pred_dir), "--gt-path", str(gt_dir),
         "--csv-path", str(csv_path), "--max-workers", "1"],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 images
    by_name = {r.split(",")[0]: r.split(",") for r in rows[1:]}
    # a: dice = 2*50/(50+100) = 66.67, iou = 50/100 = 50
    assert abs(float(by_name["a.png"][1]) - 50.0) < 1e-6
    assert abs(float(by_name["a.png"][2]) - 200 / 3) < 1e-4
    assert float(by_name["b.png"][2]) == 100.0


def test_binarize_cityscapes_roundtrip(tmp_path):
    root = tmp_path / "cityscapes"
    for split in ("train", "val"):
        (root / "gtFine" / split / "cityA").mkdir(parents=True)
        (root / "leftImg8bit" / split / "cityA").mkdir(parents=True)
        mask = np.zeros((32, 32), np.uint8)
        mask[:16] = 26   # car
        mask[16:] = 23   # sky
        cv2.imwrite(str(root / "gtFine" / split / "cityA" /
                        "cityA_000_gtFine_labelIds.png"), mask)
        cv2.imwrite(str(root / "leftImg8bit" / split / "cityA" /
                        "cityA_000_leftImg8bit.png"),
                    np.zeros((32, 32, 3), np.uint8))
    dump = tmp_path / "dump"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "binarize_cityscapes.py"),
         str(root), str(dump), "--max-workers", "1"],
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    car = cv2.imread(str(dump / "annotations" / "validation" / "car" /
                         "cityA_000.png"), cv2.IMREAD_GRAYSCALE)
    assert car is not None and car[:16].min() == 255 and car[16:].max() == 0
    assert (dump / "annotations" / "validation" / "sky").is_dir()
    assert not (dump / "annotations" / "validation" / "person").exists()


@pytest.mark.skipif(not Path(VOCAB).exists(), reason="vocab unavailable")
def test_phrasecut_dataset(tmp_path):
    from tunevlseg_tpu.data.open_domain import PhraseCutDataset
    from tunevlseg_tpu.data.tokenizer import CLIPTokenizer
    from tunevlseg_tpu.data.transforms import eval_transforms

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    tasks = []
    for img_id, phrase in ((10, "red car"), (11, "blue/green tree"),
                           (498246, "excluded")):
        cv2.imwrite(str(tmp_path / "images" / f"{img_id}.jpg"),
                    np.zeros((24, 24, 3), np.uint8))
        tid = f"{img_id}__0"
        safe = phrase.replace("/", "\\")
        cv2.imwrite(str(tmp_path / "masks" / f"{tid}-{safe}.png"),
                    np.full((24, 24), 255, np.uint8))
        tasks.append({"task_id": tid, "phrase": phrase})
    (tmp_path / "tasks.json").write_text(json.dumps(tasks))

    ds = PhraseCutDataset(
        image_dir=tmp_path / "images", mask_dir=tmp_path / "masks",
        task_path=tmp_path / "tasks.json", prompt_method="shuffle",
        tokenizer=CLIPTokenizer(VOCAB), transforms=eval_transforms(16))
    assert len(ds) == 2  # invalid COCO id excluded
    item = ds[0]
    assert "red car" in item["prompt"]
    assert item["mask"].max() == 1.0

    # negatives: neg_prob=1 always swaps phrase and zeroes the mask
    ds_neg = PhraseCutDataset(
        image_dir=tmp_path / "images", mask_dir=tmp_path / "masks",
        task_path=tmp_path / "tasks.json", prompt_method="fixed", neg_prob=1.0,
        tokenizer=CLIPTokenizer(VOCAB), transforms=eval_transforms(16))
    item = ds_neg[0]
    assert "red car" not in item["prompt"]
    assert item["mask"].max() == 0.0


@pytest.mark.skipif(not Path(VOCAB).exists(), reason="vocab unavailable")
def test_refcoco_dataset(tmp_path):
    from tunevlseg_tpu.data.open_domain import RefCOCODataset
    from tunevlseg_tpu.data.tokenizer import CLIPTokenizer
    from tunevlseg_tpu.data.transforms import eval_transforms

    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    cv2.imwrite(str(tmp_path / "images" / "img1.jpg"),
                np.zeros((20, 20, 3), np.uint8))
    cv2.imwrite(str(tmp_path / "masks" / "1-2-3.png"),
                np.full((20, 20), 255, np.uint8))
    tasks = [{"image_id": 1, "image_name": "img1.jpg", "ann_id": 2,
              "sent_id": 3, "phrase": "the left dog"}]
    (tmp_path / "tasks.json").write_text(json.dumps(tasks))
    ds = RefCOCODataset(
        image_dir=tmp_path / "images", mask_dir=tmp_path / "masks",
        task_path=tmp_path / "tasks.json",
        tokenizer=CLIPTokenizer(VOCAB), transforms=eval_transforms(16))
    item = ds[0]
    assert item["mask_name"] == "1-2-3.png"
    assert item["prompt"] == "a photo of the left dog."


def test_optional_logger_backends(tmp_path, monkeypatch):
    """mlflow/neptune/comet/aim (configs/logger/*.yaml, VERDICT r2 #10):
    absent packages degrade with a warning; an installable one (stubbed
    mlflow here) round-trips metrics + hparams + close."""
    import sys
    import types

    from tunevlseg_tpu.utils.logging import MANY_LOGGERS, MultiLogger

    calls = {"metrics": [], "params": [], "ended": 0}
    stub = types.ModuleType("mlflow")
    stub.set_tracking_uri = lambda uri: calls.setdefault("uri", uri)
    stub.set_experiment = lambda name: calls.setdefault("exp", name)
    stub.start_run = lambda run_name=None: calls.setdefault("run", run_name)
    stub.set_tags = lambda tags: calls.setdefault("tags", tags)
    stub.log_metrics = lambda m, step=None: calls["metrics"].append((m, step))
    stub.log_params = lambda p: calls["params"].append(p)
    stub.end_run = lambda: calls.__setitem__("ended", calls["ended"] + 1)
    monkeypatch.setitem(sys.modules, "mlflow", stub)

    # neptune/comet/aim are NOT installed -> warning + graceful skip
    ml = MultiLogger(tmp_path, backends=("jsonl", "mlflow", "neptune",
                                         "comet", "aim"),
                     project="proj", exp_name="run1", tags=("t1",))
    assert len(ml._extra) == 1  # only the stubbed mlflow constructed
    ml.log_hyperparams({"model": "clipseg"}, extras={"n": 1})
    ml.log({"loss": 0.5}, step=3)
    ml.close()
    assert calls["exp"] == "proj" and calls["run"] == "run1"
    assert calls["metrics"] == [({"loss": 0.5}, 3)]
    assert calls["params"] and calls["ended"] == 1

    # a backend that explodes mid-run must not take down training
    class Boom:
        def log(self, record, step):
            raise RuntimeError("backend down")

    ml2 = MultiLogger(tmp_path, backends=("jsonl",))
    ml2._extra.append(Boom())
    ml2.log({"loss": 1.0}, step=1)  # no raise

    # many_loggers expands to the offline-safe set
    ml3 = MultiLogger(tmp_path, backends=("many_loggers",))
    assert set(MANY_LOGGERS) <= set(ml3.backends)
    ml3.close()


def test_multi_logger_backends(tmp_path):
    import json as _json

    import numpy as _np

    from tunevlseg_tpu.utils.logging import MultiLogger

    ml = MultiLogger(tmp_path, backends=("jsonl", "csv", "tensorboard"))
    ml.log({"loss": 1.25, "dice": 0.5}, step=1, prefix="train_")
    ml.log({"loss": 1.0, "val_iou": 0.4}, step=2, prefix="train_")
    ml.log_images("val_caption_label",
                  [_np.zeros((8, 8)), _np.ones((8, 8, 3)) * 0.5],
                  step=2, captions=["a", "b"])
    ml.close()

    lines = [(tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(lines[0]) == 3
    img_rec = _json.loads(lines[0][-1])
    assert len(img_rec["images"]) == 2
    import os
    assert all(os.path.exists(p) for p in img_rec["images"])

    csv_text = (tmp_path / "metrics.csv").read_text().splitlines()
    assert csv_text[0].split(",")[:2] == ["train_loss", "train_dice"]
    assert len(csv_text) == 3  # header + 2 rows (union-of-keys header)
    assert (tmp_path / "tb").is_dir() and any((tmp_path / "tb").iterdir())


def test_analyze_prompts_script(tmp_path):
    import numpy as _np
    import orbax.checkpoint as ocp

    import importlib.util as _ilu
    spec = _ilu.spec_from_file_location(
        "analyze_prompts", "/root/repo/scripts/analyze_prompts.py")
    ap = _ilu.module_from_spec(spec)
    spec.loader.exec_module(ap)

    rng = _np.random.default_rng(0)
    ckpt = tmp_path / "run" / "checkpoints"
    ckpt.mkdir(parents=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save((ckpt / "best").resolve(), {
        "trainable": {"learner": {
            "context_vectors": rng.normal(size=(2, 4, 16)).astype("f4")}},
        "step": _np.int32(3)})
    ckptr.save((ckpt / "frozen").resolve(), {
        "params": {"text": {"token_embedding": {
            "embedding": rng.normal(size=(99, 16)).astype("f4")}}}})
    ckptr.wait_until_finished()

    out = tmp_path / "analysis"
    reports = ap.analyze([tmp_path / "run"], out)
    assert len(reports) == 1
    assert reports[0]["shape"] == [2, 4, 16]
    assert len(reports[0]["nearest_token_ids"]) == 8  # 2*4 vectors, top-3 ids
    assert (out / "contexts.json").exists()
    assert (out / "pca.csv").exists()
    xy = _np.loadtxt(out / "pca.csv", delimiter=",", skiprows=1)
    assert xy.shape == (8, 3)
    assert (out / "tsne.csv").exists()


def test_export_model_roundtrip(tmp_path):
    """AOT serving export (scripts/export_model.py): serialize the tiny
    flagship predict to StableHLO, deserialize WITHOUT the script, and the
    call must match direct model.apply on the same weights (bf16 towers:
    fusion differences allow ~1e-2 on sigmoid outputs)."""
    import importlib.util

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    spec = importlib.util.spec_from_file_location(
        "export_model", "scripts/export_model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    model, _ = mod.build("coop_clipseg", tiny=True)
    exported, params = mod.export_predict(model, batch=2, img=32, seq=12)
    blob = exported.serialize()
    out = tmp_path / "m.stablehlo"
    out.write_bytes(blob)
    assert out.stat().st_size > 1000

    rng = np.random.default_rng(3)
    ids = np.full((2, 12), 5, np.int32)
    ids[:, 0], ids[:, -1] = 49406, 49407
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    mask = np.ones((2, 12), np.int32)

    reloaded = jexport.deserialize(out.read_bytes())
    got = reloaded.call(params, jnp.asarray(ids), jnp.asarray(img),
                        jnp.asarray(mask))
    want = jax.nn.sigmoid(model.apply(params, jnp.asarray(ids),
                                      jnp.asarray(img), jnp.asarray(mask)
                                      ).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2)
