"""Data pipeline tests: tokenizer parity, dataset formats, loader batching,
transforms, and hand-verified loss/metric values."""
import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from tunevlseg_tpu.data.datasets import ImageDirTextMaskDataset, ImageTextMaskDataset
from tunevlseg_tpu.data.pipeline import DataLoader, collate, device_batch
from tunevlseg_tpu.data.tokenizer import CLIPTokenizer, load_default_tokenizer
from tunevlseg_tpu.data.transforms import eval_transforms, train_transforms

VOCAB = "/root/reference/src/models/components/denseclip/bpe_simple_vocab_16e6.txt.gz"
pytestmark = pytest.mark.skipif(not Path(VOCAB).exists(),
                                reason="CLIP vocab not available")


@pytest.fixture(scope="module")
def tokenizer():
    return CLIPTokenizer(VOCAB)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "images").mkdir()
    (root / "masks").mkdir()
    (root / "anns").mkdir()
    rng = np.random.default_rng(0)
    tasks = []
    for i in range(10):
        img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
        mask = np.zeros((48, 64), np.uint8)
        mask[10:30, 20:40] = 255
        cv2.imwrite(str(root / "images" / f"img{i}.png"), img)
        cv2.imwrite(str(root / "masks" / f"m{i}.png"), mask)
        tasks.append({"img_name": f"img{i}.png", "mask_name": f"m{i}.png",
                      "prompts": {"p0": "polyp", "p1": ["a polyp", "the polyp"]}})
    for split in ("train", "val"):
        (root / "anns" / f"{split}.json").write_text(json.dumps(tasks))
    return root


def test_tokenizer_basics(tokenizer):
    out = tokenizer(["a photo of a dog."])
    ids = out["input_ids"][0]
    assert ids[0] == 49406
    assert ids[out["attention_mask"][0].sum() - 1] == 49407
    assert (ids[out["attention_mask"][0].sum():] == 49407).all()  # hf pad=eos
    oai = tokenizer(["a photo of a dog."], style="openai")["input_ids"][0]
    assert (oai[np.argmax(oai == 49407) + 1:] == 0).all()
    assert tokenizer.decode(ids) == "a photo of a dog ."


def test_image_text_mask_dataset(tokenizer, dataset_dir):
    ds = ImageTextMaskDataset(
        image_dir=dataset_dir / "images", mask_dir=dataset_dir / "masks",
        task_path=dataset_dir / "anns" / "train.json", prompt_index=0,
        insert_stop_at_last=True, tokenizer=tokenizer,
        transforms=eval_transforms(32))
    item = ds[0]
    assert item["image"].shape == (3, 32, 32)
    assert item["mask"].shape == (1, 32, 32)
    assert item["prompt"] == "polyp."
    assert set(np.unique(item["mask"])) <= {0.0, 1.0}
    assert item["input_ids"].shape == (77,)

    # random prompt selection never picks p0
    ds_rand = ImageTextMaskDataset(
        image_dir=dataset_dir / "images", mask_dir=dataset_dir / "masks",
        task_path=dataset_dir / "anns" / "train.json", prompt_index=-1,
        tokenizer=tokenizer, transforms=eval_transforms(32), seed=3)
    prompts = {ds_rand[i]["prompt"] for i in range(10)}
    assert prompts <= {"a polyp", "the polyp"}


def test_train_transforms_shapes(tokenizer, dataset_dir):
    ds = ImageTextMaskDataset(
        image_dir=dataset_dir / "images", mask_dir=dataset_dir / "masks",
        task_path=dataset_dir / "anns" / "train.json", prompt_index=0,
        tokenizer=tokenizer, transforms=train_transforms(32), seed=1)
    for i in range(5):
        item = ds[i]
        assert item["image"].shape == (3, 32, 32)
        assert item["mask"].shape == (1, 32, 32)


def test_loader_batching_and_padding(tokenizer, dataset_dir):
    ds = ImageTextMaskDataset(
        image_dir=dataset_dir / "images", mask_dir=dataset_dir / "masks",
        task_path=dataset_dir / "anns" / "train.json", prompt_index=0,
        tokenizer=tokenizer, transforms=eval_transforms(32))
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=0, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["valid"].sum() == 2  # 10 = 4+4+2
    assert batches[0]["image"].shape == (4, 3, 32, 32)
    db = device_batch(batches[0])
    assert set(db) == {"image", "mask", "input_ids", "attention_mask", "valid"}

    # deterministic order per (seed, epoch); different across epochs
    names_e0 = [n for b in DataLoader(ds, 4, True, 0, 2) for n in b["mask_name"]]
    loader2 = DataLoader(ds, 4, True, 0, 2)
    names_e0b = [n for b in loader2 for n in b["mask_name"]]
    assert names_e0 == names_e0b
    loader2.set_epoch(1)
    names_e1 = [n for b in loader2 for n in b["mask_name"]]
    assert names_e0 != names_e1


def test_image_dir_dataset(tokenizer, tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "masks" / "car").mkdir(parents=True)
    img = np.zeros((16, 16, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "a.png"), img)
    cv2.imwrite(str(tmp_path / "masks" / "car" / "a.png"),
                np.full((16, 16), 255, np.uint8))
    ds = ImageDirTextMaskDataset(
        image_dir=tmp_path / "images", mask_dir=tmp_path / "masks",
        insert_stop_at_last=True, tokenizer=tokenizer,
        transforms=eval_transforms(16))
    assert len(ds) == 1
    item = ds[0]
    assert item["prompt"] == "car."
    assert item["mask"].max() == 1.0


def test_loss_hand_values():
    """DiceCE on a hand-computable case."""
    import jax.numpy as jnp

    from tunevlseg_tpu.ops.losses import (binary_cross_entropy_with_logits,
                                          dice_ce_loss, dice_loss)
    logits = jnp.full((1, 1, 2, 2), 100.0)   # sigmoid ~= 1
    target = jnp.ones((1, 1, 2, 2))
    # perfect prediction: dice -> 1 - (2*4 + nr)/(8 + dr) ~= 0, bce ~= 0
    assert float(dice_ce_loss(logits, target)) < 1e-4

    logits0 = jnp.full((1, 1, 2, 2), -100.0)  # predicts empty
    # dice: 1 - (0 + 1e-5)/(4 + 1e-5) ~= 1; bce = 100
    d = float(dice_loss(logits0, target))
    np.testing.assert_allclose(d, 1.0 - 1e-5 / (4 + 1e-5), rtol=1e-5)
    b = float(binary_cross_entropy_with_logits(logits0, target))
    np.testing.assert_allclose(b, 100.0, rtol=1e-5)
    np.testing.assert_allclose(float(dice_ce_loss(logits0, target)),
                               d + 0.2 * b, rtol=1e-5)


def test_metric_hand_values():
    import jax.numpy as jnp

    from tunevlseg_tpu.ops.metrics import SegMetricState, compute, update_state
    probs = jnp.asarray([[[[0.9, 0.1], [0.8, 0.2]]],
                         [[[0.0, 0.0], [0.0, 0.0]]]])
    target = jnp.asarray([[[[1.0, 0.0], [0.0, 1.0]]],
                          [[[0.0, 0.0], [0.0, 0.0]]]])
    st = update_state(SegMetricState.zeros(), probs, target)
    # sample 0: tp=1 fp=1 fn=1 -> dice = 2/(2+1+1) = 0.5
    # sample 1: empty/empty -> dice = zero_division = 1
    res = compute(st)
    np.testing.assert_allclose(float(res["dice"]), 0.75)
    # global iou: tp=1, fp=1, fn=1 -> 1/3
    np.testing.assert_allclose(float(res["iou"]), 1 / 3)


def test_device_side_normalization_matches_host(tokenizer, dataset_dir):
    """uint8 host path + device-side (x/255-mean)/std == host Normalize."""
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.clip.config import CLIPSegConfig
    from tunevlseg_tpu.models.clipseg.model import CLIPSegForSegmentation
    from tunevlseg_tpu.training.task import SegmentationTask

    ds_f32 = ImageTextMaskDataset(
        image_dir=dataset_dir / "images", mask_dir=dataset_dir / "masks",
        task_path=dataset_dir / "anns" / "train.json", prompt_index=0,
        tokenizer=tokenizer, transforms=eval_transforms(32))
    ds_u8 = ImageTextMaskDataset(
        image_dir=dataset_dir / "images", mask_dir=dataset_dir / "masks",
        task_path=dataset_dir / "anns" / "train.json", prompt_index=0,
        tokenizer=tokenizer,
        transforms=eval_transforms(32, normalize_on_device=True))
    a, b = ds_f32[0], ds_u8[0]
    assert b["image"].dtype == np.uint8

    task = SegmentationTask(CLIPSegForSegmentation(CLIPSegConfig.tiny()))
    prepped = np.asarray(task._prep_image(jnp.asarray(b["image"][None])))
    np.testing.assert_allclose(prepped[0], a["image"], atol=1e-5)


def test_native_imgcodec_matches_cv2(tmp_path):
    """Native libjpeg/libpng decode must be pixel-identical to the cv2 path
    (PNG lossless; JPEG same libjpeg-turbo)."""
    import cv2

    from tunevlseg_tpu.data.datasets import load_image
    from tunevlseg_tpu.native import get_imgcodec

    codec = get_imgcodec()
    if codec is None:
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (45, 61, 3), dtype=np.uint8)
    jpg, png = tmp_path / "a.jpg", tmp_path / "b.png"
    cv2.imwrite(str(jpg), img)
    cv2.imwrite(str(png), img)

    for path in (jpg, png):
        ref = cv2.cvtColor(cv2.imread(str(path)), cv2.COLOR_BGR2RGB)
        got = codec.decode_file(str(path), 0)
        np.testing.assert_array_equal(got, ref)
        via_loader = load_image(path)
        np.testing.assert_array_equal(via_loader, ref)
        # grayscale flag
        refg = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        gotg = load_image(path, cv2.IMREAD_GRAYSCALE, None)
        np.testing.assert_array_equal(gotg, refg)

    with pytest.raises(FileNotFoundError):
        load_image(tmp_path / "missing.png")

    # corrupt stream falls back to cv2, which reports unreadable
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8garbage")
    with pytest.raises(FileNotFoundError):
        load_image(bad)
