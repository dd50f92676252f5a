"""End-to-end CLI tests: config composition + full train->test->predict run
on a synthetic dataset with the tiny model (the reference's `debug=fdr`
smoke-test idea, SURVEY §4)."""
import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from tunevlseg_tpu.config.composer import compose
from tunevlseg_tpu.train import CONFIG_DIR

VOCAB = "/root/reference/src/models/components/denseclip/bpe_simple_vocab_16e6.txt.gz"
pytestmark = pytest.mark.skipif(not Path(VOCAB).exists(),
                                reason="CLIP vocab not available")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data") / "kvasir_polyp"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    (root / "anns").mkdir()
    rng = np.random.default_rng(0)
    tasks = []
    for i in range(8):
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        mask = np.zeros((40, 40), np.uint8)
        mask[8:30, 8:30] = 255
        cv2.imwrite(str(root / "images" / f"{i}.png"), img)
        cv2.imwrite(str(root / "masks" / f"{i}.png"), mask)
        tasks.append({"img_name": f"{i}.png", "mask_name": f"{i}.png",
                      "prompts": {"p0": "polyp"}})
    for split in ("train", "val", "test"):
        (root / "anns" / f"{split}.json").write_text(json.dumps(tasks))
    return root.parent


def test_compose_defaults():
    cfg = compose(CONFIG_DIR, "train", ["ds_name=kvasir_polyp"])
    assert cfg["model"]["strategy"] == "coop"
    assert cfg["model"]["optimizer"]["lr"] == 2e-4
    assert cfg["img_size"] == 352
    assert cfg["dataset_root"].endswith("data/kvasir_polyp")
    assert cfg["data"]["image_dir"].endswith("kvasir_polyp/images")


def test_compose_experiment_and_overrides():
    cfg = compose(CONFIG_DIR, "train", [
        "experiment=coop/clipseg", "ds_name=busi",
        "model.optimizer.lr=1e-3", "data.batch_size=4",
        "trainer=debug", "+extra_flag=7",
    ])
    assert cfg["model"]["optimizer"]["lr"] == 1e-3
    assert cfg["data"]["batch_size"] == 4
    assert cfg["trainer"]["limit_batches"] == 2
    assert cfg["extra_flag"] == 7
    assert "coop" in cfg["tags"]


def test_compose_extras_local_and_tree(tmp_path):
    """Reference onboarding surface (VERDICT r4 #10): the extras group
    composes, configs/local/ merges LAST (beats experiment overlays, loses
    only to CLI value overrides), and the config tree renders without
    rich."""
    import shutil

    from tunevlseg_tpu.utils.config_tree import (apply_extras,
                                                 format_config_tree)

    cfg = compose(CONFIG_DIR, "train", ["ds_name=x"])
    assert cfg["extras"] == {"ignore_warnings": False, "enforce_tags": True,
                             "print_config": False}

    cdir = tmp_path / "configs"
    shutil.copytree(CONFIG_DIR, cdir)
    (cdir / "local" / "default.yaml").write_text(
        "seed: 777\ndata:\n  num_workers: 3\n")
    local = compose(cdir, "train", ["experiment=coop/clipseg", "ds_name=x"])
    assert local["seed"] == 777              # local beats the experiment
    assert local["data"]["num_workers"] == 3
    cli = compose(cdir, "train", ["experiment=coop/clipseg", "ds_name=x",
                                  "seed=42"])
    assert cli["seed"] == 42                 # CLI beats local

    tree = format_config_tree(cfg)
    assert tree.startswith("CONFIG")
    assert "├── " in tree and "model" in tree

    # enforce_tags without a tty tags the run ['dev'] instead of blocking
    c = {"extras": {"enforce_tags": True}, "tags": []}
    apply_extras(c)
    assert c["tags"] == ["dev"]

    # print_config persists the tree next to the run
    c2 = {"extras": {"print_config": True}, "paths": {}}
    apply_extras(c2, save_dir=str(tmp_path / "run"))
    assert (tmp_path / "run" / "config_tree.log").exists()


def test_compose_example_experiment_template():
    cfg = compose(CONFIG_DIR, "train", ["experiment=example", "ds_name=x"])
    assert cfg["tags"] == ["example"]
    assert cfg["model"]["strategy"] == "coop"
    assert cfg["data"]["batch_size"] == 64


def test_compose_strategy_variants():
    cfg = compose(CONFIG_DIR, "train",
                  ["model=shared_attn_clipseg", "ds_name=x"])
    assert cfg["model"]["strategy"] == "shared_attn"
    # inherits the coop base via the string defaults include
    assert cfg["model"]["loss_fn"]["name"] == "dice_ce"
    assert cfg["model"]["learner"]["proj_num_heads"] == 16


def test_missing_mandatory_raises():
    with pytest.raises(ValueError, match="ds_name"):
        compose(CONFIG_DIR, "train", [])


def test_full_train_eval_cycle(synth_root, tmp_path):
    from tunevlseg_tpu import eval as eval_mod
    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    overrides = [
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.max_epochs=2",
        "trainer.n_devices=4",
        "predict=true",
        "exp_name=smoke",
    ]
    result = train_mod.main(overrides)
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)
    ckpt_dir = out / "train" / "smoke" / "checkpoints"
    assert (ckpt_dir / "best").exists()
    assert (ckpt_dir / "last").exists()
    masks = list(Path(result["output_masks_dir"]).glob("*.png"))
    assert len(masks) == 8
    # saved masks restored to original resolution
    m = cv2.imread(str(masks[0]), cv2.IMREAD_GRAYSCALE)
    assert m.shape == (40, 40)

    eval_result = eval_mod.main([
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.n_devices=4",
        f"ckpt_path={ckpt_dir}",
        "exp_name=smoke_eval",
        f"+export_dir={tmp_path / 'serving'}",
    ])
    assert "test_dice" in eval_result
    np.testing.assert_allclose(eval_result["test_dice"],
                               result["test_dice"], atol=1e-5)
    # export_dir also froze the inference step to a serving artifact
    from tunevlseg_tpu import serving
    meta = serving.read_meta(eval_result["export_dir"])
    assert meta["kind"] == "segmentation_task_predict"
    assert (Path(eval_result["export_dir"]) / "predict.stablehlo").exists()


@pytest.mark.parametrize("model_overrides",
                         [(), ("model=trans_seg",)],
                         ids=["clipseg", "trans_seg"])
def test_text_dedup_train_cycle(synth_root, tmp_path, model_overrides):
    """Prompt-dedup CLI surface: data.text_dedup dedups each batch's prompts
    host-side (kvasir_polyp selects one fixed prompt per sample, so U=1
    suffices) and the jitted step gathers text features via text_index —
    for clipseg (frozen text tower) and trans_seg (trainable text tower)."""
    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    result = train_mod.main([
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "+data.text_dedup=1",
        "trainer=debug",
        "trainer.max_epochs=1",
        "trainer.n_devices=4",
        "exp_name=dedup_smoke",
        *model_overrides,
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])


def test_text_dedup_random_prompts_fall_back_dense(tmp_path):
    """prompt_index=-1 (random prompt per sample) + the default
    text_dedup=1 overlay must TRAIN, not raise: single-host batches whose
    distinct prompts exceed capacity fall back to dense collation
    (VERDICT r4 #7). Multi-prompt dataset: every task carries distinct
    p1/p2 strings, so a 4-row batch holds ~4 unique prompts."""
    import cv2 as _cv2

    from tunevlseg_tpu import train as train_mod

    root = tmp_path / "data" / "kvasir_polyp"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    (root / "anns").mkdir()
    rng = np.random.default_rng(3)
    tasks = []
    for i in range(8):
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        mask = np.zeros((40, 40), np.uint8)
        mask[8:30, 8:30] = 255
        _cv2.imwrite(str(root / "images" / f"{i}.png"), img)
        _cv2.imwrite(str(root / "masks" / f"{i}.png"), mask)
        tasks.append({"img_name": f"{i}.png", "mask_name": f"{i}.png",
                      "prompts": {"p0": "polyp",
                                  "p1": f"small polyp {i}",
                                  "p2": [f"lesion {i}", f"growth {i}"]}})
    for split in ("train", "val", "test"):
        (root / "anns" / f"{split}.json").write_text(json.dumps(tasks))

    result = train_mod.main([
        "ds_name=kvasir_polyp",
        f"paths.data_root={root.parent}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "+data.text_dedup=1",
        "prompt_index=-1",
        "trainer=debug",
        "trainer.max_epochs=1",
        "trainer.n_devices=4",
        "exp_name=dedup_random_fallback",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])


def test_fixed_prompt_detection(tmp_path):
    """fixed_prompt(): the multi-host dedup gate's data property — True only
    for a provably constant scalar prompt at a fixed prompt_index."""
    from tunevlseg_tpu.data.datasets import ImageTextMaskDataset

    def make(tasks, **kw):
        p = tmp_path / f"t{make.n}.json"
        make.n += 1
        p.write_text(json.dumps(tasks))
        return ImageTextMaskDataset(image_dir=tmp_path, mask_dir=tmp_path,
                                    task_path=p, tokenizer=None, **kw)
    make.n = 0

    const = [{"prompts": {"p0": "polyp"}} for _ in range(3)]
    assert make(const).fixed_prompt() == "polyp"
    assert make(const, insert_stop_at_last=True).fixed_prompt() == "polyp."
    assert make(const, prompt_index=-1).fixed_prompt() is None  # random key
    varying = [{"prompts": {"p0": f"polyp {i}"}} for i in range(3)]
    assert make(varying).fixed_prompt() is None
    listy = [{"prompts": {"p0": ["a", "b"]}} for _ in range(3)]
    assert make(listy).fixed_prompt() is None
    assert make(varying,
                override_prompt="lesion").fixed_prompt() == "lesion"


def test_text_dedup_rejects_cocoop(synth_root, tmp_path):
    from tunevlseg_tpu import train as train_mod

    with pytest.raises(ValueError, match="CoCoOp"):
        train_mod.main([
            "ds_name=kvasir_polyp",
            f"paths.data_root={synth_root}",
            f"paths.log_dir={tmp_path / 'logs'}",
            f"vocab_path={VOCAB}",
            "img_size=32",
            "+tiny_model=true",
            "data.batch_size=4",
            "+data.text_dedup=1",
            "model.strategy=cocoop",
            "trainer=debug",
            "trainer.max_epochs=1",
            "exp_name=dedup_cocoop",
        ])


def test_cris_train_cycle(synth_root, tmp_path):
    """CRIS family end-to-end on synthetic data (tiny config)."""
    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    result = train_mod.main([
        "experiment=coop/cris",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=64",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.n_devices=2",
        "predict=false",
        "exp_name=cris_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


def test_cris_train_cycle_flat_conv(synth_root, tmp_path, monkeypatch):
    """TUNEVLSEG_PALLAS_CONV=1 wiring end-to-end through the trainer (on
    CPU the dispatch takes the jnp flat formulation — the same plumbing,
    guard bands and param routing the TPU kernel uses)."""
    from tunevlseg_tpu import train as train_mod

    monkeypatch.setenv("TUNEVLSEG_PALLAS_CONV", "1")
    result = train_mod.main([
        "experiment=coop/cris",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=64",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.n_devices=2",
        "predict=false",
        "exp_name=cris_flat_smoke",
    ])
    assert np.isfinite(result["test_loss"])


def test_trans_segmentor_train_cycle(synth_root, tmp_path):
    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    result = train_mod.main([
        "model=trans_seg",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.n_devices=2",
        "predict=false",
        "exp_name=ts_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


def test_trans_segmentor_pretrained_encoder_checkpoints(tmp_path):
    """load_pretrained routes trans_segmentor checkpoints through the right
    converter: bare CLIPModel / SiglipModel encoder state dicts (the
    reference's from_pretrained path) overlay the tiny model cleanly."""
    import torch
    import transformers

    from tunevlseg_tpu.train import load_pretrained

    # CLIP encoder
    torch.manual_seed(0)
    clip = transformers.CLIPModel(transformers.CLIPConfig(
        text_config=dict(vocab_size=49408, hidden_size=16,
                         num_hidden_layers=2, num_attention_heads=2,
                         intermediate_size=32),
        vision_config=dict(hidden_size=24, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=48,
                           patch_size=16, image_size=32),
        projection_dim=20))
    p = tmp_path / "clip_enc.pt"
    torch.save(clip.state_dict(), p)
    cfg = compose(CONFIG_DIR, "train", ["model=trans_seg", "ds_name=x",
                                        f"pretrained_checkpoint={p}"])
    cfg["tiny_model"] = True
    loaded = load_pretrained(cfg)
    assert "text_model" in loaded["params"]
    assert "vision_model" in loaded["params"]
    ref = clip.state_dict()["text_model.embeddings.token_embedding.weight"]
    np.testing.assert_allclose(
        loaded["params"]["text_model"]["token_embedding"]["embedding"],
        ref.numpy(), atol=0)

    # SigLIP encoder
    sig = transformers.SiglipModel(transformers.SiglipConfig(
        text_config=dict(vocab_size=49408, hidden_size=16,
                         num_hidden_layers=2, num_attention_heads=2,
                         intermediate_size=32),
        vision_config=dict(hidden_size=24, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=48,
                           patch_size=16, image_size=32)))
    p2 = tmp_path / "siglip_enc.pt"
    torch.save(sig.state_dict(), p2)
    cfg2 = compose(CONFIG_DIR, "train", ["model=trans_seg_siglip",
                                         "ds_name=x",
                                         f"pretrained_checkpoint={p2}"])
    cfg2["tiny_model"] = True
    loaded2 = load_pretrained(cfg2)
    assert "patch_bias" in loaded2["params"]["vision_model"]
    assert "head" in loaded2["params"]["text_model"]


def test_trans_segmentor_siglip_train_cycle(synth_root, tmp_path):
    """trans_seg + SigLIP towers fed by REAL text through the sentencepiece
    tokenizer (tokenizer_family=siglip) — the family's first true e2e run
    (VERDICT r2 #4; ref encoder.py:20-115 + basedataset.py:50-69)."""
    from transformers.convert_slow_tokenizer import import_protobuf

    from tests.test_siglip_tokenizer import PIECES
    from tunevlseg_tpu import train as train_mod

    pb = import_protobuf()
    m = pb.ModelProto()
    for piece, score, t in PIECES:
        sp = m.pieces.add()
        sp.piece, sp.score, sp.type = piece, score, t
    m.trainer_spec.model_type = 1
    m.trainer_spec.unk_id = 0
    spiece = tmp_path / "spiece.model"
    spiece.write_bytes(m.SerializeToString())

    result = train_mod.main([
        "model=trans_seg_siglip",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={tmp_path / 'logs'}",
        "tokenizer_family=siglip",
        f"vocab_path={spiece}",
        "max_length=64",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.n_devices=2",
        "predict=false",
        "exp_name=ts_siglip_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])


def test_pretrained_checkpoint_and_initializer(synth_root, tmp_path):
    """pretrained_checkpoint loads converted torch weights into the frozen
    tree, and context_initializer embeds through them (token count defines
    num_context)."""
    import torch

    from tests.test_clipseg_parity import tiny_hf_config
    from transformers import CLIPSegForImageSegmentation
    from tunevlseg_tpu import train as train_mod
    from tunevlseg_tpu.config.composer import compose
    from tunevlseg_tpu.data.tokenizer import CLIPTokenizer

    torch.manual_seed(0)
    tm = CLIPSegForImageSegmentation(tiny_hf_config())
    ckpt = tmp_path / "clipseg_tiny.pt"
    torch.save(tm.state_dict(), ckpt)

    cfg = compose(CONFIG_DIR, "train", [
        "ds_name=kvasir_polyp", f"paths.data_root={synth_root}",
        f"paths.log_dir={tmp_path / 'logs'}", f"vocab_path={VOCAB}",
        "+tiny_model=true", "img_size=32", "trainer=debug",
        f"pretrained_checkpoint={ckpt}",
        'model.context_initializer="a photo of a"',
    ])
    tokenizer = CLIPTokenizer(VOCAB)
    loaded = train_mod.load_pretrained(cfg)
    assert "params" in loaded
    # tiny vocab is 99 — tokens of "a photo of a" under the real vocab exceed
    # it, so embed through a matching fake table instead for the num_context
    # check
    model, task = train_mod.build_model_and_task(cfg, None, pretrained=loaded)
    # learner still built (initializer skipped without tokenizer):
    assert model.learner is not None
    # converted weights land in the frozen tree
    from tunevlseg_tpu.data.pipeline import device_batch
    import jax
    batch = {
        "image": np.zeros((2, 3, 32, 32), np.float32),
        "mask": np.zeros((2, 1, 32, 32), np.float32),
        "input_ids": np.ones((2, 8), np.int32),
        "attention_mask": np.ones((2, 8), np.int32),
        "valid": np.ones((2,), np.float32),
    }
    state, frozen = task.init(jax.random.PRNGKey(0), batch,
                              params=loaded["params"])
    got = np.asarray(
        frozen["params"]["text_model"]["token_embedding"]["embedding"])
    want = tm.state_dict()["clip.text_model.embeddings.token_embedding.weight"].numpy()
    np.testing.assert_array_equal(got, want)


def test_initializer_embeddings_num_context():
    from tunevlseg_tpu.data.tokenizer import CLIPTokenizer
    from tunevlseg_tpu.models.prompt.init_text import (
        compute_initializer_embeddings)

    tok = CLIPTokenizer(VOCAB)
    table = np.random.default_rng(0).normal(size=(49408, 16)).astype(np.float32)
    emb = compute_initializer_embeddings(table, tok, "a photo of a")
    assert emb.shape == (1, 4, 16)  # 4 tokens -> num_context 4
    ids = tok.encode("a photo of a", add_special_tokens=False)
    np.testing.assert_array_equal(emb[0], table[np.asarray(ids)])


def test_image_dir_eval_cycle(tmp_path):
    """Binarized class-dir suite through the eval entry point."""
    import cv2
    from tunevlseg_tpu import eval as eval_mod

    root = tmp_path / "data" / "voc_bin"
    (root / "images" / "validation").mkdir(parents=True)
    for cls in ("car", "dog"):
        (root / "annotations" / "validation" / cls).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(root / "images" / "validation" / f"{i}.png"),
                    rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
        cv2.imwrite(str(root / "annotations" / "validation" / "car" /
                        f"{i}.png"), np.full((40, 40), 255, np.uint8))
    result = eval_mod.main([
        "data=image_dir_mask", "ds_name=voc_bin",
        f"paths.data_root={tmp_path / 'data'}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=32", "+tiny_model=true", "data.batch_size=2",
        "data.num_workers=1", "trainer=debug", "trainer.n_devices=2",
        "disable_ckpt=true", "ckpt_path=null", "predict=false",
        "exp_name=dirsmoke",
    ])
    assert "test_dice" in result


def test_train_with_tensor_parallel_and_config_dump(synth_root, tmp_path):
    """trainer.model_parallel=2 (+ seq_shard sequence parallelism) runs the
    whole fit/test cycle with the frozen tower sharded over the model mesh
    axis; the composed config is saved."""
    from tunevlseg_tpu import train as train_mod
    from tunevlseg_tpu.parallel import activation_sharding

    out = tmp_path / "logs"
    try:
        result = train_mod.main([
            "ds_name=kvasir_polyp",
            f"paths.data_root={synth_root}",
            f"paths.log_dir={out}",
            f"vocab_path={VOCAB}",
            "img_size=32",
            "+tiny_model=true",
            "data.batch_size=4",
            "data.num_workers=2",
            "trainer=debug",
            "trainer.max_epochs=1",
            "trainer.n_devices=8",
            "trainer.model_parallel=2",
            "trainer.seq_shard=true",
            "+trainer.loggers=[jsonl,csv]",
            "exp_name=tp_smoke",
        ])
        assert activation_sharding.is_enabled()  # CLI flag reached the gate
    finally:
        activation_sharding.disable()
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)
    run_dir = out / "train" / "tp_smoke"
    import yaml
    cfg = yaml.safe_load((run_dir / "config.yaml").read_text())
    assert cfg["trainer"]["model_parallel"] == 2
    assert (run_dir / "metrics.csv").exists()
    # the step-0 val panel got written
    assert list((run_dir / "images").glob("val_caption_label_*.png"))


def test_train_steps_per_execution(synth_root, tmp_path):
    """trainer.steps_per_execution=2 fuses train steps via lax.scan through
    the full CLI cycle."""
    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    result = train_mod.main([
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.max_epochs=1",
        "trainer.n_devices=4",
        "+trainer.steps_per_execution=2",
        "exp_name=spe_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


def test_spe_straggler_resume_step_monotonic(synth_root, tmp_path):
    """steps_per_execution with a non-divisible batch count (fused group +
    unfused stragglers) across a ckpt resume: logged step counts must be
    strictly increasing and the resumed run must continue the global step
    exactly — no repeats, no resets (VERDICT r2 weak #7)."""
    import json as json_mod

    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    common = [
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32", "+tiny_model=true",
        "data.batch_size=2",          # 8 samples -> 4 batches/epoch
        "data.num_workers=2",
        "trainer=debug",
        "trainer.limit_batches=4",
        "trainer.n_devices=2",
        "+trainer.steps_per_execution=3",  # 1 fused group + 1 straggler
        "trainer.log_every_n_steps=1",
        "predict=false",
    ]
    r1 = train_mod.main(common + ["trainer.max_epochs=2",
                                  "exp_name=spe_resume_a"])
    assert np.isfinite(r1["test_loss"])

    def logged_steps(exp):
        path = out / "train" / exp / "metrics.jsonl"
        steps = []
        for line in path.read_text().splitlines():
            rec = json_mod.loads(line)
            if any(k.startswith("train_") for k in rec):
                steps.append(rec["step"])
        return steps

    s1 = logged_steps("spe_resume_a")
    assert s1 and s1 == sorted(s1) and len(set(s1)) == len(s1)
    assert s1[-1] == 8  # 2 epochs x 4 steps, stragglers counted singly

    ckpt_dir = out / "train" / "spe_resume_a" / "checkpoints"
    r2 = train_mod.main(common + [
        "trainer.max_epochs=4",
        f"ckpt_path={ckpt_dir}",
        "exp_name=spe_resume_b",
    ])
    assert np.isfinite(r2["test_loss"])
    s2 = logged_steps("spe_resume_b")
    # resumed run continues AFTER step 8, stays monotone, ends at 16
    assert s2 and min(s2) > 8 and s2 == sorted(s2)
    assert s2[-1] == 16


def test_e2e_clipseg_experiment(synth_root, tmp_path):
    """experiment=e2e_clipseg: full fine-tune overlay (freeze_all=false,
    stock decoder) through the train cycle — reference e2e_clipseg.yaml."""
    from tunevlseg_tpu import train as train_mod

    cfg = compose(CONFIG_DIR, "train",
                  ["experiment=e2e_clipseg", "ds_name=x"])
    assert cfg["model"]["strategy"] == "e2e"
    assert cfg["model"]["freeze_all"] is False
    assert cfg["model"]["weight_decay"] == 0.001
    assert cfg["model"]["optimizer"]["lr"] == 2e-4

    result = train_mod.main([
        "experiment=e2e_clipseg",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=32", "+tiny_model=true",
        "data.batch_size=4", "data.num_workers=2",
        "trainer=debug", "trainer.max_epochs=1", "trainer.n_devices=2",
        "trainer.precision=f32", "predict=false", "exp_name=e2e_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


def test_clipseg_zss_eval_cycle(synth_root, tmp_path):
    """model=clipseg_zss: the stock frozen-encoder VLSM zero-shot baseline
    (ref configs/model/clipseg_zss.yaml + schedule_zss.sh: eval-only) —
    towers frozen, decoder trainable, eval CLI runs end-to-end."""
    from tunevlseg_tpu import eval as eval_mod
    from tunevlseg_tpu.train import build_model_and_task

    cfg = compose(CONFIG_DIR, "train", ["model=clipseg_zss", "ds_name=x"])
    assert cfg["model"]["strategy"] == "e2e"
    assert cfg["model"]["freeze_encoder"] is True
    assert cfg["model"]["freeze_decoder"] is False
    assert cfg["model"]["optimizer"]["lr"] == 2e-4
    # freeze partition: towers frozen, decoder trains, no learner
    cfg["tiny_model"] = True
    import jax
    import numpy as np
    model, task = build_model_and_task(cfg)
    batch = {"image": np.zeros((2, 3, 32, 32), np.uint8),
             "mask": np.zeros((2, 1, 32, 32), np.float32),
             "input_ids": np.ones((2, 12), np.int32),
             "attention_mask": np.ones((2, 12), np.int32),
             "valid": np.ones((2,), np.float32)}
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    train_tops = {k for k, v in state.trainable.items()
                  if jax.tree_util.tree_leaves(v)}
    frozen_tops = {k for k, v in frozen["params"].items()
                   if jax.tree_util.tree_leaves(v)}
    assert train_tops == {"decoder"}
    assert {"text_model", "vision_model"} <= frozen_tops
    assert "learner" not in train_tops

    # cris_zss composes too (frozen towers + pretrained-checkpoint seam)
    ccfg = compose(CONFIG_DIR, "train", ["model=cris_zss", "ds_name=x"])
    assert ccfg["model"]["family"] == "cris"
    assert ccfg["model"]["freeze_encoder"] is True
    assert ccfg["model"]["optimizer"]["lr"] == 2e-5

    result = eval_mod.main([
        "model=clipseg_zss",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=32", "+tiny_model=true",
        "data.batch_size=4", "data.num_workers=2",
        "trainer=debug", "trainer.n_devices=2",
        "ckpt_path=null", "disable_ckpt=true",  # ref schedule_zss.sh
        "exp_name=zss_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


def test_e2e_cris_experiment(synth_root, tmp_path):
    """experiment=e2e_cris: CRIS full fine-tune overlay (CLIP pixel stats,
    lr 5e-5, decoder dropout 0.2) — reference e2e_cris.yaml."""
    from tunevlseg_tpu import train as train_mod

    cfg = compose(CONFIG_DIR, "train", ["experiment=e2e_cris", "ds_name=x"])
    assert cfg["model"]["strategy"] == "e2e"
    assert cfg["model"]["optimizer"]["lr"] == 5e-5
    assert cfg["model"]["dropout"] == 0.2
    assert cfg["img_mean"][0] == pytest.approx(0.48145466)

    result = train_mod.main([
        "experiment=e2e_cris",
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=64", "+tiny_model=true",
        "data.batch_size=4", "data.num_workers=2",
        "trainer=debug", "trainer.max_epochs=1", "trainer.n_devices=2",
        "trainer.precision=f32", "predict=false", "exp_name=e2e_cris_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


@pytest.fixture()
def phrasecut_root(tmp_path):
    root = tmp_path / "data" / "phrasecut"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir()
    (root / "anns").mkdir()
    tasks = []
    rng = np.random.default_rng(0)
    for img_id, phrase in ((10, "red car"), (11, "green tree"),
                           (12, "blue door"), (13, "tall tower")):
        cv2.imwrite(str(root / "images" / f"{img_id}.jpg"),
                    rng.integers(0, 255, (24, 24, 3), dtype=np.uint8))
        tid = f"{img_id}__0"
        cv2.imwrite(str(root / "masks" / f"{tid}-{phrase}.png"),
                    np.full((24, 24), 255, np.uint8))
        tasks.append({"task_id": tid, "phrase": phrase})
    for split in ("train", "val", "test"):
        (root / "anns" / f"refer_{split}.json").write_text(json.dumps(tasks))
    return root.parent


def test_phrasecut_experiment(phrasecut_root, tmp_path):
    """experiment=phrasecut: SigLIP TransformerSegmentor with output_bias
    init and weighted BCE — reference phrasecut.yaml (incl. line 45)."""
    from tunevlseg_tpu import train as train_mod

    cfg = compose(CONFIG_DIR, "train", ["experiment=phrasecut"])
    assert cfg["model"]["encoder_family"] == "siglip"
    assert cfg["model"]["output_bias"] == pytest.approx(-1.748104048321891)
    assert cfg["model"]["loss_fn"]["weight"] == 5.8
    assert cfg["data"]["type"] == "phrasecut"
    assert cfg["img_size"] == 384

    result = train_mod.main([
        "experiment=phrasecut",
        f"paths.data_root={phrasecut_root}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={VOCAB}",
        "img_size=32", "+tiny_model=true",
        "data.batch_size=4", "data.num_workers=2",
        "trainer=debug", "trainer.max_epochs=1", "trainer.n_devices=2",
        "trainer.precision=f32", "predict=false", "exp_name=pc_smoke",
    ])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
    assert np.isfinite(result["test_loss"])  # NaN smoke guard (tiny-vocab bug, r3)


def test_eval_without_ckpt_raises(synth_root, tmp_path):
    """Reference src/eval.py:107-111: evaluation refuses to run without a
    checkpoint unless disable_ckpt — silently testing converted/random
    weights is the silent-garbage failure class."""
    from tunevlseg_tpu import eval as eval_mod

    with pytest.raises(ValueError, match="ckpt_path"):
        eval_mod.main([
            "ds_name=kvasir_polyp",
            f"paths.data_root={synth_root}",
            f"paths.log_dir={tmp_path / 'logs'}",
            f"vocab_path={VOCAB}",
            "img_size=32", "+tiny_model=true",
            "data.batch_size=4", "data.num_workers=1",
            "trainer=debug", "trainer.n_devices=2",
            "ckpt_path=null",
            "exp_name=nockpt",
        ])


def test_accumulation_remat_fsdp_cycle(synth_root, tmp_path):
    """trainer.accumulate_grad_batches + trainer.remat + trainer.fsdp +
    gradient_clip_val through the real CLI in one cycle: the trainer keys a
    reference user would set (SURVEY §5.6) plus the TPU-native scaling
    levers, all composing in a single jitted step."""
    from tunevlseg_tpu import train as train_mod

    out = tmp_path / "logs"
    result = train_mod.main([
        "ds_name=kvasir_polyp",
        f"paths.data_root={synth_root}",
        f"paths.log_dir={out}",
        f"vocab_path={VOCAB}",
        "img_size=32",
        "+tiny_model=true",
        "data.batch_size=4",
        "data.num_workers=2",
        "trainer=debug",
        "trainer.max_epochs=2",
        "trainer.n_devices=4",
        "trainer.accumulate_grad_batches=2",
        "trainer.remat=true",
        "trainer.fsdp=true",
        "trainer.gradient_clip_val=1.0",
        "exp_name=accum_smoke",
    ])
    assert np.isfinite(result["test_loss"])
    assert "test_dice" in result and 0 <= result["test_dice"] <= 1
