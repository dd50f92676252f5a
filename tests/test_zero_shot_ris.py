"""SOLOv2 + ZeroShotRIS parity/consistency tests (tiny configs, f64 oracle
where the reference is runnable)."""
import json
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import reference_available, setup_solov2_imports
from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
from tunevlseg_tpu.convert.solov2 import convert_solov2
from tunevlseg_tpu.models.solov2.model import (SOLOv2, SOLOv2Config,
                                               preprocess_image,
                                               solov2_inference)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def ns(d):
    if isinstance(d, dict):
        return types.SimpleNamespace(**{k: ns(v) for k, v in d.items()})
    return d


def tiny_solo_torch_cfg(cfg: SOLOv2Config, score_thr: float):
    return ns({"MODEL": {
        "SOLOV2": {
            "FPN_SCALE_RANGES": [[1, 96], [48, 192], [96, 384], [192, 768],
                                 [384, 2048]],
            "FPN_INSTANCE_STRIDES": list(cfg.instance_strides),
            "SIGMA": 0.2,
            "NUM_CLASSES": cfg.num_classes,
            "NUM_KERNELS": cfg.num_kernels,
            "NUM_GRIDS": list(cfg.num_grids),
            "INSTANCE_IN_FEATURES": ["p2", "p3", "p4", "p5", "p6"],
            "INSTANCE_IN_CHANNELS": cfg.fpn_channels,
            "INSTANCE_CHANNELS": cfg.instance_channels,
            "MASK_ON": True,
            "MASK_IN_FEATURES": ["p2", "p3", "p4", "p5"],
            "MASK_IN_CHANNELS": cfg.fpn_channels,
            "MASK_CHANNELS": cfg.mask_channels,
            "NUM_MASKS": cfg.num_masks,
            "NMS_PRE": cfg.nms_pre,
            "SCORE_THR": score_thr,
            "UPDATE_THR": cfg.update_threshold,
            "MASK_THR": cfg.mask_threshold,
            "MAX_PER_IMG": cfg.max_per_img,
            "NMS_KERNEL": "gaussian",
            "NMS_SIGMA": cfg.nms_sigma,
            "NMS_TYPE": "matrix",
            "NORM": "GN",
            "NUM_INSTANCE_CONVS": cfg.num_instance_convs,
            "USE_DCN_IN_INSTANCE": False,
            "TYPE_DCN": "DCN",
            "USE_COORD_CONV": True,
            "PRIOR_PROB": 0.01,
            "FREEZE": False,
            "IS_FREEMASK": False,
            "LOSS": {"DICE_WEIGHT": 1.0, "FOCAL_ALPHA": 0.25,
                     "FOCAL_GAMMA": 2.0, "FOCAL_WEIGHT": 1.0,
                     "FOCAL_USE_SIGMOID": True},
        },
        "MASK_ON": True,
        "BACKBONE": {"NAME": "build_resnet_fpn_backbone", "FREEZE_AT": 0},
        "FPN": {"IN_FEATURES": ["res2", "res3", "res4", "res5"],
                "OUT_CHANNELS": cfg.fpn_channels, "NORM": "",
                "FUSE_TYPE": "sum"},
        "RESNETS": {"DEPTH": cfg.depth, "NORM": "FrozenBN", "NUM_GROUPS": 1,
                    "WIDTH_PER_GROUP": 64, "STEM_OUT_CHANNELS": 64,
                    "RES2_OUT_CHANNELS": 256, "RES5_DILATION": 1,
                    "STRIDE_IN_1X1": False,
                    "OUT_FEATURES": ["res2", "res3", "res4", "res5"],
                    "DEFORM_ON_PER_STAGE": [False] * 4,
                    "DEFORM_MODULATED": False, "DEFORM_NUM_GROUPS": 1},
        "PIXEL_MEAN": [123.675, 116.28, 103.53],
        "PIXEL_STD": [58.395, 57.12, 57.375],
    }})


@pytest.fixture(scope="module")
def solo_pair():
    """Reference PseudoSOLOv2 (full-width ResNet-50 FPN but tiny heads) and
    our converted model sharing weights."""
    assert setup_solov2_imports()
    from src.models.core_models.solov2 import PseudoSOLOv2

    # low score threshold: the focal-loss bias init puts sigmoid scores near
    # 0.01, so random-weight proposals need a permissive threshold
    # all channel counts divisible by 32 (the reference hardcodes GN(32, .))
    # nms_pre >= S*C (=258) so the fixed-shape top-k preselection sees every
    # above-threshold cell, making both pipelines identical (our top-k runs
    # on category scores BEFORE mask rescoring; with truncation the kept sets
    # could differ — see solov2_inference docstring)
    cfg = SOLOv2Config.tiny(score_threshold=0.005, update_threshold=1e-4,
                            fpn_channels=32, num_kernels=32, num_masks=32,
                            num_embs=128, instance_channels=32,
                            mask_channels=32, nms_pre=300)
    torch.manual_seed(0)
    # f64 oracle: this CPU's torch f32 convs run reduced-precision oneDNN
    # fast math (see reference_oracle.py)
    ref = PseudoSOLOv2(tiny_solo_torch_cfg(cfg, cfg.score_threshold)
                       ).double().eval()
    params = convert_solov2(torch_state_dict_to_numpy(ref.state_dict()), cfg)
    return ref, cfg, params


def test_solov2_backbone_and_heads_parity(solo_pair):
    ref, cfg, params = solo_pair
    rng = np.random.default_rng(0)
    image = rng.uniform(0, 255, size=(3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        t = torch.tensor(image, dtype=torch.float64)
        images = ref.preprocess_image([{"image": t, "height": 64,
                                        "width": 64}])
        feats = ref.backbone(images.tensor)
        ins_feats = [feats[f] for f in ref.instance_in_features]
        ins_feats = ref.split_feats(ins_feats)
        cate_t, kernel_t, emb_t = ref.ins_head(ins_feats)
        mask_t = ref.mask_head([feats[f] for f in ref.mask_in_features])

    model = SOLOv2(cfg)
    batched = preprocess_image(jnp.asarray(image), cfg)
    cate, kern, emb, mask_feats = model.apply({"params": params}, batched)

    for lvl in range(5):
        np.testing.assert_allclose(np.asarray(cate[lvl]),
                                   cate_t[lvl].numpy(), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(kern[lvl]),
                                   kernel_t[lvl].numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mask_feats), mask_t.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_solov2_inference_parity(solo_pair):
    ref, cfg, params = solo_pair
    rng = np.random.default_rng(1)
    image = rng.uniform(0, 255, size=(3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        out = ref([{"image": torch.tensor(image, dtype=torch.float64),
                    "height": 64, "width": 64}])[0]["instances"]
    ref_masks = out.pred_masks.numpy()
    ref_boxes = out.pred_boxes.tensor.numpy()

    model = SOLOv2(cfg)
    batched = preprocess_image(jnp.asarray(image), cfg)
    cate, kern, emb, mask_feats = model.apply({"params": params}, batched)
    masks, boxes, scores, embs, valid = solov2_inference(
        cate, kern, emb, mask_feats, cfg, batched.shape[-2:], (64, 64))
    got_masks = np.asarray(masks)[np.asarray(valid)]
    got_boxes = np.asarray(boxes)[np.asarray(valid)]
    got_scores = np.asarray(scores)[np.asarray(valid)]

    assert len(got_masks) == len(ref_masks), (len(got_masks), len(ref_masks))
    np.testing.assert_allclose(np.sort(got_scores)[::-1],
                               np.sort(out.scores.numpy())[::-1],
                               atol=1e-5, rtol=1e-3)
    if len(ref_masks):
        # order may differ among near-equal scores; compare as sets via IoU
        matched = 0
        for m, b in zip(got_masks, got_boxes):
            ious = (m & ref_masks).sum((1, 2)) / np.maximum(
                (m | ref_masks).sum((1, 2)), 1)
            j = int(ious.argmax())
            if ious[j] > 0.99:
                matched += 1
                np.testing.assert_allclose(b, ref_boxes[j], atol=1.0)
        assert matched == len(ref_masks)


def test_masked_clip_features_parity():
    assert setup_solov2_imports()
    import src.models.core_models.zero_shot_ris.hfclip as hfclip_mod
    from tests.test_clipseg_parity import tiny_hf_config
    from transformers import CLIPConfig, CLIPModel

    from tunevlseg_tpu.convert.clipseg import config_from_hf
    from tunevlseg_tpu.convert.trans_segmentor import convert_hf_clip_model
    from tunevlseg_tpu.convert.clipseg import _Tree
    from tunevlseg_tpu.models.zero_shot_ris.model import MaskedCLIP

    cfg = CLIPConfig(
        text_config={"vocab_size": 99, "hidden_size": 16,
                     "num_hidden_layers": 4, "num_attention_heads": 2,
                     "intermediate_size": 32, "eos_token_id": 2},
        vision_config={"hidden_size": 24, "num_hidden_layers": 4,
                       "num_attention_heads": 2, "intermediate_size": 48,
                       "patch_size": 8, "image_size": 32},
        projection_dim=20)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    clip = CLIPModel(cfg).double().eval()

    orig = hfclip_mod.CLIPModel.from_pretrained
    hfclip_mod.CLIPModel.from_pretrained = staticmethod(lambda *a, **k: clip)
    try:
        ref = hfclip_mod.CustomHFCLIP("x").double().eval()
    finally:
        hfclip_mod.CLIPModel.from_pretrained = orig

    rng = np.random.default_rng(2)
    pixel = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    pred_masks = (rng.random((3, 4, 4)) > 0.4)

    with torch.no_grad():
        ref_feat = ref.get_image_features(
            pixel_values=torch.tensor(pixel, dtype=torch.float64),
            pred_masks=torch.tensor(pred_masks),
            masking_block_idx=-3).numpy()

    from tunevlseg_tpu.models.clip.config import (CLIPSegConfig,
                                                  CLIPTextConfig,
                                                  CLIPVisionConfig)
    my_cfg = CLIPSegConfig(
        text=CLIPTextConfig(vocab_size=99, hidden_size=16, num_layers=4,
                            num_heads=2, intermediate_size=32),
        vision=CLIPVisionConfig(hidden_size=24, num_layers=4, num_heads=2,
                                intermediate_size=48, patch_size=8,
                                image_size=32),
        projection_dim=20)
    t = _Tree()
    from tunevlseg_tpu.models.trans_segmentor.model import TransSegmentorConfig
    ts_cfg = TransSegmentorConfig(text=my_cfg.text, vision=my_cfg.vision,
                                  projection_dim=20)
    convert_hf_clip_model(torch_state_dict_to_numpy(clip.state_dict()),
                          ts_cfg, t)
    model = MaskedCLIP(my_cfg)
    got = np.asarray(model.apply(
        {"params": t}, jnp.asarray(pixel),
        jnp.asarray(pred_masks.astype(np.float32)), -3,
        method=model.get_image_features))
    np.testing.assert_allclose(got, ref_feat, atol=3e-4, rtol=1e-3)


def test_zero_shot_ris_end_to_end(tmp_path):
    """Orchestrator smoke: proposals -> features -> argmax mask; the npz
    cache round-trips to identical output without re-running models."""
    from tunevlseg_tpu.models.clip.config import (CLIPSegConfig,
                                                  CLIPTextConfig,
                                                  CLIPVisionConfig)
    from tunevlseg_tpu.models.zero_shot_ris.model import MaskedCLIP, ZeroShotRIS

    clip_cfg = CLIPSegConfig(
        text=CLIPTextConfig(vocab_size=99, hidden_size=16, num_layers=2,
                            num_heads=2, intermediate_size=32),
        vision=CLIPVisionConfig(hidden_size=24, num_layers=2, num_heads=2,
                                intermediate_size=48, patch_size=8,
                                image_size=32),
        projection_dim=20)
    solo_cfg = SOLOv2Config.tiny(score_threshold=0.005, update_threshold=1e-4,
                                 fpn_channels=32, num_kernels=32,
                                 num_masks=32, instance_channels=32,
                                 mask_channels=32)

    rng = np.random.default_rng(0)
    image = rng.uniform(0, 255, (3, 64, 64)).astype(np.float32)
    ids = rng.integers(3, 98, (2, 12)).astype(np.int32)
    ids[:, 0] = 1
    mask = np.ones((2, 12), np.int32)

    clip_model = MaskedCLIP(clip_cfg)
    clip_params = clip_model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 3, 32, 32)),
        method=clip_model.get_image_features)["params"]
    # text tower params too: init via text path and merge
    text_params = clip_model.init(
        jax.random.PRNGKey(1), jnp.asarray(ids), jnp.asarray(mask),
        method=clip_model.get_text_features)["params"]
    from tunevlseg_tpu.config.composer import deep_merge
    clip_params = deep_merge(dict(text_params), clip_params)

    solo = SOLOv2(solo_cfg)
    solo_params = solo.init(jax.random.PRNGKey(2),
                            jnp.ones((1, 3, 64, 64)))["params"]

    ris = ZeroShotRIS(clip_cfg, solo_cfg, clip_params, solo_params,
                      clip_image_size=32, cache_dir=tmp_path,
                      read_cache=False, write_cache=True)
    out1 = ris(image, ids, mask, cache_name="sample0.png")
    assert out1.shape == (1, 1, 64, 64)
    assert set(np.unique(out1)) <= {0.0, 1.0}

    # cached pass: zero out params — output must be identical (cache only)
    zeroed = jax.tree_util.tree_map(np.zeros_like, clip_params)
    ris_cached = ZeroShotRIS(clip_cfg, solo_cfg, zeroed,
                             jax.tree_util.tree_map(np.zeros_like,
                                                    solo_params),
                             clip_image_size=32, cache_dir=tmp_path,
                             read_cache=True, write_cache=False)
    out2 = ris_cached(image, ids, mask, cache_name="sample0.png")
    np.testing.assert_array_equal(out1, out2)

    # fused single-launch path (alpha=1): identical selection to the host
    # loop at alpha=1 (the crop branch is off in both)
    ris_a1 = ZeroShotRIS(clip_cfg, solo_cfg, clip_params, solo_params,
                         clip_image_size=32, alpha=1.0)
    ref = ris_a1(image, ids, mask)
    fused = ris_a1.predict_fused(image, ids, mask)
    np.testing.assert_array_equal(fused, ref)

    # fused at the DEFAULT alpha (crop branch on device): same selection
    ris_a95 = ZeroShotRIS(clip_cfg, solo_cfg, clip_params, solo_params,
                          clip_image_size=32, alpha=0.95)
    ref95 = ris_a95(image, ids, mask)
    fused95 = ris_a95.predict_fused(image, ids, mask)
    np.testing.assert_array_equal(fused95, ref95)

    # pipelined generator (depth in-flight launches) == sequential
    # predict_fused, same order; result count matches item count
    imgs = [image,
            rng.uniform(0, 255, (3, 64, 64)).astype(np.float32),
            rng.uniform(0, 255, (3, 64, 64)).astype(np.float32)]
    seq = [ris_a95.predict_fused(im, ids, mask) for im in imgs]
    items = ({"image": im, "input_ids": ids, "attention_mask": mask}
             for im in imgs)
    piped = list(ris_a95.predict_fused_many(items, depth=2))
    assert len(piped) == len(seq)
    for a, b in zip(piped, seq):
        np.testing.assert_array_equal(a, b)

    # fused cache WRITING: must produce npz files the read_cache (model-
    # free sweep) path consumes to the identical result
    fused_cache = tmp_path / "fused_cache"
    ris_fc = ZeroShotRIS(clip_cfg, solo_cfg, clip_params, solo_params,
                         clip_image_size=32, alpha=0.95,
                         cache_dir=fused_cache, write_cache=True)
    out_fc = ris_fc.predict_fused(image, ids, mask, cache_name="img0.png")
    for postfix in ("freesolo", "visual_feature", "textual_feature"):
        assert (fused_cache / f"img0_{postfix}.npz").exists()
    ris_rc = ZeroShotRIS(clip_cfg, solo_cfg,
                         jax.tree_util.tree_map(np.zeros_like, clip_params),
                         jax.tree_util.tree_map(np.zeros_like, solo_params),
                         clip_image_size=32, alpha=0.95,
                         cache_dir=fused_cache, read_cache=True)
    out_rc = ris_rc(image, ids, mask, cache_name="img0.png")
    np.testing.assert_allclose(out_rc, out_fc, atol=0)


def test_crop_resize_device_matches_host_oracle():
    """ops.image.crop_resize_bicubic_masked vs the reference host crop
    pipeline (ZeroShotRIS.host_crop_canvases) — incl. out-of-bounds,
    negative-origin, and degenerate boxes."""
    import jax.numpy as jnp

    from tunevlseg_tpu.models.zero_shot_ris.model import ZeroShotRIS
    from tunevlseg_tpu.ops.image import crop_resize_bicubic_masked

    rng = np.random.default_rng(3)
    h, w, p, size = 37, 45, 7, 16
    image = rng.uniform(0, 255, (3, h, w)).astype(np.float32)
    masks = (rng.random((p, h, w)) > 0.5).astype(np.float32)
    boxes = np.stack([
        [5, 4, 20, 30],        # interior
        [-6, -3, 15, 12],      # negative origin (zero-padded canvas)
        [30, 25, 60, 55],      # exceeds bounds on the far side
        [10, 10, 10, 10],      # degenerate -> 1px
        [0, 0, w, h],          # full image
        [40, 30, 44, 36],      # small near-corner
        [-10, -10, 50, 50],    # superset of the image
    ]).astype(np.float32)
    valid = np.ones((p,), np.float32)

    host = ZeroShotRIS.host_crop_canvases(image, boxes, masks, valid, size)
    dev = np.asarray(crop_resize_bicubic_masked(
        jnp.asarray(image), jnp.asarray(masks), jnp.asarray(boxes), size))
    np.testing.assert_allclose(dev, host, atol=2e-3, rtol=1e-4)


def test_eval_zeroshot_cli(tmp_path):
    """The zero-shot eval driver end-to-end on synthetic data (tiny models,
    random weights)."""
    import cv2
    import json as json_mod
    from tunevlseg_tpu import eval_zeroshot

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
    (root / "anns" / "test.json").write_text(json_mod.dumps(tasks))

    vocab = "/root/reference/src/models/components/denseclip/bpe_simple_vocab_16e6.txt.gz"
    result = eval_zeroshot.main([
        "ds_name=zsds",
        f"paths.data_root={tmp_path / 'data'}",
        f"paths.log_dir={tmp_path / 'logs'}",
        f"vocab_path={vocab}",
        "+tiny_model=true",
        "img_size=64",
        f"+model.cache_dir={tmp_path / 'cache'}",
        "model.write_cache=true",
    ])
    assert "test_dice" in result
    # the cache was written for both freesolo + features
    assert len(list((tmp_path / "cache").glob("*.npz"))) >= 2


def test_zero_shot_ris_fused_mesh_parity():
    """Multi-chip inference: the fused single-launch pipeline with the
    proposal batch sharded over an 8-device mesh (ZeroShotRIS(mesh=...))
    must reproduce the unsharded run — same selected mask, same features
    to float tolerance (GSPMD only changes summation layouts)."""
    from tunevlseg_tpu.models.clip.config import (CLIPSegConfig,
                                                  CLIPTextConfig,
                                                  CLIPVisionConfig)
    from tunevlseg_tpu.models.zero_shot_ris.model import (MaskedCLIP,
                                                          ZeroShotRIS)
    from tunevlseg_tpu.parallel.mesh import make_mesh

    clip_cfg = CLIPSegConfig(
        text=CLIPTextConfig(vocab_size=99, hidden_size=16, num_layers=2,
                            num_heads=2, intermediate_size=32),
        vision=CLIPVisionConfig(hidden_size=24, num_layers=2, num_heads=2,
                                intermediate_size=48, patch_size=8,
                                image_size=32),
        projection_dim=20)
    solo_cfg = SOLOv2Config.tiny(score_threshold=0.005, update_threshold=1e-4,
                                 fpn_channels=32, num_kernels=32,
                                 num_masks=32, instance_channels=32,
                                 mask_channels=32)
    rng = np.random.default_rng(1)
    image = rng.uniform(0, 255, (3, 64, 64)).astype(np.float32)
    ids = rng.integers(3, 98, (2, 12)).astype(np.int32)
    ids[:, 0] = 1
    mask = np.ones((2, 12), np.int32)

    clip_model = MaskedCLIP(clip_cfg)
    clip_params = clip_model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 3, 32, 32)),
        method=clip_model.get_image_features)["params"]
    text_params = clip_model.init(
        jax.random.PRNGKey(1), jnp.asarray(ids), jnp.asarray(mask),
        method=clip_model.get_text_features)["params"]
    from tunevlseg_tpu.config.composer import deep_merge
    clip_params = deep_merge(dict(text_params), clip_params)
    solo = SOLOv2(solo_cfg)
    solo_params = solo.init(jax.random.PRNGKey(2),
                            jnp.ones((1, 3, 64, 64)))["params"]

    # alpha=0.95 exercises BOTH proposal-parallel branches (masked + crop)
    kw = dict(clip_image_size=32, alpha=0.95)
    ris = ZeroShotRIS(clip_cfg, solo_cfg, clip_params, solo_params, **kw)
    ris_mesh = ZeroShotRIS(clip_cfg, solo_cfg, clip_params, solo_params,
                           mesh=make_mesh(8), **kw)

    ref = ris.predict_fused(image, ids, mask)
    got = ris_mesh.predict_fused(image, ids, mask)
    np.testing.assert_array_equal(got, ref)

    # feature-level check (the picked mask could agree by luck)
    _, ex_ref = ris._jit_fused(solo_params, clip_params, jnp.asarray(image),
                               jnp.asarray(ids), jnp.asarray(mask), (64, 64))
    _, ex_got = ris_mesh._jit_fused(solo_params, clip_params,
                                    jnp.asarray(image), jnp.asarray(ids),
                                    jnp.asarray(mask), (64, 64))
    np.testing.assert_allclose(np.asarray(ex_got["mask_features"]),
                               np.asarray(ex_ref["mask_features"]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ex_got["crop_features"]),
                               np.asarray(ex_ref["crop_features"]),
                               atol=1e-4, rtol=1e-4)


def test_build_ris_mesh_wiring():
    """n_devices>1 in the eval_zeroshot config hands ZeroShotRIS a data
    mesh (proposal-parallel inference)."""
    from tunevlseg_tpu import eval_zeroshot
    from tunevlseg_tpu.config.composer import compose

    cfg = compose(eval_zeroshot.CONFIG_DIR, "eval_zeroshot",
                  ["ds_name=x", "+tiny_model=true", "n_devices=8"])
    ris = eval_zeroshot.build_ris(cfg)
    assert ris.mesh is not None and ris.mesh.devices.size == 8
    cfg1 = compose(eval_zeroshot.CONFIG_DIR, "eval_zeroshot",
                   ["ds_name=x", "+tiny_model=true"])
    assert eval_zeroshot.build_ris(cfg1).mesh is None
