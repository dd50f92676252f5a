"""Zero-shot referring-segmentation evaluation driver.

The reference runs ZeroShotRIS through src/eval.py with model=zsseg and
batch_size=1 (configs/data/zsseg.yaml; sweep drivers schedule_zss.sh and
zeroshot_get_hparams.sh). This driver mirrors that workflow:

    python -m tunevlseg_tpu.eval_zeroshot model=zsseg ds_name=refcoco \
        paths.data_root=/data vocab_path=... \
        model.clip_checkpoint=/path/clip.bin \
        model.solo_checkpoint=/path/FreeSOLO_R101_30k.pt \
        +model.cache_dir=cache/ +model.write_cache=true

With the npz cache written once, alpha/beta grid search re-runs with
`+model.read_cache=true model.alpha=... model.beta=...` and never touches
the models (the reference's `force_no_load_models` sweep)."""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional

import numpy as np

from tunevlseg_tpu.config.composer import compose
from tunevlseg_tpu.data.datasets import ZeroShotDataset
from tunevlseg_tpu.data.tokenizer import load_default_tokenizer
from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.models.solov2.model import SOLOv2Config
from tunevlseg_tpu.models.zero_shot_ris.model import ZeroShotRIS
from tunevlseg_tpu.ops.metrics import SegMetricState, compute, update_state
from tunevlseg_tpu.train import CONFIG_DIR
from tunevlseg_tpu.utils.logging import MetricLogger, get_logger

log = get_logger(__name__)


def _build_biomed_clip(cfg: dict):
    """The `is_hf_model=false` branch: BiomedCLIP (open_clip CustomTextCLIP)
    instead of HF CLIP — reference zero_shot_ris/__init__.py:62-64 +
    configs/experiment/zsseg_biomedclip.yaml."""
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.zero_shot_ris.biomed_clip import (BiomedCLIP,
                                                                BiomedCLIPConfig)

    m = cfg["model"]
    clip_cfg = (BiomedCLIPConfig.tiny() if cfg.get("tiny_model")
                else BiomedCLIPConfig())
    model = BiomedCLIP(clip_cfg)
    if m.get("clip_checkpoint"):
        from tunevlseg_tpu.convert.biomed_clip import load_biomedclip_checkpoint
        params = load_biomedclip_checkpoint(m["clip_checkpoint"], clip_cfg)
    else:
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        size = m.get("clip_image_size",
                     clip_cfg.vision.image_size)
        params = model.init(rng, jnp.ones((1, 3, size, size)),
                            method=model.get_image_features)["params"]
        text_params = model.init(
            rng, jnp.ones((2, 8), jnp.int32),
            method=model.get_text_features)["params"]
        from tunevlseg_tpu.config.composer import deep_merge
        params = deep_merge(dict(text_params), params)
        log.warning("no clip_checkpoint given: using RANDOM BiomedCLIP "
                    "weights")
    return model, clip_cfg, params


def build_ris(cfg: dict) -> ZeroShotRIS:
    import jax

    m = cfg["model"]
    clip_cfg = CLIPSegConfig()  # ViT-B/16 CLIP (masked-feature path)
    solo_cfg = SOLOv2Config()

    if cfg.get("tiny_model"):
        from tunevlseg_tpu.models.clip.config import (CLIPTextConfig,
                                                      CLIPVisionConfig)
        clip_cfg = CLIPSegConfig(
            text=CLIPTextConfig(vocab_size=49408, hidden_size=16,
                                num_layers=2, num_heads=2,
                                intermediate_size=32),
            vision=CLIPVisionConfig(hidden_size=24, num_layers=2, num_heads=2,
                                    intermediate_size=48, patch_size=8,
                                    image_size=32),
            projection_dim=20)
        solo_cfg = SOLOv2Config.tiny(fpn_channels=32, num_kernels=32,
                                     num_masks=32, instance_channels=32,
                                     mask_channels=32)

    from tunevlseg_tpu.models.zero_shot_ris.model import MaskedCLIP
    from tunevlseg_tpu.models.solov2.model import SOLOv2

    solo_model = SOLOv2(solo_cfg)
    size = m.get("clip_image_size",
                 32 if cfg.get("tiny_model") else 224)

    custom_clip = None
    if not m.get("is_hf_model", True):
        custom_clip, clip_cfg, clip_params = _build_biomed_clip(cfg)
    elif m.get("clip_checkpoint"):
        from tunevlseg_tpu.convert.clipseg import load_checkpoint_params
        # CLIPModel-format checkpoints share the tower layout
        clip_params = load_checkpoint_params(m["clip_checkpoint"], clip_cfg)
    else:
        import jax.numpy as jnp
        clip_model = MaskedCLIP(clip_cfg)
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        clip_params = clip_model.init(
            rng, jnp.ones((1, 3, size, size)),
            method=clip_model.get_image_features)["params"]
        text_params = clip_model.init(
            rng, jnp.ones((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
            method=clip_model.get_text_features)["params"]
        from tunevlseg_tpu.config.composer import deep_merge
        clip_params = deep_merge(dict(text_params), clip_params)
        log.warning("no clip_checkpoint given: using RANDOM clip weights")

    if m.get("solo_checkpoint"):
        from tunevlseg_tpu.convert.solov2 import load_freesolo_checkpoint
        solo_params = load_freesolo_checkpoint(m["solo_checkpoint"], solo_cfg)
    else:
        import jax.numpy as jnp
        solo_params = solo_model.init(
            jax.random.PRNGKey(1), jnp.ones((1, 3, 64, 64)))["params"]
        log.warning("no solo_checkpoint given: using RANDOM FreeSOLO weights")

    # n_devices > 1 shards the proposal batch over a data mesh — the
    # masked/crop CLIP towers run proposal-parallel (model.py:_pshard);
    # mesh-vs-none parity is tested on the 8-device CPU mesh
    mesh = None
    if int(cfg.get("n_devices", 1) or 1) > 1:
        n = int(cfg["n_devices"])
        if jax.device_count() < n:
            # make_mesh would silently truncate — the run would claim
            # proposal-parallel N-way execution while running on fewer
            raise ValueError(
                f"n_devices={n} but only {jax.device_count()} device(s) "
                "visible; lower n_devices or fix the platform")
        from tunevlseg_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n)

    return ZeroShotRIS(
        clip_cfg, solo_cfg, clip_params, solo_params,
        masking_block_idx=m.get("masking_block_idx", -3),
        alpha=m.get("alpha", 0.95), beta=m.get("beta", 0.5),
        num_masks=m.get("num_masks", 1), clip_image_size=size,
        cache_dir=m.get("cache_dir"),
        read_cache=m.get("read_cache", False),
        write_cache=m.get("write_cache", False),
        clip_model=custom_clip, mesh=mesh)


def main(argv: Optional[list[str]] = None) -> dict:
    overrides = argv if argv is not None else sys.argv[1:]
    cfg = compose(CONFIG_DIR, "eval_zeroshot", overrides)
    # reference @task_wrapper (src/utils/utils.py:53-105)
    from tunevlseg_tpu.utils.task_wrapper import run_guarded
    return run_guarded(lambda: _run(cfg), cfg["paths"]["output_dir"])


def _run(cfg: dict) -> dict:
    if cfg["model"].get("is_hf_model", True):
        tokenizer = load_default_tokenizer(cfg.get("vocab_path"))
    else:
        # BiomedCLIP pairs with the BiomedBERT WordPiece tokenizer
        # (reference zsseg_biomedclip.yaml:63 tokenizer_pretrained_path)
        from tunevlseg_tpu.data.tokenizer import WordPieceTokenizer
        if not cfg.get("vocab_path"):
            raise ValueError("is_hf_model=false needs vocab_path pointing "
                             "at a BERT vocab.txt")
        tokenizer = WordPieceTokenizer(cfg["vocab_path"])
    d = cfg["data"]
    # the reference's zsseg pipeline CLIP-normalizes the single image tensor
    # that feeds BOTH FreeSOLO and CLIP (experiment/zsseg_clip.yaml:65-80 —
    # note FreeSOLO therefore never sees detectron2 pixel stats; quirk kept)
    from tunevlseg_tpu.data.transforms import eval_transforms
    transforms = eval_transforms(cfg.get("img_size", 1024),
                                 cfg.get("img_mean"), cfg.get("img_std"))
    dataset = ZeroShotDataset(
        image_dir=d["image_dir"], mask_dir=d["mask_dir"],
        task_path=d["test_task_path"], prompt_index=cfg["prompt_index"],
        insert_stop_at_last=cfg.get("insert_stop_at_last", True),
        tokenizer=tokenizer, max_length=cfg.get("max_length", 77),
        transforms=transforms, seed=cfg.get("seed", 0))
    ris = build_ris(cfg)

    metric_logger = MetricLogger(cfg["paths"]["output_dir"])
    state = SegMetricState.zeros()
    threshold = cfg["model"].get("threshold", 0.5)
    limit = cfg["trainer"].get("limit_batches")
    import jax.numpy as jnp

    # unless READING a prebuilt cache (the model-free sweep mode), the whole
    # pipeline (incl. the device crop-resize at alpha<1) fuses into ONE
    # device launch per image — the host loop's per-stage round trips ship
    # the full proposal-mask stack each hop. write_cache still works: the
    # fused path saves the same npz files from its on-device intermediates.
    use_fused = (cfg["model"].get("fused", "auto") != "off"
                 and not ris.read_cache)
    n = len(dataset) if limit is None else min(limit, len(dataset))
    from collections import deque
    masks: deque = deque()  # holds ≤ pipeline_depth+1 gt masks in flight

    def items():
        for i in range(n):
            item = dataset[i]
            masks.append(item["mask"])
            yield item

    if use_fused:
        log.info("using the fused single-launch path%s",
                 " (writing feature cache)" if ris.write_cache else "")
        # pipelined: up to `pipeline_depth` launches in flight — the metric
        # update / logging for image i overlaps the device computing i+1
        preds = ris.predict_fused_many(
            items(), depth=int(cfg["model"].get("pipeline_depth", 2)))
    else:
        preds = (ris(item["image"], item["input_ids"],
                     item["attention_mask"], cache_name=item["cache_name"])
                 for item in items())
    for i, pred in enumerate(preds):
        state = update_state(state, jnp.asarray(pred[:1]),
                             jnp.asarray(masks.popleft()[None]), threshold)
        if (i + 1) % 25 == 0:
            metric_logger.log(compute(state), i + 1, prefix="running_")

    result = {f"test_{k}": float(v) for k, v in compute(state).items()}
    metric_logger.log(result, len(dataset))
    log.info(f"done: {result}")
    return result


if __name__ == "__main__":
    main()
