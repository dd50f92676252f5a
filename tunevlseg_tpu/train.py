"""Training entry point.

Usage (same override grammar as the reference's Hydra CLI — SURVEY §3.1):

    python -m tunevlseg_tpu.train experiment=coop/clipseg \
        ds_name=kvasir_polyp prompt_index=0 paths.data_root=/data

Builds datasets/loaders, the model + freeze spec from the `model` group,
the mesh from `trainer`, then runs fit -> test(best) -> predict, mirroring
reference src/train.py:56-137.
"""
from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp

from tunevlseg_tpu.config.composer import compose
from tunevlseg_tpu.data.datasets import ImageTextMaskDataset
from tunevlseg_tpu.data.pipeline import DataLoader
from tunevlseg_tpu.data.tokenizer import load_default_tokenizer
from tunevlseg_tpu.data.transforms import eval_transforms, train_transforms
from tunevlseg_tpu.models.presets import build_clipseg, clipseg_rd64_config
from tunevlseg_tpu.ops.losses import LOSS_REGISTRY
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.training.loop import EarlyStopping, Trainer
from tunevlseg_tpu.training.optim import ReduceLROnPlateau
from tunevlseg_tpu.training.task import SegmentationTask
from tunevlseg_tpu.utils.logging import get_logger

log = get_logger(__name__)

CONFIG_DIR = Path(__file__).resolve().parents[1] / "configs"


def build_datasets(cfg: dict, tokenizer) -> dict[str, Any]:
    d = cfg["data"]
    img = cfg["img_size"]
    mean, std = cfg["img_mean"], cfg["img_std"]
    nod = d.get("normalize_on_device", True)
    base = dict(insert_stop_at_last=cfg.get("insert_stop_at_last", True),
                tokenizer=tokenizer, max_length=cfg.get("max_length", 77),
                tokenizer_style=d.get("tokenizer_style", "hf"),
                seed=cfg.get("seed", 0))

    def dirs(split):
        """Per-split directory overrides (`<split>_image_dir`) — the camus
        preset points train/val at images/train and test at images/test
        (reference configs/data/image_text_mask_camus.yaml)."""
        return dict(image_dir=d.get(f"{split}_image_dir", d["image_dir"]),
                    mask_dir=d.get(f"{split}_mask_dir", d["mask_dir"]))

    ds_type = d.get("type", "image_text_mask")

    if ds_type == "image_dir":
        # binarized class-directory suites (class name = prompt); the
        # jpg/png presets train on images/training and validate/test on
        # images/validation (reference image_dir_text_mask_{jpg,png}.yaml)
        from tunevlseg_tpu.data.datasets import ImageDirTextMaskDataset

        def make(split, tf):
            return ImageDirTextMaskDataset(
                mask_suffix=d.get("mask_suffix", ".png"),
                image_suffix=d.get("image_suffix", ".png"),
                transforms=tf, **dirs(split), **base)

        eval_tf = eval_transforms(img, mean, std, nod)
        if "train_image_dir" in d:
            return {"train": make("train",
                                  train_transforms(img, mean, std, nod)),
                    "val": make("val", eval_tf),
                    "test": make("test", eval_tf)}
        ds = make("test", eval_tf)
        return {"train": ds, "val": ds, "test": ds}
    if ds_type in ("phrasecut", "refcoco"):
        from tunevlseg_tpu.data.open_domain import (PhraseCutDataset,
                                                    RefCOCODataset)
        cls = PhraseCutDataset if ds_type == "phrasecut" else RefCOCODataset
        od = dict(base, prompt_method=d.get("prompt_method", "fixed"),
                  neg_prob=d.get("neg_prob", 0.0))
        # template prompts end in "." already; insert_stop is a closed-set
        # ImageTextMaskDataset knob (reference open-domain sets never use it)
        od.pop("insert_stop_at_last", None)
        return {
            "train": cls(task_path=d["train_task_path"],
                         transforms=train_transforms(img, mean, std, nod),
                         **dirs("train"), **od),
            "val": cls(task_path=d["val_task_path"],
                       transforms=eval_transforms(img, mean, std, nod),
                       **dirs("val"), **dict(od, neg_prob=0.0)),
            "test": cls(task_path=d["test_task_path"],
                        transforms=eval_transforms(img, mean, std, nod),
                        **dirs("test"), **dict(od, neg_prob=0.0)),
        }

    common = dict(base, prompt_index=cfg["prompt_index"],
                  override_prompt=cfg.get("override_prompt"))
    return {
        "train": ImageTextMaskDataset(
            task_path=d["train_task_path"],
            transforms=train_transforms(img, mean, std, nod),
            **dirs("train"), **common),
        "val": ImageTextMaskDataset(
            task_path=d["val_task_path"],
            transforms=eval_transforms(img, mean, std, nod),
            **dirs("val"), **common),
        "test": ImageTextMaskDataset(
            task_path=d["test_task_path"],
            transforms=eval_transforms(img, mean, std, nod),
            **dirs("test"), **common),
    }


def _initializer_embeddings(cfg: dict, tokenizer, params):
    """Embed the text context initializer ("a photo of a") through the
    converted frozen token embedding (coop_context_learner.py:16-80). The
    token count overrides num_context. Returns (embeddings, num_context)."""
    m = cfg["model"]
    init_text = m.get("context_initializer")
    if not init_text or tokenizer is None or params is None:
        return None, m.get("num_context", 4)
    family = m.get("family", "clipseg")
    try:
        if family == "cris":
            table = params["params"]["text"]["token_embedding"]["embedding"]
        else:
            table = params["params"]["text_model"]["token_embedding"][
                "embedding"]
    except (KeyError, TypeError):
        return None, m.get("num_context", 4)
    from tunevlseg_tpu.models.prompt.init_text import (
        compute_initializer_embeddings)
    emb = compute_initializer_embeddings(table, tokenizer, init_text)
    return emb, emb.shape[1]


def build_model_and_task(cfg: dict, tokenizer=None, pretrained=None):
    m = cfg["model"]
    family = m.get("family", "clipseg")
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        cfg["trainer"].get("precision", "f32")]

    init_emb, num_context = _initializer_embeddings(cfg, tokenizer, pretrained)
    common = dict(
        strategy=m.get("strategy", "coop"),
        prompt_depth=m.get("prompt_depth", 1),
        num_context=num_context,
        use_new_last_layer=m.get("use_new_last_layer", True),
        freeze_all=m.get("freeze_all", True),
        no_freeze_last_layer=m.get("no_freeze_last_layer", False),
        freeze_encoder=m.get("freeze_encoder"),  # zss: frozen towers
        dtype=dtype,
        learner_overrides=m.get("learner"),
        initializer_embeddings=init_emb,
    )
    if family == "clipseg":
        config = clipseg_rd64_config(m.get("complex_head", False))
        if cfg.get("tiny_model"):  # test/debug hook
            from tunevlseg_tpu.models.clip.config import CLIPSegConfig
            config = CLIPSegConfig.tiny()
        model, spec = build_clipseg(config=config,
                                    freeze_decoder=m.get("freeze_decoder",
                                                         False), **common)
    elif family == "cris":
        from tunevlseg_tpu.models.presets import build_cris, cris_rn50_config
        config = cris_rn50_config(cfg.get("img_size", 416))
        if cfg.get("tiny_model"):
            from tunevlseg_tpu.models.cris.model import CRISConfig
            config = CRISConfig.tiny(img_size=cfg.get("img_size", 64))
        if "dropout" in m:  # decoder dropout (reference e2e_cris.yaml:32)
            config = dataclasses.replace(config, dropout=m["dropout"])
        common.pop("learner_overrides")
        model, spec = build_cris(config=config,
                                 learner_overrides=m.get("learner"), **common)
    elif family == "trans_segmentor":
        common.pop("initializer_embeddings", None)
        from tunevlseg_tpu.models.trans_segmentor.model import (
            TransformerSegmentor)
        from tunevlseg_tpu.training.optim import FreezeSpec

        config = trans_segmentor_config(cfg)
        model = TransformerSegmentor(config, dtype=dtype)
        # freeze_encoders only gates the towers; decoder/upsampler train
        always = (() if m.get("use_existing_proj", True)
                  else ("text_projection",))
        spec = FreezeSpec(freeze_all=False,
                          freeze_encoder=m.get("freeze_encoders", False),
                          family="trans_segmentor", always_trainable=always)
        return model, _make_task(cfg, model, spec)
    else:
        raise NotImplementedError(f"model family {family}")

    return model, _make_task(cfg, model, spec)


def trans_segmentor_config(cfg: dict):
    """TransSegmentorConfig from the composed cfg — the single source of
    truth shared by build_model_and_task and load_pretrained, so a
    checkpoint is always converted at the SAME dimensions the model is
    built with (a canned config here would silently truncate a deeper
    tower's checkpoint during conversion)."""
    from tunevlseg_tpu.models.trans_segmentor.model import TransSegmentorConfig

    m = cfg["model"]
    tiny = bool(cfg.get("tiny_model"))
    if tiny:
        base = TransSegmentorConfig.tiny()
    elif m.get("encoder_family", "clip") == "siglip":
        # real SigLIP tower dims (vocab 32000, width 768, 64 positions)
        # — a CLIP-dimensioned config would mis-shape every converted
        # SigLIP checkpoint tensor
        base = TransSegmentorConfig.siglip_base()
    else:
        base = TransSegmentorConfig()
    overrides = dict(
        encoder_family=m.get("encoder_family", "clip"),
        use_existing_proj=m.get("use_existing_proj", True),
        add_pos_enc=m.get("add_pos_enc", False),
        decoder_dropout=m.get("decoder_dropout", 0.1),
        decoder_activation=m.get("decoder_activation", "relu"),
        upsampler_act=m.get("upsampler_act", "relu"),
        upsampler_norm=m.get("upsampler_norm", "layer"),
        num_output_channels=m.get("num_output_channels", 1),
        output_bias=m.get("output_bias"),
        image_size=cfg.get("img_size"))
    if not tiny:  # keep tiny's scaled-down decoder/upsampler dims
        overrides.update(
            decoder_num_layers=m.get("decoder_num_layers", 4),
            decoder_num_heads=m.get("decoder_num_heads", 8),
            decoder_dim_feedforward=m.get("decoder_dim_feedforward", 2048),
            num_upsampler_layers=m.get("num_upsampler_layers", 5))
    return dataclasses.replace(base, **overrides)


def _make_task(cfg: dict, model, spec):
    m = cfg["model"]
    loss_cfg = dict(m.get("loss_fn", {"name": "dice_ce"}))
    loss_fn = LOSS_REGISTRY[loss_cfg.pop("name")]
    opt = m.get("optimizer", {})
    mutable = (("batch_stats",) if getattr(model, "bn_train", False) else ())
    return SegmentationTask(
        model, spec, loss_fn=loss_fn, loss_kwargs=loss_cfg,
        threshold=m.get("threshold", 0.5),
        learning_rate=opt.get("lr", 2e-4),
        weight_decay=m.get("weight_decay", 0.0),
        grad_clip_norm=cfg["trainer"].get("gradient_clip_val"),
        accumulate_grad_batches=int(
            cfg["trainer"].get("accumulate_grad_batches", 1) or 1),
        remat=bool(cfg["trainer"].get("remat", False)),
        mutable_collections=mutable,
        image_stats=(tuple(cfg.get("img_mean", (0.485, 0.456, 0.406))),
                     tuple(cfg.get("img_std", (0.229, 0.224, 0.225)))))


def load_pretrained(cfg: dict):
    """Load + convert a torch checkpoint if configured. Returns None or a
    dict of variable collections {"params": ..., ("batch_stats": ...)}."""
    path = cfg.get("pretrained_checkpoint")
    if not path:
        return None
    m = cfg["model"]
    family = m.get("family", "clipseg")
    if family == "cris":
        from tunevlseg_tpu.convert.cris import (config_from_clip_state_dict,
                                                load_cris_checkpoint)
        from tunevlseg_tpu.models.presets import cris_rn50_config
        return load_cris_checkpoint(path, cris_rn50_config(
            cfg.get("img_size", 416)), m.get("strategy"))
    if family == "trans_segmentor":
        import torch

        from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
        from tunevlseg_tpu.convert.trans_segmentor import (
            convert_hf_clip_model, convert_hf_siglip_model,
            convert_trans_segmentor, _Tree)

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "state_dict" in raw:
            raw = raw["state_dict"]
        sd = torch_state_dict_to_numpy(raw)
        # derive the converter config from the SAME cfg overrides the model
        # is built with — a canned config would silently truncate e.g. a
        # deeper encoder's checkpoint (advisor r3)
        config = trans_segmentor_config(cfg)
        if any(k.startswith("encoder.model.") for k in sd):
            # full reference TransformerSegmentor checkpoint
            return {"params": convert_trans_segmentor(sd, config)}
        # bare CLIPModel / SiglipModel encoder checkpoint (the reference's
        # from_pretrained path, encoder.py:41)
        t = _Tree()
        if config.encoder_family == "siglip":
            convert_hf_siglip_model(sd, config, t)
        else:
            convert_hf_clip_model(sd, config, t)
        return {"params": t}
    from tunevlseg_tpu.convert.clipseg import load_checkpoint_params
    if cfg.get("tiny_model"):
        from tunevlseg_tpu.models.clip.config import CLIPSegConfig
        config = CLIPSegConfig.tiny()
    else:
        config = clipseg_rd64_config(m.get("complex_head", False))
    return {"params": load_checkpoint_params(path, config,
                                             m.get("strategy"))}


def save_composed_config(cfg: dict, output_dir: Path) -> None:
    """Persist the fully composed config next to the run outputs — the
    reference's `log_hyperparameters` / hydra `.hydra/config.yaml` role
    (src/utils/logging_utils.py:16)."""
    import yaml

    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "config.yaml", "w") as fp:
        yaml.safe_dump(cfg, fp, default_flow_style=False, sort_keys=False)


def main(argv: Optional[list[str]] = None) -> dict:
    overrides = argv if argv is not None else sys.argv[1:]
    cfg = compose(CONFIG_DIR, "train", overrides)
    # reference @task_wrapper (src/utils/utils.py:53-105): save the
    # exception, mark the run failed, close loggers, re-raise
    from tunevlseg_tpu.utils.task_wrapper import run_guarded
    return run_guarded(lambda: _run(cfg), cfg["paths"]["output_dir"])


def _run(cfg: dict) -> dict:
    from tunevlseg_tpu.utils.config_tree import apply_extras
    apply_extras(cfg, save_dir=cfg["paths"].get("output_dir"))
    if cfg.get("debug_nans"):
        # reference debug/default.yaml detect_anomaly -> fail fast on NaNs
        jax.config.update("jax_debug_nans", True)

    seed = cfg.get("seed", 0)
    tokenizer = load_default_tokenizer(cfg.get("vocab_path"),
                                       family=cfg.get("tokenizer_family", "clip"))
    datasets = build_datasets(cfg, tokenizer)
    loaded = load_pretrained(cfg)
    model, task = build_model_and_task(cfg, tokenizer, pretrained=loaded)
    params = loaded["params"] if loaded else None
    variables = ({k: v for k, v in loaded.items() if k != "params"}
                 if loaded else None)

    t = cfg["trainer"]
    if t.get("multihost"):
        # DCN entry: must run before mesh/backend use (SURVEY §2.10)
        mesh_lib.initialize_distributed(t)
    pc, pi = jax.process_count(), jax.process_index()
    mesh = mesh_lib.make_mesh(t.get("n_devices"),
                              t.get("model_parallel", 1))
    d = cfg["data"]
    if d["batch_size"] % pc:
        raise ValueError(f"global batch_size {d['batch_size']} must divide "
                         f"by process_count {pc}")
    td = int(d.get("text_dedup", 0) or 0)
    if td:
        mcfg = cfg["model"]
        if mcfg.get("family", "clipseg") not in ("clipseg", "cris",
                                                 "trans_segmentor"):
            raise ValueError("data.text_dedup only supports the clipseg/"
                             "cris/trans_segmentor families (their nets "
                             "take text_index)")
        if mcfg.get("strategy") == "cocoop":
            raise ValueError("data.text_dedup is incompatible with CoCoOp "
                             "(image-conditioned text stack)")
        if pc > 1:
            # The dedup keys assemble as a REPLICATED global array and
            # make_array_from_process_local_data trusts hosts to agree.
            # Fixed prompt_index is NOT sufficient: prompts are per-task
            # and list-valued pN entries sample per-index rngs
            # (data/datasets.py pick_prompt), and hosts hold disjoint
            # sample shards — so later shuffled batches can diverge in
            # unique-set content/order even when the first val batch
            # agrees (advisor r4). Multi-host dedup therefore requires
            # U==1 AND a dataset whose prompt selection is provably one
            # constant string (fixed_prompt()); everything else runs
            # dense. The first val batch is still cross-checked below as
            # belt-and-braces.
            if td != 1:
                raise ValueError(
                    f"data.text_dedup={td} is single-host only; multi-host "
                    "supports only text_dedup=1 with a provably constant "
                    "prompt")
            bad = [split for split, ds in datasets.items()
                   if getattr(ds, "fixed_prompt", lambda: None)() is None]
            if bad:
                raise ValueError(
                    "data.text_dedup under multi-host requires every "
                    "dataset to select ONE constant prompt (scalar entry "
                    f"at a fixed prompt_index); splits {bad} do not — "
                    "set data.text_dedup=0")
        elif int(cfg.get("prompt_index", 0)) < 0:
            log.warning(
                "data.text_dedup=%d with prompt_index=-1 (random prompt "
                "per sample): batches whose distinct prompts exceed the "
                "capacity fall back to DENSE collation (slower). Set "
                "data.text_dedup=0 to silence.", td)
    loaders = {
        split: DataLoader(ds, d["batch_size"] // pc,
                          shuffle=(split == "train"),
                          seed=seed, num_workers=d.get("num_workers", 8),
                          drop_last=d.get("drop_last", False),
                          num_shards=pc, shard_index=pi, text_dedup=td)
        for split, ds in datasets.items()
    }

    sample = next(iter(loaders["val"]))
    if td:
        mesh_lib.assert_dedup_keys_agree(sample)
    from tunevlseg_tpu.data.pipeline import device_batch
    state, frozen = task.init(jax.random.PRNGKey(seed),
                              device_batch(sample), params=params,
                              variables=variables)

    sched_cfg = cfg["model"].get("scheduler") or {}
    scheduler = None
    if sched_cfg.get("name") == "plateau":
        scheduler = ReduceLROnPlateau(
            factor=sched_cfg.get("factor", 0.2),
            patience=sched_cfg.get("patience", 5),
            mode=sched_cfg.get("mode", "min"))

    es_cfg = t.get("early_stopping") or {}
    trainer = Trainer(
        task=task, mesh=mesh, output_dir=cfg["paths"]["output_dir"],
        max_epochs=t.get("max_epochs", 20), min_epochs=t.get("min_epochs", 1),
        log_every_n_steps=t.get("log_every_n_steps", 6),
        scheduler=scheduler,
        early_stopping=EarlyStopping(
            patience=es_cfg.get("patience", 12),
            min_delta=es_cfg.get("min_delta", 1e-4)),
        limit_batches=t.get("limit_batches"),
        loggers=tuple(t.get("loggers", ("jsonl", "csv"))),
        log_image_num=t.get("log_image_num", 4),
        steps_per_execution=t.get("steps_per_execution", 1),
        fsdp=bool(t.get("fsdp", False)),
        seq_shard=bool(t.get("seq_shard", False)),
        ckpt_every_n_steps=int(t.get("ckpt_every_n_steps", 0) or 0),
        exp_name=cfg.get("exp_name"), project=t.get("project"),
        tags=tuple(cfg.get("tags") or ()))
    save_composed_config(cfg, trainer.output_dir)
    from tunevlseg_tpu.training.optim import count_params
    n_train = count_params(state.trainable)
    n_frozen = count_params(frozen)
    trainer.metrics_log.log_hyperparams(cfg, {
        # reference log_hyperparameters: model/params/{total,trainable,
        # non_trainable} (src/utils/logging_utils.py:40-47)
        "model/params/total": n_train + n_frozen,
        "model/params/trainable": n_train,
        "model/params/non_trainable": n_frozen,
    })

    result: dict[str, Any] = {}
    if cfg.get("train", True):
        # reference src/train.py:104 — trainer.fit(ckpt_path=...) mid-run
        # resume; here a tag ("last"/"best") or a checkpoints directory
        resume_from = cfg.get("ckpt_path")
        if cfg.get("profile"):
            # reference debug/profiler.yaml -> jax.profiler trace of the fit
            from tunevlseg_tpu.utils.profiling import trace
            with trace(str(trainer.output_dir / "profile")):
                state = trainer.fit(state, frozen, loaders["train"],
                                    loaders["val"], resume_from=resume_from)
        else:
            state = trainer.fit(state, frozen, loaders["train"],
                                loaders["val"], resume_from=resume_from)
    if cfg.get("test", True):
        result.update(trainer.test(state, frozen, loaders["test"]))
    if cfg.get("predict", False):
        # multi-host: every process writes its own shard of predictions
        # (mask names are globally unique, so a shared out_dir composes the
        # full set; on disjoint filesystems each host keeps its shard)
        out_dir = Path(cfg["paths"]["output_dir"]) / "output_masks"
        trainer.predict(state, frozen, loaders["test"], save_dir=out_dir)
        result["output_masks_dir"] = str(out_dir)
    if cfg.get("export_dir"):
        # beyond-reference deployment surface: freeze the inference step
        # into a StableHLO artifact (serving.py) next to the checkpoints;
        # weights ride as call args so the trained orbax checkpoint pairs
        # with it unchanged
        from tunevlseg_tpu import serving
        sample = next(iter(loaders["test"]))
        graph = serving.export_task_predict(
            task, state, frozen, device_batch(sample),
            cfg["export_dir"],
            platforms=tuple(cfg.get("export_platforms", ())) or None)
        result["export_dir"] = str(graph.parent)
        log.info(f"exported serving artifact: {graph}")
    log.info(f"done: {result}")
    return result


if __name__ == "__main__":
    main()
