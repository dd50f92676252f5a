"""Evaluation entry point (reference src/eval.py: test + predict from a
checkpoint, no fit).

    python -m tunevlseg_tpu.eval experiment=coop/clipseg ds_name=... \
        ckpt_path=logs/train/<exp>/checkpoints
"""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional

import jax

from tunevlseg_tpu.config.composer import compose
from tunevlseg_tpu.data.pipeline import DataLoader, device_batch
from tunevlseg_tpu.data.tokenizer import load_default_tokenizer
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.train import (CONFIG_DIR, build_datasets,
                                 build_model_and_task, load_pretrained)
from tunevlseg_tpu.training.checkpoint import CheckpointManager
from tunevlseg_tpu.training.loop import Trainer
from tunevlseg_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv: Optional[list[str]] = None) -> dict:
    overrides = argv if argv is not None else sys.argv[1:]
    cfg = compose(CONFIG_DIR, "eval", overrides)
    # reference @task_wrapper (src/utils/utils.py:53-105)
    from tunevlseg_tpu.utils.task_wrapper import run_guarded
    return run_guarded(lambda: _run(cfg), cfg["paths"]["output_dir"])


def _run(cfg: dict) -> dict:
    from tunevlseg_tpu.utils.config_tree import apply_extras
    apply_extras(cfg, save_dir=cfg["paths"].get("output_dir"))
    ckpt_path = cfg.get("ckpt_path")
    if not cfg.get("disable_ckpt") and not ckpt_path:
        # reference src/eval.py:107-111 refuses to evaluate without a
        # checkpoint unless disable_ckpt — silently testing converted/
        # random weights is exactly the silent-garbage failure class
        raise ValueError(
            "ckpt_path is required for evaluation; pass ckpt_path=... "
            "or set disable_ckpt=true to evaluate converted/initial "
            "weights deliberately")
    seed = cfg.get("seed", 0)
    tokenizer = load_default_tokenizer(cfg.get("vocab_path"),
                                       family=cfg.get("tokenizer_family", "clip"))
    datasets = build_datasets(cfg, tokenizer)
    model, task = build_model_and_task(cfg, tokenizer)
    t = cfg["trainer"]
    mesh = mesh_lib.make_mesh(t.get("n_devices"), t.get("model_parallel", 1))
    d = cfg["data"]
    test_loader = DataLoader(datasets["test"], d["batch_size"], shuffle=False,
                             num_workers=d.get("num_workers", 8),
                             text_dedup=int(d.get("text_dedup", 0) or 0))

    sample = next(iter(test_loader))
    loaded = load_pretrained(cfg)
    params = loaded["params"] if loaded else None
    variables = ({k: v for k, v in loaded.items() if k != "params"}
                 if loaded else None)
    state, frozen = task.init(jax.random.PRNGKey(seed), device_batch(sample),
                              params=params, variables=variables)

    if not cfg.get("disable_ckpt"):
        ckpt = CheckpointManager(ckpt_path)
        tag = "best" if (Path(ckpt_path) / "best").exists() else "last"
        state = ckpt.restore(tag, state)
        try:
            frozen = ckpt.restore_frozen(frozen)
        except Exception:
            log.info("no frozen params in checkpoint; using converted/init")

    trainer = Trainer(task=task, mesh=mesh,
                      output_dir=cfg["paths"]["output_dir"],
                      limit_batches=t.get("limit_batches"),
                      fsdp=bool(t.get("fsdp", False)))
    result = trainer.test(state, frozen, test_loader, use_best=False)
    if cfg.get("predict", True):
        out_dir = Path(cfg["paths"]["output_dir"]) / "output_masks"
        trainer.predict(state, frozen, test_loader, save_dir=out_dir,
                        use_best=False)
        result["output_masks_dir"] = str(out_dir)
    if cfg.get("export_dir"):
        # freeze the (checkpoint-restored) inference step to a StableHLO
        # serving artifact — see tunevlseg_tpu/serving.py
        from tunevlseg_tpu import serving
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
