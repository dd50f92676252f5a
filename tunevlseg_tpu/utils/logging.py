"""Minimal metric logging: console + JSONL file (+ CSV per epoch).

Stands in for the reference's Lightning logger zoo (configs/logger/*) in an
offline environment; the JSONL stream is trivially importable into
wandb/tensorboard later."""
from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Mapping, Optional


def get_logger(name: str = "tunevlseg") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(
            "[%(asctime)s][%(name)s][%(levelname)s] %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class MetricLogger:
    def __init__(self, output_dir: Optional[str | Path] = None,
                 name: str = "metrics"):
        self.logger = get_logger()
        self.path = None
        if output_dir is not None:
            Path(output_dir).mkdir(parents=True, exist_ok=True)
            self.path = Path(output_dir) / f"{name}.jsonl"
        self._t0 = time.time()

    @staticmethod
    def _rank_zero() -> bool:
        """Multi-host: only process 0 writes (reference RankedLogger /
        rank_zero_only, src/utils/pylogger.py:33-65)."""
        try:
            import jax
            return jax.process_index() == 0
        except Exception:
            return True

    def log(self, metrics: Mapping[str, Any], step: int,
            prefix: str = "") -> None:
        if not self._rank_zero():
            return
        record = {f"{prefix}{k}": (float(v) if hasattr(v, "__float__") else v)
                  for k, v in metrics.items()}
        record["step"] = step
        record["wall_s"] = round(time.time() - self._t0, 2)
        if self.path is not None:
            with open(self.path, "a") as fp:
                fp.write(json.dumps(record) + "\n")
        pretty = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in record.items() if k != "wall_s")
        self.logger.info(pretty)


class MultiLogger(MetricLogger):
    """Fan-out logger — the reference's Lightning logger zoo
    (configs/logger/*: csv/tensorboard/wandb/many_loggers) reduced to the
    backends that make sense offline:

      * "jsonl"        — native stream (always useful, default)
      * "csv"          — Lightning CSVLogger-style metrics.csv
      * "tensorboard"  — torch.utils.tensorboard SummaryWriter (in-image)
      * "wandb"        — gated import; silently skipped when not installed

    `log_images` replaces the wandb val table the reference logs on
    validation step 0 (image_text_mask_module.py:171-199)."""

    def __init__(self, output_dir: Optional[str | Path] = None,
                 name: str = "metrics",
                 backends: tuple = ("jsonl", "csv"),
                 project: Optional[str] = None,
                 exp_name: Optional[str] = None,
                 tags: tuple = ()):
        super().__init__(output_dir, name)
        self.backends = tuple(backends)
        self._rows: list[dict] = []
        self._csv_path = (Path(output_dir) / f"{name}.csv"
                          if output_dir and "csv" in self.backends else None)
        self._tb = None
        if output_dir and "tensorboard" in self.backends:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(str(Path(output_dir) / "tb"))
            except Exception as e:  # pragma: no cover - env dependent
                self.logger.warning("tensorboard unavailable: %s", e)
        self._wandb = None
        if "wandb" in self.backends:
            try:  # pragma: no cover - not installed in this image
                import wandb
                # reference configs/logger/wandb.yaml: project/name/tags
                self._wandb = wandb.init(project=project or name,
                                         name=exp_name, tags=list(tags),
                                         dir=str(output_dir))
            except Exception as e:
                self.logger.warning("wandb unavailable: %s", e)

    def log_hyperparams(self, cfg: Mapping[str, Any],
                        extras: Optional[Mapping[str, Any]] = None) -> None:
        """Composed config + model stats (param counts) into every backend —
        the reference's `log_hyperparameters` (src/utils/logging_utils.py:
        16-58: cfg subtrees + model/params/total|trainable|non_trainable)."""
        if not self._rank_zero():
            return
        payload = {"cfg": dict(cfg), **(extras or {})}
        if self.path is not None:
            (self.path.parent / "hparams.json").write_text(
                json.dumps(payload, indent=2, default=str))
        if self._tb is not None:
            self._tb.add_text("hparams",
                              "```\n" + json.dumps(payload, indent=2,
                                                   default=str) + "\n```")
        if self._wandb is not None:  # pragma: no cover
            self._wandb.config.update(payload, allow_val_change=True)

    def log(self, metrics: Mapping[str, Any], step: int,
            prefix: str = "") -> None:
        super().log(metrics, step, prefix)
        if not self._rank_zero():
            return
        record = {f"{prefix}{k}": (float(v) if hasattr(v, "__float__") else v)
                  for k, v in metrics.items()}
        record["step"] = step
        if self._csv_path is not None:
            import csv
            self._rows.append(record)
            keys: list[str] = []
            for r in self._rows:
                keys.extend(k for k in r if k not in keys)
            with open(self._csv_path, "w", newline="") as fp:
                w = csv.DictWriter(fp, fieldnames=keys)
                w.writeheader()
                w.writerows(self._rows)
        if self._tb is not None:
            for k, v in record.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(record, step=step)

    def log_images(self, tag: str, images, step: int = 0,
                   captions: Optional[list] = None) -> None:
        """images: list of (H, W) or (H, W, 3) float [0,1] / uint8 arrays."""
        if not self._rank_zero():
            return
        import numpy as np
        panels = []
        for img in images:
            a = np.asarray(img)
            if a.dtype != np.uint8:
                a = (np.clip(np.nan_to_num(a), 0, 1) * 255).astype(np.uint8)
            if a.ndim == 2:
                a = np.repeat(a[..., None], 3, axis=-1)
            panels.append(a)
        if self.path is not None:
            import cv2
            img_dir = self.path.parent / "images"
            img_dir.mkdir(exist_ok=True)
            paths = []
            for i, a in enumerate(panels):
                p = img_dir / f"{tag}_{step}_{i}.png"
                cv2.imwrite(str(p), a[..., ::-1])
                paths.append(str(p))
            with open(self.path, "a") as fp:
                fp.write(json.dumps({
                    "step": step, "images": paths, "tag": tag,
                    "captions": captions}) + "\n")
        if self._tb is not None:
            for i, a in enumerate(panels):
                self._tb.add_image(f"{tag}/{i}", a, step,
                                   dataformats="HWC")
            if captions:
                self._tb.add_text(tag, " | ".join(map(str, captions)), step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()
