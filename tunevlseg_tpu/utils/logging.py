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

    def log(self, metrics: Mapping[str, Any], step: int,
            prefix: str = "") -> None:
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
