"""Segmentation metrics as pure functions + accumulable running state.

Mirrors the reference's torchmetrics configuration
(src/models/image_text_mask_module.py:284-302):
  * `Dice(average="samples", threshold=0.5, zero_division=1)` — per-sample
    dice over the flattened sample, averaged over ALL samples in the epoch;
  * `JaccardIndex(task="binary", threshold=0.5)` — a GLOBAL confusion matrix
    accumulated over the epoch, IoU computed at epoch end.

State is a flat pytree so it can live inside the jitted step and be
`jax.lax.psum`-reduced across data-parallel shards before `compute`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SegMetricState(NamedTuple):
    dice_sum: jnp.ndarray   # scalar f32: sum of per-sample dice scores
    n_samples: jnp.ndarray  # scalar f32
    tp: jnp.ndarray         # scalar f32: global confusion-matrix entries
    fp: jnp.ndarray
    fn: jnp.ndarray

    @staticmethod
    def zeros() -> "SegMetricState":
        z = jnp.zeros((), jnp.float32)
        return SegMetricState(z, z, z, z, z)

    def merge(self, other: "SegMetricState") -> "SegMetricState":
        return SegMetricState(*(a + b for a, b in zip(self, other)))


def update_state(
    state: SegMetricState,
    probs: jnp.ndarray,      # (B, 1, H, W) activation outputs
    targets: jnp.ndarray,    # (B, 1, H, W) {0,1}
    threshold: float = 0.5,
    zero_division: float = 1.0,
    valid: jnp.ndarray | None = None,  # (B,) {0,1} — mask out padded samples
) -> SegMetricState:
    b = probs.shape[0]
    p = (probs >= threshold).astype(jnp.float32).reshape(b, -1)
    g = (targets >= 0.5).astype(jnp.float32).reshape(b, -1)
    v = jnp.ones((b,), jnp.float32) if valid is None else valid.astype(jnp.float32)

    tp = jnp.sum(p * g, axis=1)
    fp = jnp.sum(p * (1 - g), axis=1)
    fn = jnp.sum((1 - p) * g, axis=1)

    denom = 2 * tp + fp + fn
    dice = jnp.where(denom > 0, 2 * tp / jnp.maximum(denom, 1), zero_division)

    return SegMetricState(
        dice_sum=state.dice_sum + jnp.sum(dice * v),
        n_samples=state.n_samples + jnp.sum(v),
        tp=state.tp + jnp.sum(tp * v),
        fp=state.fp + jnp.sum(fp * v),
        fn=state.fn + jnp.sum(fn * v),
    )


def compute(state: SegMetricState, zero_division: float = 0.0) -> dict[str, jnp.ndarray]:
    dice = state.dice_sum / jnp.maximum(state.n_samples, 1.0)
    iou_denom = state.tp + state.fp + state.fn
    iou = jnp.where(iou_denom > 0, state.tp / jnp.maximum(iou_denom, 1.0),
                    zero_division)
    return {"dice": dice, "iou": iou}


def dice_score(probs: jnp.ndarray, targets: jnp.ndarray,
               threshold: float = 0.5, zero_division: float = 1.0,
               valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """One-shot per-batch dice (samples average) — the stepwise log metric."""
    return compute(update_state(SegMetricState.zeros(), probs, targets,
                                threshold, zero_division,
                                valid=valid))["dice"]


def iou_score(probs: jnp.ndarray, targets: jnp.ndarray,
              threshold: float = 0.5,
              valid: jnp.ndarray | None = None) -> jnp.ndarray:
    return compute(update_state(SegMetricState.zeros(), probs, targets,
                                threshold, valid=valid))["iou"]
