"""Segmentation losses (pure JAX), matching the reference's MONAI semantics.

The reference trains every model with `monai.losses.DiceCELoss(sigmoid=True,
lambda_dice=1, lambda_ce=0.2)` (configs/model/coop/clipseg.yaml:26-29). MONAI
is not a dependency here; the math below reproduces its defaults exactly:

  DiceLoss (include_background=True, squared_pred=False, jaccard=False,
  batch=False, smooth_nr=smooth_dr=1e-5, reduction="mean"):
      per (batch, channel): f = 1 - (2*sum(p*g) + nr) / (sum(p) + sum(g) + dr)
      loss = mean over batch and channels
  CE part for single-channel binary: BCE-with-logits, mean reduction.
  total = lambda_dice * dice + lambda_ce * bce

All reductions accumulate in float32 regardless of input dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_cross_entropy_with_logits(logits: jnp.ndarray,
                                     targets: jnp.ndarray,
                                     pos_weight=None) -> jnp.ndarray:
    """Numerically stable mean BCE-with-logits (torch semantics).

    `pos_weight` multiplies the positive-target term — torch
    BCEWithLogitsLoss(pos_weight=...), which MONAI DiceCELoss feeds its
    `weight` into for the single-channel binary case (the reference's
    phrasecut experiment uses weight 5.8, phrasecut.yaml:50-52)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    # log(sigmoid(x)) = -softplus(-x); log(1-sigmoid(x)) = -softplus(x)
    log_p = -jax.nn.softplus(-x)
    log_not_p = -jax.nn.softplus(x)
    w = 1.0 if pos_weight is None else pos_weight
    loss = -(w * z * log_p + (1.0 - z) * log_not_p)
    return jnp.mean(loss)


def dice_loss(
    logits: jnp.ndarray,          # (B, C, *spatial)
    targets: jnp.ndarray,         # same shape
    sigmoid: bool = True,
    squared_pred: bool = False,
    jaccard: bool = False,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    batch: bool = False,
) -> jnp.ndarray:
    x = logits.astype(jnp.float32)
    g = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(x) if sigmoid else x

    reduce_axes = tuple(range(2, p.ndim))
    if batch:
        reduce_axes = (0,) + reduce_axes

    intersection = jnp.sum(g * p, axis=reduce_axes)
    if squared_pred:
        ground_o = jnp.sum(g * g, axis=reduce_axes)
        pred_o = jnp.sum(p * p, axis=reduce_axes)
    else:
        ground_o = jnp.sum(g, axis=reduce_axes)
        pred_o = jnp.sum(p, axis=reduce_axes)
    denominator = ground_o + pred_o
    if jaccard:
        denominator = 2.0 * (denominator - intersection)
    f = 1.0 - (2.0 * intersection + smooth_nr) / (denominator + smooth_dr)
    return jnp.mean(f)


def dice_ce_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    sigmoid: bool = True,
    lambda_dice: float = 1.0,
    lambda_ce: float = 0.2,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    squared_pred: bool = False,
    jaccard: bool = False,
    batch: bool = False,
    weight=None,
) -> jnp.ndarray:
    """`monai.losses.DiceCELoss` for the binary single-channel case
    (`weight` -> BCE pos_weight, MONAI's binary-CE plumbing)."""
    d = dice_loss(logits, targets, sigmoid=sigmoid, squared_pred=squared_pred,
                  jaccard=jaccard, smooth_nr=smooth_nr, smooth_dr=smooth_dr,
                  batch=batch)
    ce = binary_cross_entropy_with_logits(logits, targets, pos_weight=weight)
    return lambda_dice * d + lambda_ce * ce


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, gamma: float = 2.0,
               alpha: float = 0.25) -> jnp.ndarray:
    """Sigmoid focal loss (mean) — used by the SOLOv2 training objective
    (reference solov2/loss.py:138)."""
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * z + (1 - p) * (1 - z)
    weight = (1 - p_t) ** gamma
    if alpha >= 0:
        weight = weight * (alpha * z + (1 - alpha) * (1 - z))
    return jnp.mean(weight * ce)


LOSS_REGISTRY = {
    "dice_ce": dice_ce_loss,
    "dice": dice_loss,
    "bce": binary_cross_entropy_with_logits,
    "focal": focal_loss,
}
