"""mmseg-style whole/slide inference drivers for the DenseCLIP universe.

Every reference denseclip config runs `test_cfg mode="slide"` (e.g.
denseclip_configs/_base_/models/denseclip_r50.py:66, crop 512 stride 341);
mmseg's EncoderDecoder.slide_inference tiles the image with a ceil grid,
clamps the last window to the image edge, and averages logits by visit
count. TPU framing: every window has the SAME static crop shape, so the
whole sweep reuses ONE compiled program; accumulation happens on device
with scatter-adds.
"""
from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def whole_inference(apply_fn: Callable, images: jnp.ndarray) -> jnp.ndarray:
    """test_cfg mode="whole": one full-image forward (logits already resized
    to input resolution by the segmentor)."""
    return apply_fn(images)


def slide_inference(apply_fn: Callable, images: jnp.ndarray,
                    crop_size: tuple[int, int],
                    stride: tuple[int, int]) -> jnp.ndarray:
    """apply_fn(crop) -> (B, K, ch, cw) class logits for one window.

    Returns (B, K, H, W) averaged logits. Matches mmseg slide_inference:
    grid count ceil((dim - crop)/stride) + 1, each window start clamped to
    dim - crop, summed logits divided by per-pixel visit count.
    """
    b, _, h, w = images.shape
    ch, cw = crop_size
    sh, sw = stride
    ch, cw = min(ch, h), min(cw, w)
    h_grids = max(h - ch + sh - 1, 0) // sh + 1
    w_grids = max(w - cw + sw - 1, 0) // sw + 1

    preds = None
    count = jnp.zeros((1, 1, h, w), jnp.float32)
    for i in range(h_grids):
        for j in range(w_grids):
            y1 = min(i * sh, h - ch)
            x1 = min(j * sw, w - cw)
            crop = jnp.asarray(images[:, :, y1:y1 + ch, x1:x1 + cw])
            logits = apply_fn(crop).astype(jnp.float32)
            if preds is None:
                preds = jnp.zeros((b, logits.shape[1], h, w), jnp.float32)
            preds = preds.at[:, :, y1:y1 + ch, x1:x1 + cw].add(logits)
            count = count.at[:, :, y1:y1 + ch, x1:x1 + cw].add(1.0)
    return preds / count


def slide_predict(apply_fn: Callable, images: jnp.ndarray,
                  crop_size: tuple[int, int],
                  stride: tuple[int, int]) -> jnp.ndarray:
    """argmax class map (B, H, W) from slide-averaged logits."""
    return jnp.argmax(slide_inference(apply_fn, images, crop_size, stride),
                      axis=1)
