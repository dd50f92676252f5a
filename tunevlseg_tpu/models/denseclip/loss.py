"""DenseCLIP training losses (reference denseclip.py:206-258).

The reference trains DenseCLIP through mmseg: `decode_head.loss(x, ...)`
computes CrossEntropyLoss (use_sigmoid=False, loss_weight=1.0,
denseclip_fpn_res50_512x512_80k.py) over the FPNHead logits resized to the
label grid, plus an identity-head auxiliary loss at weight 0.4
(_base_/models/denseclip_r50.py identity_head; head built at
denseclip.py:130-134, invoked at :243-245).

mmseg CrossEntropyLoss semantics mirrored exactly:
  * ignore_index 255 pixels contribute ZERO loss;
  * with the default avg_non_ignore=False the mean still divides by ALL
    pixels (ignored ones deflate the average) — NOT torch's
    `reduction="mean"`+ignore_index, which divides by the non-ignored
    count. Oracled in f64 in tests/test_denseclip.py.

Identity-head input quirk: the reference's mmseg-2.x port passes the
FEATURE LIST `x` to `identity_head.loss` (denseclip.py:244), but
IdentityHead.forward is the identity function (heads.py:20-21), so mmseg's
`loss_by_feat` would call F.interpolate on a python list and raise — that
path cannot execute as written. The upstream DenseCLIP repo this port came
from feeds `score_map / tau` to the identity head; the reference keeps the
(there dead) `tau=0.07` ctor arg (denseclip.py:42). We implement the
working upstream semantics: CE over the score map scaled by 1/tau, resized
to the label grid, at loss_weight 0.4.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tunevlseg_tpu.ops.image import resize_2d

IGNORE_INDEX = 255


def cross_entropy_seg(logits: jnp.ndarray, labels: jnp.ndarray,
                      ignore_index: int = IGNORE_INDEX,
                      avg_non_ignore: bool = False) -> jnp.ndarray:
    """mmseg CrossEntropyLoss(use_sigmoid=False) over (B, K, H, W) logits
    and (B, H, W) integer labels. See module docstring for the
    avg_non_ignore=False averaging quirk."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    x = logits.astype(jnp.float32)
    # nll = logsumexp - x[label], with the label pick as a where/iota
    # SELECT rather than take_along_axis: the gather (and its scatter
    # transpose in backward) over the class axis of a (B, K, H, W) f32
    # tensor dominated the whole DenseCLIP train step on TPU — the CE
    # side measured 163 ms of a 253 ms step before this rewrite
    # (PERF_r04/profile_denseclip2.log). The select's backward is a pure
    # elementwise mask. Numerics identical (exact pick either way).
    lse = jax.scipy.special.logsumexp(x, axis=1)
    onehot = safe[:, None] == jnp.arange(x.shape[1])[None, :, None, None]
    x_lab = jnp.sum(jnp.where(onehot, x, 0.0), axis=1)
    nll = jnp.where(valid, lse - x_lab, 0.0)
    denom = jnp.where(avg_non_ignore,
                      jnp.maximum(valid.sum(), 1).astype(jnp.float32),
                      jnp.float32(labels.size))
    return nll.sum() / denom


def denseclip_losses(logits: jnp.ndarray, score_map: jnp.ndarray,
                     labels: jnp.ndarray, tau: float = 0.07,
                     identity_weight: float = 0.4) -> dict:
    """Total training loss: decode-head CE (weight 1.0) + identity-head CE
    over `score_map / tau` resized to the label grid (weight 0.4).

    `logits` must already be at the label resolution (DenseCLIP.__call__
    resizes to the input grid, matching mmseg's resize-to-gt in
    loss_by_feat); `score_map` is the raw stride-32 (B, K, h, w) map."""
    loss_decode = cross_entropy_seg(logits, labels)
    id_logits = resize_2d(score_map.astype(jnp.float32) / tau,
                          labels.shape[1:], "bilinear")
    loss_identity = cross_entropy_seg(id_logits, labels)
    total = loss_decode + identity_weight * loss_identity
    return {"loss": total, "loss_decode": loss_decode,
            "loss_aux_identity": loss_identity}
