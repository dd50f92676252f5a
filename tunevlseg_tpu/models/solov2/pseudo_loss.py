"""FreeSOLO/BoxInst pseudo-supervision losses for SOLOv2 training.

Re-implements the reference's weak-supervision objective
(src/models/core_models/solov2/pseudo_solov2.py:132-179,
 solov2.py:416-500, utils.py:310-427):

  * `unfold_wo_center` — the k×k dilated neighborhood of every pixel,
    center excluded.  torch does this with `F.unfold` (an im2col gather);
    on TPU an im2col materialization is pure HBM traffic, so it becomes
    k²-1 STATIC pad+slice shifts (the same reformulation that made the CRIS
    projector's dynamic conv 5× faster, scripts/micro_dynconv.py) — XLA
    fuses each shifted slice into the consumer elementwise op.
  * `rgb2lab` — skimage.color.rgb2lab semantics (sRGB u8 → linear → XYZ
    (D65/2°) → CIELAB) so the color-similarity weights match the reference,
    which runs skimage on host (pseudo_solov2.py:157-165).  Here it is pure
    jnp and runs on-device inside the train step.
  * `images_color_similarity` — exp(-||Δlab||₂ / 2) against each neighbor,
    gated by the unfolded max of the image validity mask (utils.py:364-389).
  * `compute_pairwise_term` — log-space probability that neighboring pixels
    receive the SAME prediction (utils.py:392-427).
  * `paired_losses` — the BoxInst projection terms: max-/mean-projection
    dice along each axis plus the color-gated pairwise term with linear
    warmup (solov2.py:416-500).  The reference loops over per-image
    variable-length instance lists; this version is fixed-shape — stacked
    instances with a `valid` flag — so the whole objective jits.

The reference repo itself only ever runs SOLOv2 *inference* (FreeSOLO
checkpoints arrive pre-trained), but the training objective is part of the
model family's surface; parity is oracled against the reference utils in
tests/test_zero_shot_ris.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# neighborhood machinery


def unfold_wo_center(x: jnp.ndarray, kernel_size: int,
                     dilation: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, C, k*k-1, H, W): each pixel's dilated k×k
    neighborhood, center position removed, zero padding outside.

    Matches torch `F.unfold(..., padding=(k + (d-1)(k-1))//2)` followed by
    the center-drop concat (ref utils.py:332-361): neighbor index
    (ki*k + kj) reads from offset (ki*d, kj*d) into the padded image.
    """
    assert x.ndim == 4 and kernel_size % 2 == 1
    k, d = kernel_size, dilation
    pad = (k + (d - 1) * (k - 1)) // 2
    h, w = x.shape[-2:]
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    center = (k * k) // 2
    shifts = []
    for ki in range(k):
        for kj in range(k):
            if ki * k + kj == center:
                continue
            shifts.append(xp[:, :, ki * d:ki * d + h, kj * d:kj * d + w])
    return jnp.stack(shifts, axis=2)


# ---------------------------------------------------------------------------
# CIELAB (skimage semantics; D65/2° white point)

_RGB2XYZ = jnp.array([[0.412453, 0.357580, 0.180423],
                      [0.212671, 0.715160, 0.072169],
                      [0.019334, 0.119193, 0.950227]], jnp.float32)
_WHITE = jnp.array([0.95047, 1.0, 1.08883], jnp.float32)


def rgb2lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) sRGB in [0, 255] (uint8 values) -> CIELAB, skimage parity."""
    s = rgb.astype(jnp.float32) / 255.0
    linear = jnp.where(s > 0.04045,
                       ((s + 0.055) / 1.055) ** 2.4,
                       s / 12.92)
    xyz = linear @ _RGB2XYZ.T
    t = xyz / _WHITE
    eps = 0.008856451679035631          # (6/29)**3
    kappa = 7.787068965517241           # (29/6)**2 / 3 = 841/108
    f = jnp.where(t > eps, jnp.cbrt(t), kappa * t + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    lab = jnp.stack([116.0 * fy - 16.0,
                     500.0 * (fx - fy),
                     200.0 * (fy - fz)], axis=-1)
    return lab


def images_color_similarity(images_lab: jnp.ndarray, image_masks: jnp.ndarray,
                            kernel_size: int, dilation: int) -> jnp.ndarray:
    """(N, 3, H, W) LAB + (N, H, W) validity -> (N, k*k-1, H, W) neighbor
    similarity exp(-||Δ||₂/2), zero where any neighborhood pixel is padding
    (ref utils.py:364-389 — the torch version asserts N==1; this one is
    batched)."""
    unfolded = unfold_wo_center(images_lab, kernel_size, dilation)
    diff = images_lab[:, :, None] - unfolded            # (N, 3, k²-1, H, W)
    similarity = jnp.exp(-jnp.linalg.norm(diff, axis=1) * 0.5)
    unfolded_w = unfold_wo_center(image_masks[:, None], kernel_size, dilation)
    weights = jnp.max(unfolded_w, axis=1)               # torch max over C=1
    return similarity * weights


def compute_pairwise_term(mask_logits: jnp.ndarray, pairwise_size: int,
                          pairwise_dilation: int) -> jnp.ndarray:
    """(N, 1, H, W) logits -> (N, k*k-1, H, W) = -log P(same prediction as
    neighbor), computed in log space (ref utils.py:392-427)."""
    assert mask_logits.ndim == 4
    log_fg = jax.nn.log_sigmoid(mask_logits)
    log_bg = jax.nn.log_sigmoid(-mask_logits)
    log_fg_u = unfold_wo_center(log_fg, pairwise_size, pairwise_dilation)
    log_bg_u = unfold_wo_center(log_bg, pairwise_size, pairwise_dilation)
    log_same_fg = log_fg[:, :, None] + log_fg_u
    log_same_bg = log_bg[:, :, None] + log_bg_u
    m = jnp.maximum(log_same_fg, log_same_bg)
    log_same = jnp.log(jnp.exp(log_same_fg - m) + jnp.exp(log_same_bg - m)) + m
    return -log_same[:, 0]


def prepare_color_similarity(images: jnp.ndarray, image_masks: jnp.ndarray,
                             *, pairwise_size: int = 3,
                             pairwise_dilation: int = 2) -> jnp.ndarray:
    """(B, 3, H, W) raw RGB [0,255] + (B, H, W) validity -> (B, k²-1, H/4, W/4).

    The ref prepares pairwise weights per image on host
    (pseudo_solov2.py:132-179): stride-4 average pool, truncate to uint8
    (`.byte()`), skimage rgb2lab, then neighbor similarity against the
    stride-4-subsampled validity mask (offset starts at stride//2).  Here the
    whole chain is jnp and can live inside the jitted step.
    """
    b, c, h, w = images.shape
    assert h % 4 == 0 and w % 4 == 0, "image dims must be divisible by 4"
    down = images.astype(jnp.float32).reshape(b, c, h // 4, 4, w // 4, 4)
    down = jnp.mean(down, axis=(3, 5))
    down = jnp.floor(down)                      # torch .byte() truncates
    lab = rgb2lab(down.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    masks = image_masks[:, 2::4, 2::4].astype(jnp.float32)
    return images_color_similarity(lab, masks, pairwise_size,
                                   pairwise_dilation)


# ---------------------------------------------------------------------------
# projection dice + assembled objective


def dice_coefficient(x: jnp.ndarray, target: jnp.ndarray,
                     eps: float = 1e-5) -> jnp.ndarray:
    """Per-instance squared-denominator dice distance (ref utils.py:310-318)."""
    n = x.shape[0]
    x = x.reshape(n, -1)
    target = target.reshape(n, -1)
    inter = jnp.sum(x * target, axis=1)
    union = jnp.sum(x ** 2, axis=1) + jnp.sum(target ** 2, axis=1) + eps
    return 1.0 - 2.0 * inter / union


def paired_losses(ins_pred: jnp.ndarray,          # (N, H, W) mask logits
                  ins_labels: jnp.ndarray,        # (N, H, W) {0,1} box masks
                  color_similarity: jnp.ndarray,  # (N, k²-1, H, W)
                  valid: jnp.ndarray,             # (N,) {0,1}
                  *,
                  level_ids: jnp.ndarray | None = None,  # (N,) int FPN level
                  num_levels: int = 5,
                  step: jnp.ndarray | int = 0,
                  warmup_iters: int = 1000,
                  pairwise_size: int = 3,
                  pairwise_dilation: int = 2,
                  pairwise_color_thresh: float = 0.3,
                  ins_loss_weight: float = 3.0) -> dict[str, jnp.ndarray]:
    """BoxInst pseudo objective over a FIXED-shape instance stack.

    Mirrors ref solov2.py:416-500 with `valid` replacing the variable-length
    per-level lists (invalid rows contribute zero and are excluded from the
    means).  Defaults follow the reference init (solov2.py:139-142,
    ins_loss_weight from the FreeSOLO config).

    Level weighting: the reference averages per-FPN-level — each level's
    instance mean (and its own weighted pairwise ratio) is computed first,
    then the level values are averaged.  Pass `level_ids` (the per-instance
    FPN level, any id < `num_levels`) to reproduce that exactly; levels with
    no valid instance are excluded from the level mean (they have no
    prediction tensor upstream, ref solov2.py:432-433).  With
    `level_ids=None` the losses are GLOBAL means over all valid instances —
    a deliberate simplification that differs from the reference whenever
    instances are unevenly distributed across levels (see PARITY.md).
    """
    valid = valid.astype(jnp.float32)
    scores = jax.nn.sigmoid(ins_pred)
    target = ins_labels.astype(jnp.float32)

    if level_ids is not None:
        # (N, L) membership, invalid rows zeroed everywhere
        onehot = (level_ids[:, None] == jnp.arange(num_levels)[None]
                  ).astype(jnp.float32) * valid[:, None]
        count = jnp.sum(onehot, axis=0)                       # (L,)
        present = (count > 0).astype(jnp.float32)
        n_present = jnp.maximum(jnp.sum(present), 1.0)

        def agg(per_inst):  # (N,) -> per-level mean -> mean over levels
            lv = jnp.sum(onehot * per_inst[:, None], axis=0) \
                / jnp.maximum(count, 1.0)
            return jnp.sum(lv * present) / n_present
    else:
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)

        def agg(per_inst):
            return jnp.sum(per_inst * valid) / n_valid

    def proj_pair(reduce):
        y = dice_coefficient(reduce(scores, 1), reduce(target, 1))
        x = dice_coefficient(reduce(scores, 2), reduce(target, 2))
        return agg(y + x)

    loss_ins_max = proj_pair(lambda a, ax: jnp.max(a, axis=ax, keepdims=True))
    loss_ins = proj_pair(lambda a, ax: jnp.mean(a, axis=ax, keepdims=True))

    pairwise = compute_pairwise_term(ins_pred[:, None], pairwise_size,
                                     pairwise_dilation)
    box_target = (jnp.max(target, axis=1, keepdims=True)
                  * jnp.max(target, axis=2, keepdims=True))  # (N, H, W)
    weights = ((color_similarity >= pairwise_color_thresh).astype(jnp.float32)
               * box_target[:, None] * valid[:, None, None, None])
    warmup = jnp.minimum(jnp.asarray(step, jnp.float32) / warmup_iters, 1.0)
    if level_ids is not None:
        # per-level weighted ratio (denominator clamped per level, ref
        # solov2.py:470-474), then mean over present levels
        pw_num = jnp.sum(pairwise * weights, axis=(1, 2, 3))  # (N,)
        w_sum = jnp.sum(weights, axis=(1, 2, 3))
        lv_num = jnp.sum(onehot * pw_num[:, None], axis=0)
        lv_den = jnp.maximum(jnp.sum(onehot * w_sum[:, None], axis=0), 1.0)
        loss_pairwise = (jnp.sum((lv_num / lv_den) * present)
                         / n_present) * warmup
    else:
        loss_pairwise = (jnp.sum(pairwise * weights)
                         / jnp.maximum(jnp.sum(weights), 1.0)) * warmup

    return {
        "loss_ins": loss_ins * ins_loss_weight * 0.1,
        "loss_ins_max": loss_ins_max * ins_loss_weight * 1.0,
        "loss_pairwise": loss_pairwise,
    }
