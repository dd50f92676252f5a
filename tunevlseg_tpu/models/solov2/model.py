"""SOLOv2 (FreeSOLO class-agnostic variant) — heads + fixed-shape inference.

Re-implements the reference inference path (src/models/core_models/solov2/):
  * InsHead: coord-concat, per-level bilinear resize to the grid size,
    4-conv GN towers for category/kernel, cate/kernel/emb 3x3 prediction
    convs (solov2inshead.py:49-220);
  * MaskHead: per-level conv+2x-upsample chains (coords appended on the
    stride-32 level), summed, 1x1 conv+GN+relu to num_masks channels
    (solov2maskhead.py:46-196);
  * inference: point NMS on sigmoid category maps, score threshold, dynamic
    conv of mask features by predicted kernels, stride-based area filter,
    maskness rescoring, Gaussian matrix NMS, top-k (solov2.py:684-975,
    utils.py:219-270).

TPU-first formulation: the reference's boolean-indexing pipeline becomes a
FIXED-shape masked pipeline — `lax.top_k` selections with validity flags
instead of data-dependent filtering — so the whole proposal generator is one
jittable XLA program (SURVEY §7 hard part #6). Proposals are padded to
`max_per_img` with a validity mask.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tunevlseg_tpu.models.solov2.backbone import D2FPN, D2ResNet, max_pool_nchw
from tunevlseg_tpu.nn.conv import Conv2d
from tunevlseg_tpu.ops.image import resize_2d

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SOLOv2Config:
    depth: int = 101
    fpn_channels: int = 256
    num_classes: int = 2
    num_kernels: int = 256
    num_masks: int = 256
    num_embs: int = 128
    num_grids: Sequence[int] = (40, 36, 24, 16, 12)
    instance_strides: Sequence[int] = (8, 8, 16, 32, 32)
    instance_channels: int = 512
    mask_channels: int = 128
    num_instance_convs: int = 4
    # inference
    score_threshold: float = 0.1
    mask_threshold: float = 0.5
    update_threshold: float = 0.05
    nms_pre: int = 500
    max_per_img: int = 100
    nms_sigma: float = 2.0
    pixel_mean: Sequence[float] = (123.675, 116.28, 103.53)
    pixel_std: Sequence[float] = (58.395, 57.12, 57.375)

    @staticmethod
    def tiny(**kw) -> "SOLOv2Config":
        base = dict(depth=50, fpn_channels=16, num_kernels=8, num_masks=8,
                    num_embs=8, num_grids=(8, 6, 4, 3, 2),
                    instance_channels=16, mask_channels=8,
                    num_instance_convs=2, nms_pre=50, max_per_img=10)
        base.update(kw)
        return SOLOv2Config(**base)


def _coord_grid(b: int, h: int, w: int, dtype) -> jnp.ndarray:
    xs = jnp.linspace(-1, 1, w, dtype=dtype)
    ys = jnp.linspace(-1, 1, h, dtype=dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.broadcast_to(jnp.stack([xx, yy])[None], (b, 2, h, w))


class ConvGNRelu(nn.Module):
    in_ch: int
    out_ch: int
    kernel: int = 3
    use_gn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.in_ch, self.out_ch, self.kernel,
                   padding=self.kernel // 2, use_bias=not self.use_gn,
                   dtype=self.dtype, name="conv")(x)
        if self.use_gn:
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name="gn")(x.transpose(0, 2, 3, 1)
                                        ).transpose(0, 3, 1, 2)
        return nn.relu(x)


class SOLOv2InsHead(nn.Module):
    config: SOLOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        c = self.config
        cate_preds, kernel_preds, emb_preds = [], [], []

        towers = {}
        for head, extra_in in (("cate", 0), ("kernel", 2)):
            layers = []
            for i in range(c.num_instance_convs):
                cin = (c.fpn_channels + extra_in) if i == 0 \
                    else c.instance_channels
                layers.append(ConvGNRelu(cin, c.instance_channels,
                                         dtype=self.dtype,
                                         name=f"{head}_tower_{i}"))
            towers[head] = layers
        cate_pred = Conv2d(c.instance_channels, c.num_classes, 3, padding=1,
                           dtype=self.dtype, name="cate_pred")
        kernel_pred = Conv2d(c.instance_channels, c.num_kernels, 3, padding=1,
                             dtype=self.dtype, name="kernel_pred")
        emb_pred = Conv2d(c.instance_channels, c.num_embs, 3, padding=1,
                          dtype=self.dtype, name="emb_pred")

        for idx, feat in enumerate(features):
            b, _, h, w = feat.shape
            grid = c.num_grids[idx]
            with_coords = jnp.concatenate(
                [feat, _coord_grid(b, h, w, feat.dtype)], axis=1)
            kernel_feat = resize_2d(with_coords, (grid, grid), "bilinear")
            cate_feat = kernel_feat[:, :-2]

            kf = kernel_feat
            for layer in towers["kernel"]:
                kf = layer(kf)
            kernel_preds.append(kernel_pred(kf))

            cf = cate_feat
            for layer in towers["cate"]:
                cf = layer(cf)
            cate_preds.append(cate_pred(cf))
            emb_preds.append(emb_pred(cf))
        return cate_preds, kernel_preds, emb_preds


class SOLOv2MaskHead(nn.Module):
    config: SOLOv2Config
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):  # p2..p5
        c = self.config
        total = None
        for i, feat in enumerate(features):
            x = feat
            if i == 3:
                b, _, h, w = x.shape
                x = jnp.concatenate([x, _coord_grid(b, h, w, x.dtype)], axis=1)
            if i == 0:
                x = ConvGNRelu(c.fpn_channels, c.mask_channels,
                               dtype=self.dtype, name="level0_conv0")(x)
            else:
                for j in range(i):
                    cin = (c.fpn_channels + (2 if i == 3 else 0)) if j == 0 \
                        else c.mask_channels
                    x = ConvGNRelu(cin, c.mask_channels, dtype=self.dtype,
                                   name=f"level{i}_conv{j}")(x)
                    x = resize_2d(x, (x.shape[2] * 2, x.shape[3] * 2),
                                  "bilinear")
            total = x if total is None else total + x
        out = Conv2d(c.mask_channels, c.num_masks, 1, use_bias=False,
                     dtype=self.dtype, name="conv_pred_conv")(total)
        out = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                           name="conv_pred_gn")(out.transpose(0, 2, 3, 1)
                                                ).transpose(0, 3, 1, 2)
        return nn.relu(out)


class SOLOv2(nn.Module):
    """Backbone + heads; `__call__` returns raw predictions, `inference`
    converts them to fixed-shape proposals."""

    config: SOLOv2Config
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        in_channels = (c.depth and (256, 512, 1024, 2048))
        self.backbone = D2ResNet(c.depth, dtype=self.dtype, name="backbone")
        self.fpn = D2FPN(c.fpn_channels, in_channels, dtype=self.dtype,
                         name="fpn")
        self.ins_head = SOLOv2InsHead(c, dtype=self.dtype, name="ins_head")
        self.mask_head = SOLOv2MaskHead(c, dtype=self.dtype, name="mask_head")

    def __call__(self, images: jnp.ndarray):
        """images: (B, 3, H, W) already normalized + padded to /32."""
        feats = self.fpn(self.backbone(images))
        ins_feats = [feats[f] for f in ("p2", "p3", "p4", "p5", "p6")]
        # split_feats (solov2.py:675-683): p2 halved, p6 resized to p5
        ins_feats = [
            resize_2d(ins_feats[0], (ins_feats[0].shape[2] // 2,
                                     ins_feats[0].shape[3] // 2), "bilinear"),
            ins_feats[1], ins_feats[2], ins_feats[3],
            resize_2d(ins_feats[4], ins_feats[3].shape[2:], "bilinear"),
        ]
        cate, kernel, emb = self.ins_head(ins_feats)
        mask_feats = self.mask_head([feats[f] for f in ("p2", "p3", "p4",
                                                        "p5")])
        return cate, kernel, emb, mask_feats


def point_nms(heat: jnp.ndarray) -> jnp.ndarray:
    """Keep local maxima of the category heatmap (utils.py:219-223):
    2x2 max-pool with the reference's asymmetric padding."""
    hmax = max_pool_nchw(heat, 2, 1, 1)[:, :, :-1, :-1]
    return heat * (hmax == heat).astype(heat.dtype)


def matrix_nms(seg_masks: jnp.ndarray, sum_masks: jnp.ndarray,
               labels: jnp.ndarray, scores: jnp.ndarray,
               valid: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Gaussian matrix NMS (utils.py:226-270) on fixed (N, ...) inputs sorted
    by descending score; invalid rows contribute nothing."""
    n = seg_masks.shape[0]
    flat = seg_masks.reshape(n, -1).astype(jnp.float32) \
        * valid[:, None].astype(jnp.float32)
    inter = flat @ flat.T
    sums = jnp.maximum(sum_masks, 0.0)
    union = sums[None, :] + sums[:, None] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-6), 0.0)
    triu = jnp.triu(jnp.ones((n, n), jnp.float32), k=1)
    label_eq = (labels[None, :] == labels[:, None]).astype(jnp.float32)
    iou = iou * triu * label_eq

    compensate = jnp.max(iou, axis=0)          # per column (proposal j)
    # gaussian kernel: exp(-sigma*iou^2) / exp(-sigma*comp^2), min over rows
    # (utils.py:265-267; the min runs over the FULL matrix, so rows below the
    # diagonal contribute exp(sigma*comp^2) >= 1 exactly as in the reference)
    decay = jnp.exp(-sigma * iou ** 2) \
        / jnp.exp(-sigma * compensate[:, None] ** 2)
    coeff = jnp.min(decay, axis=0)
    return scores * coeff


def solov2_inference(cate_preds, kernel_preds, emb_preds, mask_feats,
                     cfg: SOLOv2Config, cur_hw: tuple[int, int],
                     ori_hw: tuple[int, int]):
    """Fixed-shape single-image inference (solov2.py:833-975).

    Returns (masks (M, H, W) bool, boxes (M, 4), scores (M,), embs (M, E),
    valid (M,)) with M = cfg.max_per_img.
    """
    c = cfg.num_classes
    # flatten levels
    scores_lv, kernels_lv, embs_lv, strides_lv = [], [], [], []
    for lvl, (cate, kern, emb) in enumerate(zip(cate_preds, kernel_preds,
                                                emb_preds)):
        heat = point_nms(jax.nn.sigmoid(cate.astype(jnp.float32)))
        g = heat.shape[-1]
        scores_lv.append(heat[0].transpose(1, 2, 0).reshape(-1, c))
        kernels_lv.append(kern[0].transpose(1, 2, 0).reshape(g * g, -1))
        embs_lv.append(emb[0].transpose(1, 2, 0).reshape(g * g, -1))
        strides_lv.append(jnp.full((g * g,), cfg.instance_strides[lvl],
                                   jnp.float32))
    scores_all = jnp.concatenate(scores_lv)          # (S, C)
    kernels_all = jnp.concatenate(kernels_lv)        # (S, K)
    embs_all = jnp.concatenate(embs_lv)              # (S, E)
    strides_all = jnp.concatenate(strides_lv)        # (S,)

    flat_scores = scores_all.reshape(-1)             # (S*C,)
    k = min(cfg.nms_pre, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(flat_scores > cfg.score_threshold, flat_scores, -1.0), k)
    valid = top_scores > cfg.score_threshold
    cell = top_idx // c
    labels = top_idx % c

    kernels = kernels_all[cell]                      # (k, K)
    # dynamic 1x1 conv: (k, K) x (K, Hf, Wf)
    mf = mask_feats[0].astype(jnp.float32)
    seg_logits = jnp.einsum("nk,khw->nhw", kernels.astype(jnp.float32), mf,
                            preferred_element_type=jnp.float32)
    seg_sigmoid = jax.nn.sigmoid(seg_logits)
    seg_bin = seg_sigmoid > cfg.mask_threshold
    sum_masks = jnp.sum(seg_bin, axis=(1, 2)).astype(jnp.float32)

    valid &= sum_masks > strides_all[cell]
    maskness = jnp.sum(seg_sigmoid * seg_bin, axis=(1, 2)) \
        / jnp.maximum(sum_masks, 1.0)
    scores = top_scores * maskness * valid

    # resort by rescored values (reference sorts before NMS)
    order = jnp.argsort(-scores)
    seg_sigmoid = seg_sigmoid[order]
    seg_bin = seg_bin[order]
    sum_masks = sum_masks[order]
    scores = scores[order]
    labels = labels[order]
    valid = valid[order]
    embs = embs_all[cell][order]

    decayed = matrix_nms(seg_bin, sum_masks, labels, scores, valid,
                         cfg.nms_sigma)
    keep = (decayed >= cfg.update_threshold) & valid

    m = cfg.max_per_img
    final_scores, final_idx = jax.lax.top_k(
        jnp.where(keep, decayed, -1.0), min(m, decayed.shape[0]))
    final_valid = final_scores >= cfg.update_threshold
    sel_sigmoid = seg_sigmoid[final_idx]
    sel_embs = embs[final_idx]

    # upsample to ori size (solov2.py:738-790)
    h, w = cur_hw
    f_h, f_w = sel_sigmoid.shape[-2:]
    ratio = max(-(-h // f_h), -(-w // f_w))
    up = resize_2d(sel_sigmoid, (f_h * ratio, f_w * ratio), "bilinear")
    up = up[:, :h, :w]
    up = resize_2d(up, ori_hw, "bilinear")
    masks = up > cfg.mask_threshold
    areas = jnp.sum(masks, axis=(1, 2))
    final_valid &= areas > 0
    masks = masks & final_valid[:, None, None]

    # boxes from projections + center of mass (solov2.py:808-830)
    width_proj = jnp.max(masks, axis=1).astype(jnp.float32)   # (M, W)
    height_proj = jnp.max(masks, axis=2).astype(jnp.float32)  # (M, H)
    widths = jnp.sum(width_proj, axis=1)
    heights = jnp.sum(height_proj, axis=1)
    xs = jnp.arange(width_proj.shape[1], dtype=jnp.float32)
    ys = jnp.arange(height_proj.shape[1], dtype=jnp.float32)
    m00w = jnp.maximum(jnp.sum(width_proj, axis=1), 1e-6)
    m00h = jnp.maximum(jnp.sum(height_proj, axis=1), 1e-6)
    center_ws = jnp.sum(width_proj * xs[None], axis=1) / m00w
    center_hs = jnp.sum(height_proj * ys[None], axis=1) / m00h
    boxes = jnp.stack([center_ws - 0.5 * widths, center_hs - 0.5 * heights,
                       center_ws + 0.5 * widths, center_hs + 0.5 * heights],
                      axis=1)

    norm = jnp.linalg.norm(sel_embs, axis=-1, keepdims=True)
    sel_embs = sel_embs / jnp.maximum(norm, 1e-12)
    return masks, boxes, final_scores, sel_embs, final_valid


def preprocess_image(image: jnp.ndarray, cfg: SOLOv2Config,
                     size_divisibility: int = 32,
                     normalize: bool = False) -> jnp.ndarray:
    """(3, H, W) RGB -> padded-to-/32, batched.

    NOTE: normalization is OFF by default — the reference's normalizer is
    commented out (solov2.py:146-158), so PseudoSOLOv2/FreeSOLO consumes RAW
    pixel values. `normalize=True` restores the documented pixel mean/std."""
    x = image
    if normalize:
        mean = jnp.asarray(cfg.pixel_mean, image.dtype).reshape(3, 1, 1)
        std = jnp.asarray(cfg.pixel_std, image.dtype).reshape(3, 1, 1)
        x = (x - mean) / std
    h, w = x.shape[1:]
    ph = -h % size_divisibility
    pw = -w % size_divisibility
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))
    return x[None]
