"""ZeroShotRIS: training-free referring segmentation
(FreeSOLO proposals + masked/cropped CLIP features + text ensemble).

Re-implements the reference pipeline (src/models/core_models/zero_shot_ris/
__init__.py:25-474) TPU-first:
  * FreeSOLO proposes up to `max_per_img` masks/boxes with a validity mask
    (fixed shapes instead of data-dependent proposal counts — SURVEY §7
    hard part #5);
  * "mask features": CLIP ViT where, from `masking_block_idx` on, the patch
    tokens are multiplied by each proposal's (nearest-resized) mask before
    EVERY remaining block, proposals becoming the batch
    (zero_shot_ris/utils.py:13-55, 86-154);
  * "crop features": the image mask-filled with its channel mean, per-box
    crop resized to the CLIP input (resized-crop as two matmuls per
    proposal), standard CLIP pooled features (__init__.py:106-159);
  * visual = alpha*mask + (1-alpha)*crop; text = beta*phrase +
    (1-beta)*classname; cosine argmax over VALID proposals picks the mask
    (__init__.py:161-233);
  * optional npz disk cache of freesolo/visual/text features keyed by
    `cache_name`, enabling model-free alpha/beta sweeps (the
    `zeroshot_get_hparams.sh` workflow).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.models.clip.text import CLIPTextTower
from tunevlseg_tpu.models.clip.vision import CLIPVisionTower
from tunevlseg_tpu.models.solov2.model import (SOLOv2, SOLOv2Config,
                                               preprocess_image,
                                               solov2_inference)
from tunevlseg_tpu.ops.image import _resize_matrix, resize_2d

from flax import linen as nn


class MaskedCLIP(nn.Module):
    """CLIP dual encoder with the per-proposal patch-masking vision path."""

    config: CLIPSegConfig  # reuses text/vision tower configs + projections
    dtype: Any = jnp.float32

    def setup(self):
        c = self.config
        self.text_model = CLIPTextTower(c.text, dtype=self.dtype,
                                        name="text_model")
        self.vision_model = CLIPVisionTower(c.vision, dtype=self.dtype,
                                            name="vision_model")
        self.text_projection = nn.Dense(c.projection_dim, use_bias=False,
                                        dtype=self.dtype,
                                        name="text_projection")
        self.visual_projection = nn.Dense(c.projection_dim, use_bias=False,
                                          dtype=self.dtype,
                                          name="visual_projection")

    def get_text_features(self, input_ids, attention_mask=None):
        _, pooled = self.text_model(input_ids, attention_mask=attention_mask)
        return self.text_projection(pooled)

    def get_image_features(self, pixel_values, pred_masks=None,
                           masking_block_idx=None):
        """pred_masks: (P, g, g) {0,1} masks at the patch grid; proposals
        become the batch from `masking_block_idx` on."""
        vm = self.vision_model
        x = vm.embed_patches(pixel_values)
        x = vm.pre_layernorm(x)
        layers = vm.layers
        if pred_masks is None:
            for layer in layers:
                x = layer(x)
        else:
            n_layers = len(layers)
            split = (masking_block_idx % n_layers
                     if masking_block_idx is not None else n_layers)
            for layer in layers[:split]:
                x = layer(x)
            p = pred_masks.shape[0]
            g = pred_masks.shape[-1]
            mask_flat = pred_masks.reshape(p, g * g, 1).astype(x.dtype)
            for layer in layers[split:]:
                cls = jnp.broadcast_to(x[:, :1], (p, 1, x.shape[-1]))
                patches = x[:, 1:] * mask_flat if x.shape[0] == p else \
                    jnp.broadcast_to(x[:, 1:], (p, g * g, x.shape[-1])) \
                    * mask_flat
                x = jnp.concatenate([cls, patches], axis=1)
                x = layer(x)
        pooled = vm.post_layernorm(x[:, 0])
        return self.visual_projection(pooled)


@dataclasses.dataclass
class ZeroShotRIS:
    """Host-side orchestrator (batch 1, eval only) around two jitted parts:
    the SOLOv2 proposal generator and the CLIP feature extractors."""

    clip_config: CLIPSegConfig
    solo_config: SOLOv2Config
    clip_params: Any
    solo_params: Any
    masking_block_idx: Optional[int] = -3
    alpha: float = 0.95
    beta: float = 0.5
    num_masks: int = 1
    clip_image_size: int = 224
    cache_dir: Optional[Path] = None
    read_cache: bool = False
    write_cache: bool = False
    # alternative CLIP variant (e.g. BiomedCLIP — the reference's
    # `is_hf_model=false` open_clip branch, zero_shot_ris/__init__.py:62-64);
    # must expose get_text_features/get_image_features like MaskedCLIP and
    # a config with `.vision.patch_size`
    clip_model: Optional[Any] = None
    # multi-chip inference: a jax.sharding.Mesh shards the PROPOSAL batch
    # (the (P, ...) masks / downsampled masks / crops) over its data axis —
    # the masked-CLIP / crop-CLIP towers, the mask-downsample einsum and
    # the crop-resize then run proposal-parallel under GSPMD; the proposal
    # net and text tower (batch 1-2) stay replicated. No collectives until
    # the (P,) cosine argmax. The reference has no counterpart (its
    # pipeline is single-GPU eval, zero_shot_ris/__init__.py).
    mesh: Optional[Any] = None

    def __post_init__(self):
        self.clip = (self.clip_model if self.clip_model is not None
                     else MaskedCLIP(self.clip_config))
        self.solo = SOLOv2(self.solo_config)
        if self.cache_dir is not None:
            self.cache_dir = Path(self.cache_dir)
            self.cache_dir.mkdir(parents=True, exist_ok=True)
        self._jit_solo = jax.jit(self._solo_forward,
                                 static_argnames=("ori_hw",))
        self._jit_fused = jax.jit(self._fused_forward,
                                  static_argnames=("ori_hw",))

    def _pshard(self, x):
        """Constrain a proposal-batched (P, ...) tensor to shard its leading
        dim over the mesh's data axis; identity without a mesh."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec
        from tunevlseg_tpu.parallel.mesh import DATA_AXIS
        spec = PartitionSpec(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    # ---- FreeSOLO proposals ------------------------------------------------

    def _solo_forward(self, params, image, ori_hw):
        batched = preprocess_image(image, self.solo_config)
        cate, kern, emb, mask_feats = self.solo.apply({"params": params},
                                                      batched)
        cur_hw = batched.shape[-2:]
        return solov2_inference(cate, kern, emb, mask_feats,
                                self.solo_config, cur_hw, ori_hw)

    def get_freesolo_predictions(self, image: np.ndarray,
                                 cache_name: Optional[str] = None):
        path = self._cache_path(cache_name, "freesolo")
        if path is not None and self.read_cache and path.exists():
            data = np.load(path)
            return (data["masks"], data["boxes"], data["valid"])
        ori_hw = tuple(image.shape[-2:])
        masks, boxes, scores, embs, valid = self._jit_solo(
            self.solo_params, jnp.asarray(image), ori_hw)
        masks, boxes, valid = (np.asarray(masks), np.asarray(boxes),
                               np.asarray(valid))
        if path is not None and self.write_cache:
            np.savez_compressed(path, masks=masks, boxes=boxes, valid=valid)
        return masks, boxes, valid

    # ---- CLIP features -----------------------------------------------------

    def get_mask_features(self, image: np.ndarray, masks: np.ndarray):
        size = self.clip_image_size
        resized = resize_2d(jnp.asarray(image)[None], (size, size), "bicubic")
        grid = size // self.clip_config.vision.patch_size
        # NEAREST_EXACT mask downsample (half-pixel centers)
        rows = jnp.asarray(_resize_matrix(masks.shape[-2], grid, "nearest"))
        cols = jnp.asarray(_resize_matrix(masks.shape[-1], grid, "nearest"))
        # two small matmuls on DEVICE — the previous host einsum was ~3
        # GFLOP/image of numpy on the driving core
        small = jnp.einsum("gh,phw,kw->pgk", rows,
                           jnp.asarray(masks, jnp.float32), cols)
        small = (small > 0.5).astype(jnp.float32)
        return self.clip.apply(
            {"params": self.clip_params}, jnp.asarray(resized),
            jnp.asarray(small), self.masking_block_idx,
            method=self.clip.get_image_features)

    @staticmethod
    def host_crop_canvases(image: np.ndarray, boxes: np.ndarray,
                           masks: np.ndarray, valid: np.ndarray,
                           size: int) -> np.ndarray:
        """Reference crop pipeline on host (torchvision resized_crop of the
        mask-filled image; ref zero_shot_ris/__init__.py:106-159). Kept as
        the oracle for the device op `ops.image.crop_resize_bicubic_masked`."""
        pixel_mean = image.mean(axis=(1, 2), keepdims=True)
        crops = []
        for box, mask, ok in zip(boxes.astype(np.int64), masks, valid):
            if not ok:
                crops.append(np.zeros((3, size, size), np.float32))
                continue
            filled = image * mask[None] + (1 - mask[None]) * pixel_mean
            x1, y1, x2, y2 = box
            h, w = image.shape[1:]
            # torchvision resized_crop semantics: crop (may exceed bounds ->
            # zero-pad) then resize
            ch, cw = max(int(y2 - y1), 1), max(int(x2 - x1), 1)
            canvas = np.zeros((3, ch, cw), np.float32)
            ys0, xs0 = max(0, int(y1)), max(0, int(x1))
            ys1, xs1 = min(h, int(y1) + ch), min(w, int(x1) + cw)
            if ys1 > ys0 and xs1 > xs0:
                canvas[:, ys0 - int(y1):ys1 - int(y1),
                       xs0 - int(x1):xs1 - int(x1)] = \
                    filled[:, ys0:ys1, xs0:xs1]
            crops.append(np.asarray(
                resize_2d(jnp.asarray(canvas), (size, size), "bicubic")))
        return np.stack(crops)

    def get_crop_features(self, image: np.ndarray, boxes: np.ndarray,
                          masks: np.ndarray, valid: np.ndarray):
        crops = self.host_crop_canvases(image, boxes, masks, valid,
                                        self.clip_image_size)
        return self.clip.apply({"params": self.clip_params},
                               jnp.asarray(crops),
                               method=self.clip.get_image_features)

    def get_visual_feature(self, image, boxes, masks, valid,
                           cache_name=None):
        path = self._cache_path(cache_name, "visual_feature")
        if path is not None and self.read_cache and path.exists():
            data = np.load(path)
            mask_f, crop_f = (jnp.asarray(data["mask_features"]),
                              jnp.asarray(data["crop_features"]))
        else:
            mask_f = (self.get_mask_features(image, masks)
                      if self.alpha != 0 else 0.0)
            crop_f = (self.get_crop_features(image, boxes, masks, valid)
                      if self.alpha != 1 else 0.0)
            if path is not None and self.write_cache:
                np.savez_compressed(path, mask_features=np.asarray(mask_f),
                                    crop_features=np.asarray(crop_f))
        return self.alpha * mask_f + (1 - self.alpha) * crop_f

    def get_text_ensemble(self, input_ids, attention_mask, cache_name=None):
        path = self._cache_path(cache_name, "textual_feature")
        if path is not None and self.read_cache and path.exists():
            data = np.load(path)
            phrase = jnp.asarray(data["phrase_features"])
            classname = jnp.asarray(data["class_features"])
        else:
            feats = self.clip.apply(
                {"params": self.clip_params}, jnp.asarray(input_ids),
                jnp.asarray(attention_mask),
                method=self.clip.get_text_features)
            phrase, classname = feats[0], feats[1]
            if path is not None and self.write_cache:
                np.savez_compressed(path,
                                    phrase_features=np.asarray(phrase),
                                    class_features=np.asarray(classname))
        return self.beta * phrase + (1 - self.beta) * classname

    # ---- end to end --------------------------------------------------------

    # ---- fused single-launch path (alpha == 1) -----------------------------

    def _fused_forward(self, solo_params, clip_params, image, input_ids,
                       attention_mask, ori_hw):
        """The whole pipeline in ONE executable: proposals → device mask
        downsample → masked-CLIP (+ device crop-resize → CLIP when
        alpha<1) → text ensemble → cosine argmax → selected mask. On the
        axon transport each extra launch costs ~30ms of dispatch and every
        host hop ships the (P,H,W) proposal masks; the host loop spends
        3-4 launches plus ~100 per-crop resizes per image — this path
        spends one launch and keeps everything on device."""
        masks, boxes, scores, embs, valid = self._solo_forward(
            solo_params, image, ori_hw)
        # proposal-parallel under a mesh: the (P, H, W) masks and every
        # (P, ...) tensor derived from them shard over the data axis
        masks = self._pshard(masks)
        size = self.clip_image_size
        visual = 0.0
        if self.alpha != 0.0:
            resized = resize_2d(image[None], (size, size), "bicubic")
            grid = size // self.clip_config.vision.patch_size
            rows = jnp.asarray(_resize_matrix(ori_hw[0], grid, "nearest"))
            cols = jnp.asarray(_resize_matrix(ori_hw[1], grid, "nearest"))
            small = jnp.einsum("gh,phw,kw->pgk", rows,
                               masks.astype(jnp.float32), cols)
            small = self._pshard((small > 0.5).astype(jnp.float32))
            mask_f = self.clip.apply(
                {"params": clip_params}, resized, small,
                self.masking_block_idx, method=self.clip.get_image_features)
            visual = visual + self.alpha * mask_f
        if self.alpha != 1.0:
            from tunevlseg_tpu.ops.image import crop_resize_bicubic_masked
            crops = self._pshard(
                crop_resize_bicubic_masked(image, masks, boxes, size))
            crop_f = self.clip.apply(
                {"params": clip_params}, crops,
                method=self.clip.get_image_features)
            # invalid rows: irrelevant (masked to -inf at selection), same
            # as the host path's zero-canvas features
            visual = visual + (1.0 - self.alpha) * crop_f
        feats = self.clip.apply(
            {"params": clip_params}, input_ids, attention_mask,
            method=self.clip.get_text_features)
        text = self.beta * feats[0] + (1 - self.beta) * feats[1]
        v = visual / jnp.linalg.norm(visual, axis=-1, keepdims=True)
        t = text / jnp.linalg.norm(text, axis=-1)
        sims = jnp.where(valid.astype(bool), jnp.dot(v, t), -jnp.inf)
        if self.num_masks == 1:
            idx = jnp.argmax(sims)[None]
        else:
            idx = jax.lax.top_k(sims, self.num_masks)[1]
        picked = jnp.take(masks, idx, axis=0)[:, None].astype(jnp.float32)
        # zero-proposal contract: all-invalid -> zero mask (__call__ parity)
        picked = jnp.where(jnp.any(valid.astype(bool)), picked,
                           jnp.zeros_like(picked))
        extras = {"masks": masks, "boxes": boxes, "valid": valid,
                  "mask_features": (mask_f if self.alpha != 0.0
                                    else jnp.float32(0.0)),
                  "crop_features": (crop_f if self.alpha != 1.0
                                    else jnp.float32(0.0)),
                  "phrase_features": feats[0], "class_features": feats[1]}
        return picked, extras

    def predict_fused(self, image: np.ndarray, input_ids: np.ndarray,
                      attention_mask: np.ndarray,
                      cache_name: Optional[str] = None) -> np.ndarray:
        """Single-launch variant of __call__ at any alpha (the crop branch
        runs on device via ops.image.crop_resize_bicubic_masked).

        With `write_cache` + `cache_dir` configured it ALSO writes the same
        npz cache the host path produces (freesolo/visual/textual files),
        so the alpha/beta-sweep cache-building pass runs at fused speed;
        only then are the intermediate arrays pulled off device."""
        ori_hw = tuple(image.shape[-2:])
        picked, extras = self._jit_fused(
            self.solo_params, self.clip_params, jnp.asarray(image),
            jnp.asarray(input_ids), jnp.asarray(attention_mask), ori_hw)
        if self.write_cache and self.cache_dir is not None and cache_name:
            np.savez_compressed(
                self._cache_path(cache_name, "freesolo"),
                masks=np.asarray(extras["masks"]),
                boxes=np.asarray(extras["boxes"]),
                valid=np.asarray(extras["valid"]))
            np.savez_compressed(
                self._cache_path(cache_name, "visual_feature"),
                mask_features=np.asarray(extras["mask_features"]),
                crop_features=np.asarray(extras["crop_features"]))
            np.savez_compressed(
                self._cache_path(cache_name, "textual_feature"),
                phrase_features=np.asarray(extras["phrase_features"]),
                class_features=np.asarray(extras["class_features"]))
        return np.asarray(picked)

    def predict_fused_many(self, items, depth: int = 2):
        """Pipelined fused inference: generator over `items` (dicts with
        `image`, `input_ids`, `attention_mask`, optional `cache_name`),
        yielding the picked masks as numpy arrays in order.

        Keeps up to `depth` launches IN FLIGHT: `predict_fused`'s per-image
        device→host read is a sync barrier, so a plain loop serializes the
        ~30 ms remote dispatch with the ~230 ms device program; here the
        host dispatches image i+1..i+depth while the device computes image
        i, and the consumer's per-item work (metric updates, disk IO)
        overlaps too. Numerically identical to sequential `predict_fused`
        (same jitted executable, same inputs).

        Cache writing needs every intermediate on host per image, so
        `write_cache` (or depth<1) falls back to the sequential path."""
        from collections import deque
        if depth < 1 or (self.write_cache and self.cache_dir is not None):
            for item in items:
                yield self.predict_fused(item["image"], item["input_ids"],
                                         item["attention_mask"],
                                         cache_name=item.get("cache_name"))
            return
        pending: deque = deque()
        for item in items:
            ori_hw = tuple(item["image"].shape[-2:])
            picked, _ = self._jit_fused(
                self.solo_params, self.clip_params,
                jnp.asarray(item["image"]), jnp.asarray(item["input_ids"]),
                jnp.asarray(item["attention_mask"]), ori_hw)
            pending.append(picked)
            if len(pending) > depth:
                yield np.asarray(pending.popleft())
        while pending:
            yield np.asarray(pending.popleft())

    def __call__(self, image: np.ndarray, input_ids: np.ndarray,
                 attention_mask: np.ndarray,
                 cache_name: Optional[str] = None) -> np.ndarray:
        """image (3,H,W) raw RGB floats; input_ids (2, L): [phrase, class].
        Returns (num_masks, 1, H, W) float mask(s)."""
        masks, boxes, valid = self.get_freesolo_predictions(image, cache_name)
        if not valid.any():
            return np.zeros((1, 1, *image.shape[1:]), np.float32)

        visual = self.get_visual_feature(image, boxes, masks, valid,
                                         cache_name)
        text = self.get_text_ensemble(input_ids, attention_mask, cache_name)

        v = visual / jnp.linalg.norm(visual, axis=-1, keepdims=True)
        t = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
        sims = jnp.dot(v, t)
        sims = jnp.where(jnp.asarray(valid), sims, -jnp.inf)
        if self.num_masks == 1:
            idx = [int(jnp.argmax(sims))]
        else:
            idx = list(np.asarray(
                jax.lax.top_k(sims, self.num_masks)[1]))
        return masks[idx][:, None].astype(np.float32)

    def _cache_path(self, cache_name: Optional[str],
                    postfix: str) -> Optional[Path]:
        if self.cache_dir is None or cache_name is None:
            return None
        return self.cache_dir / f"{Path(cache_name).stem}_{postfix}.npz"
