"""CLIPSeg segmentation model with pluggable prompt learners (Flax).

One module covers the reference's whole CLIPSeg wrapper zoo:
  * `learner=None`                      -> HFCLIPSegWrapper end-to-end model
                                           (src/models/components/hf_clipseg_wrapper.py)
  * CoOp/CoCoOp learner (text ctx)      -> COOPCLIPSeg (coop/coop_clipseg.py)
  * VPT learner (visual ctx)            -> VPTCLIPSeg (coop/vpt_clipseg.py)
  * MaPLe/Shared learners (both)        -> BaseMultimodalCLIPSeg
                                           (coop/base_multimodal_clipseg.py)

Faithfully mirrored quirks (documented for parity):
  * text-only prompting uses the STOCK decoder path — the additive
    `use_new_last_layer` head is instantiated but never applied
    (coop_clipseg.py:462 calls `_self.decoder`, not `decoder_forward`), so
    `additive_mode="unused"` for CoOp/CoCoOp;
  * VPT applies the additive head WITHOUT the residual ratio
    (vpt_clipseg.py:301-302) -> `additive_mode="plain"`;
  * multimodal wrappers blend `(1-r)*logits + r*head`
    (base_clipseg.py:152-155) -> `additive_mode="residual"`;
  * the vision tower runs BEFORE the text tower (pooled image features feed
    CoCoOp's meta-net; base_multimodal_clipseg.py:577-585).

Execution order per step (all functional, single jit):
  visual stack -> vision tower -> pooled projection -> text stack(image
  features) -> text tower -> text projection -> decoder (+ additive head).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.models.clip.text import CLIPTextTower
from tunevlseg_tpu.models.clip.vision import CLIPVisionTower
from tunevlseg_tpu.models.clipseg.decoder import AdditiveHead, CLIPSegDecoder
from tunevlseg_tpu.models.prompt.learners import BasePromptLearner, PromptStacks

Dtype = Any

ADDITIVE_MODES = ("none", "unused", "plain", "residual")


class CLIPSegForSegmentation(nn.Module):
    config: CLIPSegConfig
    learner: Optional[BasePromptLearner] = None
    additive_mode: str = "none"          # see module docstring
    additive_kernel_size: int = 5
    residual_ratio_init: float = 0.5
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        if self.additive_mode not in ADDITIVE_MODES:
            raise ValueError(f"additive_mode must be one of {ADDITIVE_MODES}")
        self.text_model = CLIPTextTower(c.text, dtype=self.dtype,
                                        name="text_model")
        self.vision_model = CLIPVisionTower(c.vision, dtype=self.dtype,
                                            name="vision_model")
        self.text_projection = nn.Dense(c.projection_dim, use_bias=False,
                                        dtype=self.dtype, name="text_projection")
        self.visual_projection = nn.Dense(c.projection_dim, use_bias=False,
                                          dtype=self.dtype,
                                          name="visual_projection")
        self.decoder = CLIPSegDecoder(c, dtype=self.dtype, name="decoder")
        if self.additive_mode != "none":
            self.additive_head = AdditiveHead(c, self.additive_kernel_size,
                                              dtype=self.dtype,
                                              name="additive_head")
            self.residual_ratio = self.param(
                "residual_ratio",
                lambda key: jnp.asarray(self.residual_ratio_init, jnp.float32))

    def __call__(
        self,
        input_ids: jnp.ndarray,          # (B, L) — or (U, L) with text_index
        pixel_values: jnp.ndarray,       # (B, C, H, W)
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        text_index: Optional[jnp.ndarray] = None,   # (B,) int32 -> rows of U
    ) -> jnp.ndarray:
        """Returns logits (B, 1, H, W) — the universal net interface of the
        reference (`net(text_input, image_input)`,
        src/models/image_text_mask_module.py:257-265).

        `text_index` enables prompt deduplication: the reference's canonical
        single-class recipes feed the SAME prompt to every batch row
        (ImageTextMaskDataset prompt selection with a fixed prompt_index,
        src/data/core_datasets/image_text_mask_dataset.py:101-128), yet its
        text tower runs batch_size times. Here the collator may pass
        `input_ids` with only the U unique rows plus an inverse map
        `text_index`; the text tower runs U times and `cond` is gathered
        back to B rows (the gather's transpose is a segment-sum, so grads
        match the dense run exactly up to reduction order). Incompatible
        with image-conditioned prompts (CoCoOp), whose text stack differs
        per image row."""
        c = self.config
        b, _, h, w = pixel_values.shape
        learner = self.learner

        has_text_ctx = learner is not None and type(learner).has_text
        has_visual_ctx = learner is not None and type(learner).has_visual
        need_pooled = (learner is not None
                       and type(learner).needs_image_features)
        prompt_depth = learner.prompt_depth if learner is not None else 0
        if text_index is not None and need_pooled:
            raise ValueError(
                "text_index (prompt dedup) is incompatible with image-"
                "conditioned prompt learners (CoCoOp): the text stack is "
                "per-image, so unique prompt rows cannot be shared")

        # --- context stacks: computed ONCE per step unless image-conditioned
        # (CoCoOp), in which case the text stack waits for pooled features ---
        stacks = PromptStacks()
        if learner is not None and not need_pooled:
            stacks = learner(deterministic=deterministic)
        visual_ctx = stacks.visual

        # --- vision tower (runs first; CoCoOp consumes pooled features,
        # base_multimodal_clipseg.py:577-585) ---
        # Skip the tail layers + pooling whenever pooled features are unused:
        # logits never depend on them (the reference only exploits this for
        # VPT/multimodal, vpt_clipseg.py:129-131 — here it is safe for every
        # non-CoCoOp variant and saves 2/12 vision layers).
        early_exit = not need_pooled
        hidden_states, _, pooled_vis = self.vision_model(
            pixel_values, visual_ctx=visual_ctx, prompt_depth=prompt_depth,
            extract_layers=c.extract_layers, early_exit=early_exit)
        activations = [hidden_states[i + 1] for i in c.extract_layers]

        if need_pooled:
            image_features = self.visual_projection(pooled_vis)
            stacks = learner(image_features=image_features,
                             deterministic=deterministic)

        # --- text tower ---
        text_ctx = stacks.text if has_text_ctx else None
        _, pooled_text = self.text_model(
            input_ids, attention_mask=attention_mask, text_ctx=text_ctx,
            prompt_depth=prompt_depth)
        cond = self.text_projection(pooled_text)
        if text_index is not None:
            cond = jnp.take(cond, text_index, axis=0)

        # --- decoder ---
        num_visual_ctx = visual_ctx.shape[-2] if visual_ctx is not None else 0
        logits, feat = self.decoder(activations, cond,
                                    num_visual_ctx=num_visual_ctx)

        if self.additive_mode == "plain":
            logits = logits + self.additive_head(feat)
        elif self.additive_mode == "residual":
            r = self.residual_ratio.astype(logits.dtype)
            logits = (1 - r) * logits + r * self.additive_head(feat)
        # "unused": head params exist (for checkpoint parity) but are not
        # applied — matches text-only prompting in the reference.
        elif self.additive_mode == "unused":
            pass

        return logits.reshape(b, 1, h, w)


def strategy_additive_mode(strategy: Optional[str], use_new_last_layer: bool) -> str:
    """Map a prompt strategy to the reference's additive-head behavior."""
    if not use_new_last_layer:
        return "none"
    if strategy in (None, "e2e"):
        return "none"
    if strategy in ("coop", "cocoop"):
        return "unused"
    if strategy == "vpt":
        return "plain"
    return "residual"  # maple / shared_separate / shared_attn
