"""CRIS referring-segmentation model with CoOp/CoCoOp prompt support (Flax).

Re-implements the reference CRIS (src/models/components/cris_model/
__init__.py:20-132) and COOPCRIS (src/models/core_models/coop/
coop_cris.py:21-242):

  * OpenAI CLIP RN50 backbone: ModifiedResNet pyramid + causal text
    transformer with key-padding masks threaded into every block;
  * text prompt surgery: splice at the embedding, then per-block overwrite
    while 0-BASED block index < prompt_depth — note this differs from the
    CLIPSeg wrappers' 1-based loop, so depth=1 re-injects ctx[0] after block
    0 (coop_cris.py:128-143, quirk preserved);
  * EOS pooling at argmax(input_ids) + num_context clamped to max_length-1;
  * pad mask = ~attention_mask (or ids == 0) extended with ZEROS for the
    context slots (update_pad_mask_for_context), used for both text
    self-attention and decoder cross-attention;
  * FPN fusion -> cross-attention decoder -> dynamic-conv projector ->
    bicubic (align_corners=True!) upsample to img_size;
  * `use_new_last_layer` additive head over the decoder output:
    Conv1x1(512->64, no bias) + bilinear resize to img_size + Conv k5
    replicate, blended by residual_ratio (coop_cris.py:72-88, 237-242).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tunevlseg_tpu.models.cris.layers import (CRISTransformerDecoder, FPN,
                                              Projector)
from tunevlseg_tpu.models.cris.resnet import ModifiedResNet
from tunevlseg_tpu.models.clip.text import extend_text_mask, splice_text_context
from tunevlseg_tpu.nn import remat
from tunevlseg_tpu.models.prompt.learners import BasePromptLearner, PromptStacks
from tunevlseg_tpu.nn.attention import causal_bias, padding_bias
from tunevlseg_tpu.nn.conv import Conv2d
from tunevlseg_tpu.nn.layers import PreNormEncoderLayer
from tunevlseg_tpu.ops.image import resize_2d

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CRISConfig:
    # vision (RN50)
    vision_layers: Sequence[int] = (3, 4, 6, 3)
    vision_width: int = 64
    vision_heads: int = 32
    image_resolution: int = 224
    embed_dim: int = 1024              # CLIP joint dim == word_dim
    # text
    vocab_size: int = 49408
    context_length: int = 77
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # head
    fpn_in: Sequence[int] = (512, 1024, 1024)
    fpn_out: Sequence[int] = (256, 512, 1024)
    vis_dim: int = 512
    num_layers: int = 3
    num_head: int = 8
    dim_ffn: int = 2048
    dropout: float = 0.2
    img_size: int = 416

    @staticmethod
    def tiny(**kw) -> "CRISConfig":
        # transformer_width == embed_dim so a random-init context learner is
        # usable (the reference requires a text initializer otherwise: the
        # learner's context_dim is wired to word_dim, coop_cris.py:45);
        # vision_heads follows the vendored formula width*32//64 = 8.
        base = dict(
            vision_layers=(1, 1, 1, 1), vision_width=16, vision_heads=8,
            # real vocab: tiny models consume real BPE ids via the CLI debug
            # hook; truncated vocabs NaN-fill out-of-range gathers
            image_resolution=64, embed_dim=24, vocab_size=49408,
            context_length=77, transformer_width=24, transformer_heads=2,
            transformer_layers=3,
            fpn_in=(128, 256, 24), fpn_out=(16, 24, 32),
            vis_dim=24, num_layers=2, num_head=2, dim_ffn=16,
            dropout=0.0, img_size=64)
        base.update(kw)
        return CRISConfig(**base)


class CLIPTextTransformer(nn.Module):
    """OpenAI-layout CLIP text encoder with CRIS's prompt hooks."""

    config: CRISConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None,   # (B, L') True=pad
                 text_ctx: Optional[jnp.ndarray] = None,
                 prompt_depth: int = 0,
                 max_length: Optional[int] = None):
        """Returns (tokens (B,L',W), pooled_state (B, embed_dim))."""
        c = self.config
        emb = nn.Embed(c.vocab_size, c.transformer_width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        num_ctx = 0
        if text_ctx is not None:
            num_ctx = text_ctx.shape[-2]
            emb = splice_text_context(emb, text_ctx[0],
                                      max_length or c.context_length)
        seq = emb.shape[1]
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (c.context_length, c.transformer_width))
        x = emb + jnp.asarray(pos[:seq], emb.dtype)

        bias = causal_bias(seq, jnp.float32)
        if pad_mask is not None:
            bias = bias + padding_bias(1 - pad_mask.astype(jnp.int32),
                                       jnp.float32)

        for i in range(c.transformer_layers):
            x = remat.layer_call(PreNormEncoderLayer(
                c.transformer_heads, c.transformer_width * 4, "quick_gelu",
                1e-5, dtype=self.dtype, name=f"resblocks_{i}"), x, bias)
            # CRIS quirk: 0-based overwrite AFTER block i (coop_cris.py:128-143)
            if text_ctx is not None and i < prompt_depth:
                ctx_i = text_ctx[i]
                if ctx_i.ndim == 2:
                    ctx_i = jnp.broadcast_to(ctx_i[None],
                                             (x.shape[0], *ctx_i.shape))
                x = x.at[:, 1:1 + num_ctx].set(ctx_i.astype(x.dtype))

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)

        text_projection = self.param(
            "text_projection", nn.initializers.normal(c.transformer_width ** -0.5),
            (c.transformer_width, c.embed_dim))
        pool_idx = jnp.argmax(input_ids.astype(jnp.int32), axis=-1)
        if num_ctx:
            pool_idx = jnp.minimum(pool_idx + num_ctx,
                                   (max_length or c.context_length) - 1)
        pooled = jnp.take_along_axis(x, pool_idx[:, None, None], axis=1)[:, 0]
        state = pooled @ jnp.asarray(text_projection, pooled.dtype)
        return x, state


class CRISForSegmentation(nn.Module):
    config: CRISConfig
    learner: Optional[BasePromptLearner] = None
    additive_mode: str = "none"        # "none" | "residual"
    additive_kernel_size: int = 5
    residual_ratio_init: float = 0.5
    bn_train: bool = False             # train-mode BN for e2e fine-tuning
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        ura = not self.bn_train
        # Channels-last backbone option (TUNEVLSEG_CRIS_NHWC=1): 1x1s as
        # einsums + NHWC 3x3s, which measured -16..-44% per-op in isolation
        # (scripts/micro_conv_nhwc.py) — but the interleaved e2e A/B
        # (scripts/ab_env.py, docs/ROOFLINE.md "CRIS e2e layout A/B") showed
        # 0.99x: XLA's whole-graph layout assignment already cancels the
        # per-op layout cost the micro-bench measured. NCHW stays the
        # default; the NHWC formulation is kept equivalence-tested for
        # future hardware/compiler generations.
        layout = ("nhwc" if os.environ.get("TUNEVLSEG_CRIS_NHWC", "0") == "1"
                  else "nchw")
        # Flat-space Pallas conv backbone (TUNEVLSEG_PALLAS_CONV): "1" runs
        # every stage through ops/conv_pallas.py; a comma list like
        # "stem,1,2" restricts it to those stages. Read here (setup == trace
        # time) so ab_env.py A/Bs are valid (CLAUDE.md r4 gotcha);
        # flat_conv_mode downgrades to "0" on multi-device TPU meshes.
        from tunevlseg_tpu.ops.conv_pallas import flat_conv_mode
        pconv = flat_conv_mode()
        flat_stages: tuple = ("stem", "1", "2", "3", "4")
        if pconv not in ("0", ""):
            layout = "flat"
            if pconv not in ("1", "auto"):
                flat_stages = tuple(s.strip() for s in pconv.split(","))
        self.backbone_visual = ModifiedResNet(
            tuple(c.vision_layers), c.embed_dim, c.vision_heads,
            c.image_resolution, c.vision_width, use_running_average=True,
            layout=layout, flat_stages=flat_stages, dtype=self.dtype,
            name="visual")
        self.backbone_text = CLIPTextTransformer(c, dtype=self.dtype,
                                                 name="text")
        self.neck = FPN(tuple(c.fpn_in), tuple(c.fpn_out),
                        use_running_average=ura, dtype=self.dtype, name="neck")
        self.decoder = CRISTransformerDecoder(
            c.num_layers, c.vis_dim, c.num_head, c.dim_ffn, c.dropout,
            dtype=self.dtype, name="decoder")
        self.proj = Projector(c.embed_dim, c.vis_dim // 2, 3,
                              use_running_average=ura, dtype=self.dtype,
                              name="proj")
        if self.additive_mode == "residual":
            # Fused replicate pad (r5): the 104->416 bilinear resize between
            # the two convs emits the replicate-padded map inside its own
            # matmuls (ops/image.resize_2d out_pad — bitwise identical), so
            # conv2 runs VALID. The explicit pad+conv measured ~2x the
            # zero-pad conv at such 1-output-channel shapes
            # (PERF_r05/micro_upsampler_variants.log). Trace-time env read.
            self._additive_fused = (
                self.additive_kernel_size % 2 == 1 and os.environ.get(
                    "TUNEVLSEG_ADDITIVE_FUSED_PAD", "1") == "1")
            self.additive_conv1 = Conv2d(c.vis_dim, 64, 1, use_bias=False,
                                         dtype=self.dtype,
                                         name="additive_conv1")
            self.additive_conv2 = Conv2d(
                64, 1, self.additive_kernel_size,
                padding=0 if self._additive_fused else "same",
                pad_mode="zeros" if self._additive_fused else "replicate",
                dtype=self.dtype, name="additive_conv2")
            self.residual_ratio = self.param(
                "residual_ratio",
                lambda key: jnp.asarray(self.residual_ratio_init, jnp.float32))

    def __call__(self, input_ids: jnp.ndarray, pixel_values: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 text_index: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """`text_index` (B,) enables prompt dedup: `input_ids` carries only
        the U unique prompt rows, the text tower runs U times, and tokens/
        state/pad_mask are gathered back to B rows before the decoder (see
        CLIPSegForSegmentation.__call__ for the rationale; incompatible
        with CoCoOp's image-conditioned text stack)."""
        c = self.config
        learner = self.learner
        num_ctx = learner.num_context if learner is not None else 0
        prompt_depth = learner.prompt_depth if learner is not None else 0
        if text_index is not None and learner is not None and \
                type(learner).needs_image_features:
            raise ValueError(
                "text_index (prompt dedup) is incompatible with image-"
                "conditioned prompt learners (CoCoOp)")

        # pad mask (True = pad), extended with zeros for context slots
        if attention_mask is not None:
            pad = 1 - attention_mask.astype(jnp.int32)
        else:
            pad = (input_ids == 0).astype(jnp.int32)
        if num_ctx:
            pad = extend_text_mask(pad, num_ctx, c.context_length, 0)
        pad_mask = pad.astype(bool)

        # vision first (CoCoOp consumes pooled C5 features)
        vis = self.backbone_visual(pixel_values)

        text_ctx = None
        if learner is not None:
            image_features = None
            if type(learner).needs_image_features:
                image_features = jnp.mean(vis[-1], axis=(2, 3))
            text_ctx = learner(image_features=image_features,
                               deterministic=deterministic).text

        tokens, state = self.backbone_text(
            input_ids, pad_mask=pad_mask, text_ctx=text_ctx,
            prompt_depth=prompt_depth, max_length=c.context_length)
        if text_index is not None:
            tokens = jnp.take(tokens, text_index, axis=0)
            state = jnp.take(state, text_index, axis=0)
            pad_mask = jnp.take(pad_mask, text_index, axis=0)

        # bn_train models use batch stats while TRAINING but running stats in
        # eval (torch train()/eval() semantics); frozen-backbone runs always
        # use running stats
        bn_ura = (not self.bn_train) or deterministic
        fq = self.neck(vis, state, use_running_average=bn_ura)
        fq = self.decoder(fq, tokens, pad_mask, deterministic=deterministic)
        pred = self.proj(fq, state, use_running_average=bn_ura)
        logits = resize_2d(pred, (c.img_size, c.img_size), "bicubic",
                           align_corners=True)

        if self.additive_mode == "residual":
            head = self.additive_conv1(fq)
            head = resize_2d(head, (c.img_size, c.img_size), "bilinear",
                             out_pad=((self.additive_kernel_size - 1) // 2
                                      if self._additive_fused else 0))
            head = self.additive_conv2(head)
            r = self.residual_ratio.astype(logits.dtype)
            logits = (1 - r) * logits + r * head
        return logits
