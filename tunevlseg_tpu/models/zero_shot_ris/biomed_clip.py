"""BiomedCLIP (open_clip CustomTextCLIP) dual encoder for zero-shot RIS.

TPU-native re-implementation of the reference's CustomOpenCLIP wrapper
(src/models/core_models/zero_shot_ris/custom_openclip.py:14-119), which wraps
`open_clip.create_model("hf-hub:microsoft/BiomedCLIP-...")`:

  * vision: a timm `vit_base_patch16_224` trunk (pre-LN blocks, GELU,
    LN eps 1e-6, cls token + learned pos-emb added AFTER the cls concat,
    final LN then token pooling) + open_clip's linear projection head
    (`visual.head.proj`, no bias);
  * text: a BERT-base encoder (post-LN blocks, GELU, LN eps 1e-12, learned
    position + token-type embeddings) with open_clip's
    `cls_last_hidden_state_pooler` (raw last_hidden_state[:, 0] — NOT the
    BERT tanh pooler) + 2-layer MLP projection (`text.proj.{0,2}`, no bias,
    hidden (d+proj)//2) — open_clip HFTextEncoder semantics;
  * the masked-feature path multiplies patch tokens by each proposal mask
    before EVERY block from `masking_block_idx` on, proposals becoming the
    batch (custom_openclip.py:38-68 `get_blocks_output`), with the cls token
    broadcast unmasked — identical control flow to `MaskedCLIP`, applied to
    the timm trunk layout (no pre-LN, final LN before pooling).

Exposes the same `get_text_features` / `get_image_features` surface as
`MaskedCLIP`, so `ZeroShotRIS` composes with either variant unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.nn.attention import padding_bias
from tunevlseg_tpu.nn.layers import (ACT2FN, PostNormEncoderLayer,
                                     PreNormEncoderLayer)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TimmViTConfig:
    """timm vit_base_patch16_224 trunk geometry."""

    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 224
    num_channels: int = 3
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class BertTextConfig:
    """BERT-base (PubMedBERT/BiomedBERT) encoder geometry."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


@dataclasses.dataclass(frozen=True)
class BiomedCLIPConfig:
    vision: TimmViTConfig = TimmViTConfig()
    text: BertTextConfig = BertTextConfig()
    projection_dim: int = 512

    @property
    def text_proj_hidden(self) -> int:
        # open_clip HFTextEncoder mlp proj hidden width
        return (self.text.hidden_size + self.projection_dim) // 2

    @staticmethod
    def tiny() -> "BiomedCLIPConfig":
        return BiomedCLIPConfig(
            vision=TimmViTConfig(hidden_size=24, num_layers=3, num_heads=2,
                                 intermediate_size=48, patch_size=8,
                                 image_size=32),
            text=BertTextConfig(vocab_size=120, hidden_size=16, num_layers=2,
                                num_heads=2, intermediate_size=32,
                                max_position_embeddings=64),
            projection_dim=20)


class TimmViTTower(nn.Module):
    """timm VisionTransformer trunk: patch conv (as space-to-depth matmul),
    cls token, pos-emb over [cls; patches], pre-LN blocks, final LN."""

    config: TimmViTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.cls_token = self.param("cls_token", nn.initializers.zeros,
                                    (c.hidden_size,))
        num_positions = (c.image_size // c.patch_size) ** 2 + 1
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (num_positions, c.hidden_size))
        self.patch_proj = self.param(
            "patch_proj", nn.initializers.lecun_normal(),
            (c.patch_size * c.patch_size * c.num_channels, c.hidden_size))
        self.patch_bias = self.param("patch_bias", nn.initializers.zeros,
                                     (c.hidden_size,))
        self.blocks = [
            PreNormEncoderLayer(c.num_heads, c.intermediate_size, "gelu",
                                c.layer_norm_eps, dtype=self.dtype,
                                name=f"blocks_{i}")
            for i in range(c.num_layers)
        ]
        self.norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                 name="norm")

    def embed_patches(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, C, H, W) -> (B, 1 + hw, D); timm `_pos_embed` adds the learned
        positions AFTER concatenating the cls token (no_embed_class=False)."""
        c = self.config
        b, ch, h, w = pixel_values.shape
        p = c.patch_size
        gh, gw = h // p, w // p
        x = pixel_values.reshape(b, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, ch * p * p)
        patches = jnp.dot(
            x.astype(self.dtype), jnp.asarray(self.patch_proj, self.dtype),
            preferred_element_type=jnp.float32).astype(self.dtype)
        patches = patches + jnp.asarray(self.patch_bias, self.dtype)
        cls = jnp.broadcast_to(
            jnp.asarray(self.cls_token, self.dtype)[None, None],
            (b, 1, c.hidden_size))
        embeds = jnp.concatenate([cls, patches], axis=1)
        pos = jnp.asarray(self.position_embedding, jnp.float32)
        grid = c.image_size // p
        if (gh, gw) != (grid, grid):
            # timm resample_abs_pos_embed: bicubic-resize the patch grid,
            # keep the cls position as is
            from tunevlseg_tpu.ops.image import resize_2d
            cls_pos, patch_pos = pos[:1], pos[1:]
            patch_pos = patch_pos.reshape(grid, grid, -1).transpose(2, 0, 1)
            patch_pos = resize_2d(patch_pos, (gh, gw), "bicubic")
            patch_pos = patch_pos.transpose(1, 2, 0).reshape(gh * gw, -1)
            pos = jnp.concatenate([cls_pos, patch_pos], axis=0)
        return embeds + pos[None].astype(self.dtype)


class BertTextTower(nn.Module):
    """BERT encoder (embeddings + post-LN blocks); returns the full last
    hidden state — pooling is the caller's choice (open_clip uses [:, 0])."""

    config: BertTextConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.word_embedding = nn.Embed(c.vocab_size, c.hidden_size,
                                       dtype=self.dtype,
                                       name="word_embedding")
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.hidden_size))
        self.token_type_embedding = self.param(
            "token_type_embedding", nn.initializers.normal(0.02),
            (c.type_vocab_size, c.hidden_size))
        self.embed_norm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                       dtype=self.dtype, name="embed_norm")
        self.layers = [
            PostNormEncoderLayer(c.num_heads, c.intermediate_size, "gelu",
                                 c.layer_norm_eps, dtype=self.dtype,
                                 name=f"layers_{i}")
            for i in range(c.num_layers)
        ]

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.config
        seq = input_ids.shape[1]
        x = self.word_embedding(input_ids)
        x = x + jnp.asarray(self.position_embedding, self.dtype)[None, :seq]
        x = x + jnp.asarray(self.token_type_embedding, self.dtype)[0]
        x = self.embed_norm(x)
        bias = (None if attention_mask is None
                else padding_bias(attention_mask, jnp.float32))
        for layer in self.layers:
            x = layer(x, bias)
        return x


class BiomedCLIP(nn.Module):
    """open_clip CustomTextCLIP layout with the masked-vision path; same
    call surface as `MaskedCLIP` (models/zero_shot_ris/model.py:44)."""

    config: BiomedCLIPConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.visual = TimmViTTower(c.vision, dtype=self.dtype, name="visual")
        # open_clip TimmModel head: Dropout + Linear(768 -> proj, bias=False)
        self.visual_head = nn.Dense(c.projection_dim, use_bias=False,
                                    dtype=self.dtype, name="visual_head")
        self.text_model = BertTextTower(c.text, dtype=self.dtype,
                                        name="text_model")
        # open_clip HFTextEncoder proj='mlp': Linear -> GELU -> Linear, no bias
        self.text_proj_fc1 = nn.Dense(c.text_proj_hidden, use_bias=False,
                                      dtype=self.dtype, name="text_proj_fc1")
        self.text_proj_fc2 = nn.Dense(c.projection_dim, use_bias=False,
                                      dtype=self.dtype, name="text_proj_fc2")

    def get_text_features(self, input_ids, attention_mask=None):
        if attention_mask is None:
            # HFTextEncoder.forward derives the mask from the pad id
            attention_mask = (input_ids !=
                              self.config.text.pad_token_id).astype(jnp.int32)
        hidden = self.text_model(input_ids, attention_mask)
        pooled = hidden[:, 0]
        return self.text_proj_fc2(ACT2FN["gelu"](self.text_proj_fc1(pooled)))

    def get_image_features(self, pixel_values, pred_masks=None,
                           masking_block_idx=None):
        """pred_masks: (P, g, g) {0,1} masks at the patch grid; proposals
        become the batch from `masking_block_idx` on
        (custom_openclip.py:38-68)."""
        vt = self.visual
        x = vt.embed_patches(pixel_values)
        blocks = vt.blocks
        if pred_masks is None:
            for block in blocks:
                x = block(x)
        else:
            n_blocks = len(blocks)
            split = (masking_block_idx % n_blocks
                     if masking_block_idx is not None else n_blocks)
            for block in blocks[:split]:
                x = block(x)
            p = pred_masks.shape[0]
            g = pred_masks.shape[-1]
            mask_flat = pred_masks.reshape(p, g * g, 1).astype(x.dtype)
            for block in blocks[split:]:
                cls = jnp.broadcast_to(x[:, :1], (p, 1, x.shape[-1]))
                patches = x[:, 1:] * mask_flat if x.shape[0] == p else \
                    jnp.broadcast_to(x[:, 1:], (p, g * g, x.shape[-1])) \
                    * mask_flat
                x = jnp.concatenate([cls, patches], axis=1)
                x = block(x)
        # timm: trunk.norm over the sequence, then token ('token' pool) —
        # cls — selection, then the open_clip projection head
        pooled = vt.norm(x)[:, 0]
        return self.visual_head(pooled)
