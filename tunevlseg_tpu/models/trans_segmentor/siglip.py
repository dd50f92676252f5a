"""SigLIP towers (Flax) — the alternative encoder family of the
TransformerSegmentor (reference encoder.py:161-268 handles
`SiglipModel` via AutoModel).

Differences from CLIP mirrored from HF `modeling_siglip`:
  * vision: patch conv WITH bias, no CLS token, learned position embeddings
    over the patch grid, post_layernorm applied to the FULL last hidden
    state; optional attention-pooling head with a learned probe
    (SiglipMultiheadAttentionPoolingHead);
  * text: NO causal mask (padding mask only), final_layer_norm, pooled
    output = last token through a `head` Linear;
  * activation gelu_pytorch_tanh.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.models.clip.config import CLIPTextConfig, CLIPVisionConfig
from tunevlseg_tpu.nn.attention import padding_bias
from tunevlseg_tpu.nn.layers import MultiHeadAttention, PreNormEncoderLayer
from tunevlseg_tpu.ops.image import resize_2d

Dtype = Any


class SiglipVisionTower(nn.Module):
    config: CLIPVisionConfig
    use_head: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        num_positions = (c.image_size // c.patch_size) ** 2
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (num_positions, c.hidden_size))
        self.patch_proj = self.param(
            "patch_proj", nn.initializers.lecun_normal(),
            (c.patch_size * c.patch_size * c.num_channels, c.hidden_size))
        self.patch_bias = self.param(
            "patch_bias", nn.initializers.zeros, (c.hidden_size,))
        self.layers = [
            PreNormEncoderLayer(c.num_heads, c.intermediate_size,
                                "gelu_pytorch_tanh", c.layer_norm_eps,
                                dtype=self.dtype, name=f"layers_{i}")
            for i in range(c.num_layers)
        ]
        self.post_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           dtype=self.dtype,
                                           name="post_layernorm")
        if self.use_head:
            self.probe = self.param("probe", nn.initializers.normal(0.02),
                                    (1, 1, c.hidden_size))
            self.head_attn = MultiHeadAttention(c.num_heads, dtype=self.dtype,
                                                name="head_attn")
            self.head_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                               dtype=self.dtype,
                                               name="head_layernorm")
            self.head_mlp_fc1 = nn.Dense(c.intermediate_size, dtype=self.dtype,
                                         name="head_mlp_fc1")
            self.head_mlp_fc2 = nn.Dense(c.hidden_size, dtype=self.dtype,
                                         name="head_mlp_fc2")

    def __call__(self, pixel_values: jnp.ndarray, visual_ctx=None,
                 prompt_depth: int = 0, extract_layers=None,
                 early_exit: bool = False):
        c = self.config
        b, ch, h, w = pixel_values.shape
        p = c.patch_size
        gh, gw = h // p, w // p
        x = pixel_values.reshape(b, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, ch * p * p)
        x = (jnp.dot(x.astype(self.dtype),
                     jnp.asarray(self.patch_proj, self.dtype))
             + jnp.asarray(self.patch_bias, self.dtype))

        pos = jnp.asarray(self.position_embedding, jnp.float32)
        grid = c.image_size // p
        if (gh, gw) != (grid, grid):
            pos = pos.reshape(grid, grid, -1).transpose(2, 0, 1)
            pos = resize_2d(pos, (gh, gw), "bilinear")
            pos = pos.transpose(1, 2, 0).reshape(gh * gw, -1)
        x = x + pos[None].astype(x.dtype)

        hidden_states = [x]
        for layer in self.layers:
            x = layer(x)
            hidden_states.append(x)
        x = self.post_layernorm(x)

        pooled = None
        if self.use_head:
            probe = jnp.broadcast_to(jnp.asarray(self.probe, x.dtype),
                                     (b, 1, c.hidden_size))
            attn = self.head_attn(probe, kv_states=x)
            pooled = attn + self.head_mlp_fc2(
                nn.gelu(self.head_mlp_fc1(self.head_layernorm(attn)),
                        approximate=True))
            pooled = pooled[:, 0]
        return hidden_states, x, pooled


class SiglipTextTower(nn.Module):
    config: CLIPTextConfig
    projection_size: Optional[int] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.token_embedding = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=self.dtype,
                                        name="token_embedding")
        self.position_embedding = nn.Embed(c.max_position_embeddings,
                                           c.hidden_size, dtype=self.dtype,
                                           name="position_embedding")
        self.layers = [
            PreNormEncoderLayer(c.num_heads, c.intermediate_size,
                                "gelu_pytorch_tanh", c.layer_norm_eps,
                                dtype=self.dtype, name=f"layers_{i}")
            for i in range(c.num_layers)
        ]
        self.final_layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                             dtype=self.dtype,
                                             name="final_layer_norm")
        self.head = nn.Dense(self.projection_size or c.hidden_size,
                             dtype=self.dtype, name="head")

    def __call__(self, input_ids, attention_mask=None, text_ctx=None,
                 prompt_depth: int = 0):
        x = self.token_embedding(input_ids)
        x = x + self.position_embedding(jnp.arange(x.shape[1])[None])
        bias = None
        if attention_mask is not None:
            bias = padding_bias(attention_mask, jnp.float32)
        for layer in self.layers:
            x = layer(x, bias)
        x = self.final_layer_norm(x)
        pooled = self.head(x[:, -1])
        return x, pooled
