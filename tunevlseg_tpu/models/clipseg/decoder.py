"""CLIPSeg FiLM decoder (Flax).

Re-implements HF `CLIPSegDecoder` plus the reference's customizations
(src/models/core_models/coop/base_clipseg.py:82-172, vpt_clipseg.py:237-319):

  * reversed extract-layer activations, per-stage `reduces` Linear into
    reduce_dim, accumulated;
  * FiLM conditioning at `conditional_layer`:
    output = film_mul(cond) * output + film_add(cond) broadcast over tokens;
  * post-norm relu transformer blocks;
  * CLS token (and, for visual-prompt learners, the trailing context tokens)
    stripped before the transposed-convolution head;
  * optional `use_new_last_layer` additive head: Upsample(patch, bilinear) +
    Conv2d(k=5, same, replicate), blended either residually
    ((1-r)*logits + r*head, base_clipseg.py:152-155) or additively
    (logits + head, vpt_clipseg.py:301-302).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.nn.conv import Conv2d, ConvTranspose2d
from tunevlseg_tpu.nn.layers import PostNormEncoderLayer
from tunevlseg_tpu.ops.image import resize_2d

Dtype = Any


class CLIPSegDecoder(nn.Module):
    config: CLIPSegConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        n = len(c.extract_layers)
        self.reduces = [nn.Dense(c.reduce_dim, dtype=self.dtype,
                                 name=f"reduces_{i}") for i in range(n)]
        self.film_mul = nn.Dense(c.reduce_dim, dtype=self.dtype, name="film_mul")
        self.film_add = nn.Dense(c.reduce_dim, dtype=self.dtype, name="film_add")
        self.blocks = [
            PostNormEncoderLayer(c.decoder_num_heads, c.decoder_intermediate_size,
                                 act="relu", dtype=self.dtype, name=f"layers_{i}")
            for i in range(n)
        ]
        if c.complex_transposed_convolution:
            k = c.vision.patch_size // 4
            self.head_conv = Conv2d(c.reduce_dim, c.reduce_dim, 3, padding=1,
                                    dtype=self.dtype, name="head_conv")
            self.head_up1 = ConvTranspose2d(c.reduce_dim, c.reduce_dim // 2, k,
                                            dtype=self.dtype, name="head_up1")
            self.head_up2 = ConvTranspose2d(c.reduce_dim // 2, 1, k,
                                            dtype=self.dtype, name="head_up2")
        else:
            self.head_up = ConvTranspose2d(c.reduce_dim, 1, c.vision.patch_size,
                                           dtype=self.dtype, name="head_up")

    def transposed_convolution(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.config.complex_transposed_convolution:
            x = nn.relu(self.head_conv(x))
            x = nn.relu(self.head_up1(x))
            return self.head_up2(x)
        return self.head_up(x)

    def __call__(
        self,
        activations: Sequence[jnp.ndarray],   # extract-layer order (low->high)
        conditional_embeddings: jnp.ndarray,  # (B, projection_dim)
        num_visual_ctx: int = 0,              # trailing prompt tokens to strip
    ):
        """Returns (logits (B, s*patch, s*patch), pre_head_feature (B,C,s,s))."""
        c = self.config
        rev = activations[::-1]
        output = None
        for i, act in enumerate(rev):
            red = self.reduces[i](act)
            output = red if output is None else red + output
            if i == c.conditional_layer:
                cond = conditional_embeddings.astype(output.dtype)
                output = (self.film_mul(cond)[:, None, :] * output
                          + self.film_add(cond)[:, None, :])
            output = self.blocks[i](output)

        # strip CLS and trailing visual prompt tokens -> (B, C, hw)
        end = output.shape[1] - num_visual_ctx
        output = output[:, 1:end, :].transpose(0, 2, 1)
        b, ch, hw = output.shape
        size = int(round(hw ** 0.5))
        feat = output.reshape(b, ch, size, size)
        logits = self.transposed_convolution(feat)[:, 0]
        return logits, feat


class AdditiveHead(nn.Module):
    """`use_new_last_layer` head: Upsample(patch, bilinear) + Conv2d(k, same,
    replicate) over the pre-head decoder feature (base_clipseg.py:58-72)."""

    config: CLIPSegConfig
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:  # (B, C, s, s)
        # Fused replicate pad (trans_seg r5 lever, ops/image._pad_matrix):
        # the upsample matmul emits the replicate-padded map for free
        # (bitwise identical) and the conv runs VALID — the explicit
        # pad+conv measured ~2x the zero-pad conv at such shapes
        # (PERF_r05/micro_upsampler_variants.log). Trace-time env read.
        import os
        fused = (self.kernel_size % 2 == 1 and os.environ.get(
            "TUNEVLSEG_ADDITIVE_FUSED_PAD", "1") == "1")
        p = (self.kernel_size - 1) // 2 if fused else 0
        scale = self.config.vision.patch_size
        h, w = feat.shape[-2], feat.shape[-1]
        x = resize_2d(feat, (h * scale, w * scale), "bilinear", out_pad=p)
        x = Conv2d(self.config.reduce_dim, 1, self.kernel_size,
                   padding=0 if fused else "same",
                   pad_mode="zeros" if fused else "replicate",
                   dtype=self.dtype, name="conv")(x)
        return x[:, 0]
