"""Transformer segmentor: dual-encoder (CLIP/SigLIP) + transformer decoder
with image queries over text memory + staged conv upsampler.

Re-implements the reference `TransformerSegmentor`
(src/models/core_models/trans_segmentor/__init__.py:18-153):
  * token-level text/image projections of the encoders' last hidden states
    (encoder.py:270-292); `use_existing_proj` keeps the pretrained projection
    heads, otherwise text gets a fresh Linear to the image width and images
    pass through identity (encoder.py:225-255);
  * optional 1e-4-base sincos positional encoding on both streams
    (__init__.py:127-153);
  * torch `TransformerDecoder` semantics with the repo's
    `PreCrossAttentionTransformerDecoderLayer` (cross-attention BEFORE
    self-attention, src/models/components/pre_cross_attn_decoder.py:39-83),
    memory mask built from the text attention mask (decoder.py:119-137);
  * CLS token stripped when the sequence is not a perfect square
    (decoder.py:94-100);
  * upsampler: `num_upsampler_layers` blocks of [resize-to-size(bilinear),
    Conv2d(k3, same, replicate), norm?, act], channel count decreasing
    linearly, spatial size growing by patch_size^(1/n) with ceiling; the
    last block maps to `num_output_channels` with an optional fixed
    `output_bias` init (decoder.py:139-290).
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tunevlseg_tpu.models.clip.config import CLIPTextConfig, CLIPVisionConfig
from tunevlseg_tpu.models.clip.text import CLIPTextTower
from tunevlseg_tpu.models.clip.vision import CLIPVisionTower
from tunevlseg_tpu.models.cris.layers import sincos_pos_1d
from tunevlseg_tpu.nn import remat
from tunevlseg_tpu.nn.conv import Conv2d
from tunevlseg_tpu.nn.layers import ACT2FN, MultiHeadAttention
from tunevlseg_tpu.ops.image import resize_2d, resize_2d_nhwc

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TransSegmentorConfig:
    text: CLIPTextConfig = CLIPTextConfig()
    vision: CLIPVisionConfig = CLIPVisionConfig()
    projection_dim: int = 512
    encoder_family: str = "clip"          # "clip" | "siglip"
    use_existing_proj: bool = True
    add_pos_enc: bool = False
    # decoder
    decoder_num_layers: int = 4
    decoder_num_heads: int = 8
    decoder_dim_feedforward: int = 2048
    decoder_dropout: float = 0.1
    # NOTE: the reference configures GELU (configs/model/trans_seg.yaml), but
    # torch.nn.TransformerDecoder deepcopies layers through __setstate__,
    # which silently resets module-type activations to F.relu — every cloned
    # layer actually runs ReLU. "relu" is therefore the faithful default.
    decoder_activation: str = "relu"
    decoder_norm_first: bool = True
    cross_attn_first: bool = True
    # upsampler
    num_upsampler_layers: int = 5
    upsampler_act: str = "relu"
    upsampler_norm: Optional[str] = "layer"
    upsampler_group_channels: int = 64
    image_size: Optional[int] = None
    num_output_channels: int = 1
    output_bias: Optional[float] = None

    @property
    def effective_projection_dim(self) -> int:
        """The decoder/upsampler width: the model projection dim with
        existing projections, else the image hidden size
        (encoder.py:239-253)."""
        return (self.projection_dim if self.use_existing_proj
                else self.vision.hidden_size)

    @staticmethod
    def siglip_base(**kw) -> "TransSegmentorConfig":
        """google/siglip-base-patch16-224 tower dimensions (the reference's
        SigLIP alternative encoder, encoder.py:41 via AutoModel): 768-wide
        12-layer towers, sentencepiece vocab 32000, 64 text positions,
        gelu_pytorch_tanh, no CLS / no projections (use_existing_proj
        False — the text `head` plays the projection role)."""
        base = dict(
            text=CLIPTextConfig(vocab_size=32000, hidden_size=768,
                                num_layers=12, num_heads=12,
                                intermediate_size=3072,
                                max_position_embeddings=64,
                                hidden_act="gelu_pytorch_tanh",
                                layer_norm_eps=1e-6),
            vision=CLIPVisionConfig(hidden_size=768, num_layers=12,
                                    num_heads=12, intermediate_size=3072,
                                    patch_size=16, image_size=224,
                                    hidden_act="gelu_pytorch_tanh",
                                    layer_norm_eps=1e-6),
            encoder_family="siglip",
            use_existing_proj=False)
        base.update(kw)
        return TransSegmentorConfig(**base)

    @staticmethod
    def tiny(**kw) -> "TransSegmentorConfig":
        base = dict(
            # real vocab: tiny models consume real BPE ids via the CLI debug
            # hook; truncated vocabs NaN-fill out-of-range gathers
            text=CLIPTextConfig(vocab_size=49408, hidden_size=16, num_layers=2,
                                num_heads=2, intermediate_size=32),
            vision=CLIPVisionConfig(hidden_size=24, num_layers=2, num_heads=2,
                                    intermediate_size=48, patch_size=16,
                                    image_size=32),
            projection_dim=20,
            decoder_num_layers=2, decoder_num_heads=2,
            decoder_dim_feedforward=16, decoder_dropout=0.0,
            num_upsampler_layers=2)
        base.update(kw)
        return TransSegmentorConfig(**base)


class TorchTransformerDecoderLayer(nn.Module):
    """torch.nn.TransformerDecoderLayer semantics (batch_first), with the
    repo's pre-cross-attention ordering variant."""

    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.1
    activation: str = "gelu"
    norm_first: bool = True
    cross_attn_first: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_bias=None, deterministic=True):
        d = tgt.shape[-1]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        drop = lambda h: nn.Dropout(self.dropout_rate,
                                    deterministic=deterministic)(h)

        def sa(x):
            return drop(MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                           name="self_attn")(x))

        def mha(x):
            return drop(MultiHeadAttention(
                self.num_heads, dtype=self.dtype, name="multihead_attn")(
                    x, attn_bias=memory_bias, kv_states=memory))

        def ff(x):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                         name="linear1")(x)
            h = drop(ACT2FN[self.activation](h))
            return drop(nn.Dense(d, dtype=self.dtype, name="linear2")(h))

        x = tgt
        blocks = ([("norm2", mha), ("norm1", sa)] if self.cross_attn_first
                  else [("norm1", sa), ("norm2", mha)])
        if self.norm_first:
            for norm_name, block in blocks:
                x = x + block(ln(norm_name)(x))
            return x + ff(ln("norm3")(x))
        for norm_name, block in blocks:
            x = ln(norm_name)(x + block(x))
        return ln("norm3")(x + ff(x))


class _SampleNormNHWC(nn.Module):
    """torch nn.LayerNorm(normalized_shape=(C, H, W)) applied to an NHWC
    activation, with the affine params KEPT in the layout-independent
    (C, H, W) shape so converters/state dicts match the NCHW formulation."""

    shape: tuple[int, int, int]          # (C, H, W)
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        scale = self.param("scale", nn.initializers.ones, self.shape)
        bias = self.param("bias", nn.initializers.zeros, self.shape)
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, (1, 2, 3), keepdims=True)
        v = jnp.var(x32, (1, 2, 3), keepdims=True)
        y = (x32 - m) * jax.lax.rsqrt(v + self.epsilon)
        y = y * scale.transpose(1, 2, 0) + bias.transpose(1, 2, 0)
        return y.astype(self.dtype)


class Upsampler(nn.Module):
    """`layout="nhwc"` runs the staged conv pyramid channels-last (resize
    einsums + replicate-pad convs), the same treatment that cracked the CRIS
    conv floor (scripts/micro_conv_nhwc.py). Boundary stays NCHW and every
    param keeps its layout-independent shape.

    `layout="flat"` (TUNEVLSEG_PALLAS_CONV) additionally runs every 3x3
    conv through the banded flat-space Pallas kernel (ops/conv_pallas.py):
    the replicate 'same' pad is materialised once per conv (edge-pad to
    (s+2, s+2), zero-ring flat conv, interior crop), the bias rides the
    fused epilogue's offset; resizes and the sample/group norms stay on
    the XLA NHWC path between convs."""

    config: TransSegmentorConfig
    layout: str = "nchw"                 # "nchw" | "nhwc" | "flat"
    dtype: Dtype = jnp.float32

    def _conv3_flat(self, x: jnp.ndarray, conv: Conv2d) -> jnp.ndarray:
        from tunevlseg_tpu.ops.conv_pallas import (conv_flat, flat_begin,
                                                   flat_end, make_flat_spec)
        w, b = conv.materialize_params()
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)),
                     mode="edge")
        spec = make_flat_spec(xp.shape[1], xp.shape[2], 1,
                              max_k2c=9 * x.shape[-1],
                              itemsize=jnp.dtype(self.dtype).itemsize)
        y = flat_end(conv_flat(flat_begin(xp, spec), spec, w, None, b), spec)
        return y[:, 1:-1, 1:-1]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, C, s, s)
        c = self.config
        flat = self.layout == "flat"
        nhwc = self.layout == "nhwc" or flat
        resize = resize_2d_nhwc if nhwc else resize_2d
        if nhwc:
            x = x.transpose(0, 2, 3, 1)
        n = c.num_upsampler_layers
        proj = c.effective_projection_dim
        final = c.image_size or c.vision.image_size
        channel_factor = proj // n
        up_factor = c.vision.patch_size ** (1.0 / n)

        # Fused replicate pad: every conv here is preceded by a resize, and
        # the resize matmul can EMIT the replicate-padded tensor for free
        # (duplicated first/last interpolation rows — ops/image._pad_matrix,
        # bitwise identical), so the conv runs VALID with no explicit pad
        # pass. The explicit jnp.pad+conv measured ~2x the zero-pad conv
        # (8.3 vs 4.9 ms @208, 9.0 vs 3.6 ms @352 —
        # PERF_r05/micro_upsampler_variants.log). Default ON;
        # TUNEVLSEG_UPSAMPLER_FUSED_PAD=0 restores the r4 path (trace-time
        # read — the ab_env A/B gotcha, CLAUDE.md).
        fused_pad = (not flat) and os.environ.get(
            "TUNEVLSEG_UPSAMPLER_FUSED_PAD", "1") == "1"

        in_ch = proj
        size = final // c.vision.patch_size
        for i in range(n - 1):
            out_ch = in_ch - channel_factor
            size = math.ceil(size * up_factor)
            x = resize(x, (size, size), "bilinear",
                       out_pad=1 if fused_pad else 0)
            conv = Conv2d(in_ch, out_ch, 3,
                          padding=0 if fused_pad else "same",
                          pad_mode="zeros" if fused_pad else "replicate",
                          use_bias=c.upsampler_norm is None,
                          layout="nhwc" if nhwc else "nchw",
                          dtype=self.dtype, name=f"block{i}_conv")
            x = self._conv3_flat(x, conv) if flat else conv(x)
            if c.upsampler_norm == "layer":
                if nhwc:
                    x = _SampleNormNHWC((out_ch, size, size), 1e-5,
                                        dtype=self.dtype,
                                        name=f"block{i}_norm")(x)
                else:
                    x = nn.LayerNorm(epsilon=1e-5, reduction_axes=(1, 2, 3),
                                     feature_axes=(1, 2, 3), dtype=self.dtype,
                                     name=f"block{i}_norm")(x)
            elif c.upsampler_norm == "group":
                gn = nn.GroupNorm(
                    num_groups=out_ch // c.upsampler_group_channels,
                    epsilon=1e-5, dtype=self.dtype, name=f"block{i}_norm")
                x = gn(x) if nhwc else gn(x.transpose(0, 2, 3, 1)
                                          ).transpose(0, 3, 1, 2)
            x = ACT2FN[c.upsampler_act](x)
            in_ch = out_ch

        x = resize(x, (final, final), "bilinear",
                   out_pad=1 if fused_pad else 0)
        # final conv; `output_bias` fixes the bias init from mask statistics
        # (configs/experiment/phrasecut.yaml: output_bias -1.748...) but the
        # param stays trainable, like the overridden torch bias
        out_conv = Conv2d(in_ch, c.num_output_channels, 3,
                          padding=0 if fused_pad else "same",
                          pad_mode="zeros" if fused_pad else "replicate",
                          bias_init_value=c.output_bias,
                          layout="nhwc" if nhwc else "nchw",
                          dtype=self.dtype, name="out_conv")
        x = self._conv3_flat(x, out_conv) if flat else out_conv(x)
        return x.transpose(0, 3, 1, 2) if nhwc else x


class TransformerSegmentor(nn.Module):
    config: TransSegmentorConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        if c.encoder_family == "clip":
            self.text_model = CLIPTextTower(c.text, dtype=self.dtype,
                                            name="text_model")
            self.vision_model = CLIPVisionTower(c.vision, dtype=self.dtype,
                                                name="vision_model")
        else:
            from tunevlseg_tpu.models.trans_segmentor.siglip import (
                SiglipTextTower, SiglipVisionTower)
            self.text_model = SiglipTextTower(c.text, dtype=self.dtype,
                                              name="text_model")
            self.vision_model = SiglipVisionTower(c.vision, dtype=self.dtype,
                                                  name="vision_model")

        if c.use_existing_proj:
            self.text_projection = nn.Dense(c.projection_dim, use_bias=False,
                                            dtype=self.dtype,
                                            name="text_projection")
            self.visual_projection = nn.Dense(c.projection_dim, use_bias=False,
                                              dtype=self.dtype,
                                              name="visual_projection")
        elif c.text.hidden_size != c.vision.hidden_size:
            self.text_projection = nn.Dense(c.vision.hidden_size,
                                            dtype=self.dtype,
                                            name="text_projection")
            self.visual_projection = None
        else:
            self.text_projection = None
            self.visual_projection = None

        self.decoder_layers = [
            TorchTransformerDecoderLayer(
                c.decoder_num_heads, c.decoder_dim_feedforward,
                c.decoder_dropout, c.decoder_activation, c.decoder_norm_first,
                c.cross_attn_first, dtype=self.dtype, name=f"decoder_layers_{i}")
            for i in range(c.decoder_num_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                         name="decoder_norm")
        # channels-last upsampler, kept equivalence-tested behind
        # TUNEVLSEG_TRANSSEG_NHWC=1: the r4 interleaved chip A/B measured
        # 1.003x (noise; docs/ROOFLINE.md) so NCHW stays the default,
        # same opt-in polarity as TUNEVLSEG_CRIS_NHWC
        up_layout = ("nhwc"
                     if os.environ.get("TUNEVLSEG_TRANSSEG_NHWC", "0") == "1"
                     else "nchw")
        # Flat-space Pallas convs for the upsampler (TUNEVLSEG_PALLAS_CONV,
        # trace-time read — CLAUDE.md r4 A/B gotcha) supersede the layout
        # choice when enabled
        from tunevlseg_tpu.ops.conv_pallas import flat_conv_mode
        if flat_conv_mode() != "0":
            up_layout = "flat"
        self.upsampler = Upsampler(c, layout=up_layout, dtype=self.dtype,
                                   name="upsampler")

    def __call__(self, input_ids, pixel_values, attention_mask=None,
                 text_index=None, deterministic: bool = True):
        """`text_index` (B,) int32 enables prompt dedup (same contract as
        models/clipseg/model.py): `input_ids`/`attention_mask` carry only the
        batch's U unique prompt rows; the text tower (trainable here — the
        gather transpose is a segment-sum, so weight grads match the dense
        run up to reduction order) runs U times and the decoder memory is
        gathered back to B rows."""
        c = self.config
        b = pixel_values.shape[0]

        text_hidden, _ = self.text_model(input_ids,
                                         attention_mask=attention_mask)
        if self.text_projection is not None:
            text_embeds = self.text_projection(text_hidden)
        else:
            text_embeds = text_hidden
        if text_index is not None:
            text_embeds = jnp.take(text_embeds, text_index, axis=0)
            if attention_mask is not None:
                attention_mask = jnp.take(attention_mask, text_index, axis=0)

        _, image_hidden, _ = self.vision_model(pixel_values)
        if self.visual_projection is not None:
            image_embeds = self.visual_projection(image_hidden)
        else:
            image_embeds = image_hidden

        if c.add_pos_enc:
            text_embeds = text_embeds + jnp.asarray(
                sincos_pos_1d(text_embeds.shape[-1], text_embeds.shape[1]),
                text_embeds.dtype)[None]
            image_embeds = image_embeds + jnp.asarray(
                sincos_pos_1d(image_embeds.shape[-1], image_embeds.shape[1]),
                image_embeds.dtype)[None]

        memory_bias = None
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            memory_bias = jnp.where(attention_mask[:, None, None, :] == 0,
                                    neg, 0.0)

        x = image_embeds
        for layer in self.decoder_layers:
            x = remat.layer_call(layer, x, text_embeds, memory_bias,
                                 deterministic=deterministic)
        x = self.decoder_norm(x)

        seq = x.shape[1]
        side = math.isqrt(seq)
        if side * side != seq:  # strip CLS (decoder.py:94-100)
            x = x[:, 1:]
            side = math.isqrt(x.shape[1])
        x = x.transpose(0, 2, 1).reshape(b, -1, side, side)
        logits = self.upsampler(x)
        h = logits.shape[-1]
        return logits.reshape(b, c.num_output_channels, h, h)
