"""DenseCLIP (Flax) — language-guided semantic segmentation.

Re-implements the reference's vendored DenseCLIP "side universe"
(src/models/components/denseclip/, driven by denseclip_configs/*.py through
mmseg rather than src/train.py — SURVEY §2.7):

  * `CLIPResNetWithAttention` backbone: CLIP ModifiedResNet returning the
    4-stage pyramid + the attention-pooled (global, spatial) pair
    (models.py:234-360, standard OpenAI AttentionPool2d with mean-prepended
    CLS and bilinear pos-emb resize);
  * `CLIPTextContextEncoder`: causal CLIP text transformer over
    [BOS, learned_context, class_tokens] with EOS pooling shifted by the
    context length and a truncated positional embedding (models.py:805-905);
  * `ContextDecoder`: text queries cross-attending the visual context
    (global + spatial tokens), custom pre-norm decoder layers with
    bias-free q/k/v (models.py:456-529, 907-961);
  * the DenseCLIP glue (denseclip.py:140-190): per-class score map
    `einsum(normalized visual, normalized text)` concatenated onto the
    score_concat_index pyramid level, `text = text + gamma * text_diff`
    residual with gamma init 1e-4;
  * mmseg-style FPN neck + FPNHead decode head (the reference defers these
    to mmseg; re-implemented here so the model runs without it).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tunevlseg_tpu.models.cris.resnet import BatchNorm2d, Bottleneck, avg_pool_nchw
from tunevlseg_tpu.nn.attention import causal_bias, dot_product_attention
from tunevlseg_tpu.nn.conv import Conv2d
from tunevlseg_tpu.nn.layers import PreNormEncoderLayer
from tunevlseg_tpu.ops.image import resize_2d

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DenseCLIPConfig:
    # backbone (RN50)
    vision_layers: Sequence[int] = (3, 4, 6, 3)
    vision_width: int = 64
    input_resolution: int = 512
    embed_dim: int = 1024              # text/visual joint dim
    # text encoder — the published ADE-150 80k recipe
    # (denseclip_fpn_res50_512x512_80k.py): class names tokenized to a
    # 5-token budget (model context_length=5, denseclip.py:99-100), learned
    # context = text_encoder.context_length - budget = 13 - 5 = 8
    # (denseclip.py:103-104)
    vocab_size: int = 49408
    text_context_length: int = 5       # class-token budget
    context_length: int = 8            # learned context tokens
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # context decoder (the 80k recipe overrides the base's 6 layers to 3)
    decoder_width: int = 256
    decoder_heads: int = 4
    decoder_layers: int = 3
    decoder_dropout: float = 0.1
    # segmentation glue (FPNHead channels=256 per _base_/models/denseclip_r50.py)
    num_classes: int = 150
    score_concat_index: int = 3
    fpn_out_channels: int = 256
    head_channels: int = 256
    head_dropout: float = 0.1          # decode_head dropout_ratio
    # training (denseclip_r50.py identity_head loss_weight; denseclip.py:42)
    tau: float = 0.07
    identity_weight: float = 0.4
    # ViT backbone variant (denseclip_fpn_vit-b_640x640_80k.py)
    backbone_type: str = "resnet"      # "resnet" | "vit"
    patch_size: int = 16
    vit_width: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_out_indices: Sequence[int] = (3, 5, 7, 11)
    drop_path_rate: float = 0.0

    @property
    def total_context(self) -> int:
        return self.text_context_length + self.context_length

    @staticmethod
    def tiny(**kw) -> "DenseCLIPConfig":
        base = dict(vision_layers=(1, 1, 1, 1), vision_width=16,
                    input_resolution=64, embed_dim=32, vocab_size=99,
                    text_context_length=5, context_length=3,
                    transformer_width=16, transformer_heads=2,
                    transformer_layers=2, decoder_width=16, decoder_heads=2,
                    decoder_layers=2, decoder_dropout=0.0, num_classes=4,
                    fpn_out_channels=16, head_channels=16)
        base.update(kw)
        return DenseCLIPConfig(**base)

    @staticmethod
    def tiny_vit(**kw) -> "DenseCLIPConfig":
        base = dict(backbone_type="vit", patch_size=16, vit_width=16,
                    vit_layers=4, vit_heads=2, vit_out_indices=(0, 1, 2, 3),
                    score_concat_index=2)
        base.update(kw)
        return DenseCLIPConfig.tiny(**base)

    @staticmethod
    def rn101(**kw) -> "DenseCLIPConfig":
        """The ResNet-101 512² ADE-150 recipe
        (denseclip_fpn_res101_512x512_80k.py): backbone layers (3,4,23,3)
        and — unlike RN50's 1024 — a 512 joint text/visual dim
        (backbone output_dim=512, text_dim=512 in the reference config,
        matching the RN101 CLIP checkpoint's embed_dim). Everything else
        (token budgets, context decoder, FPN head, schedule) is the RN50
        recipe. Also the backbone shape of fpn_clipres101_512x512_80k.py
        (CLIPFPNBaseline ignores embed_dim/attnpool)."""
        base = dict(vision_layers=(3, 4, 23, 3), embed_dim=512)
        base.update(kw)
        return DenseCLIPConfig(**base)

    @staticmethod
    def vitb16(**kw) -> "DenseCLIPConfig":
        """The ViT-B/16 640² ADE-150 recipe
        (denseclip_fpn_vit-b_640x640_80k.py): width 768, 12 layers, stages
        from blocks (3,5,7,11), drop_path 0.1, joint dim 512, score map
        concatenated onto stage 2, context decoder 3 layers; text encoder
        and token budgets identical to the RN50 recipe."""
        base = dict(backbone_type="vit", patch_size=16, vit_width=768,
                    vit_layers=12, vit_heads=12,
                    vit_out_indices=(3, 5, 7, 11), drop_path_rate=0.1,
                    input_resolution=640, embed_dim=512,
                    score_concat_index=2)
        base.update(kw)
        return DenseCLIPConfig(**base)


class DenseCLIPAttentionPool(nn.Module):
    """OpenAI AttentionPool2d returning (global, spatial) — mean-prepended
    CLS query, bilinear pos-emb resize (models.py:69-137)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, c, h, w = x.shape
        seq = x.reshape(b, c, h * w).transpose(0, 2, 1)      # (B, HW, C)
        seq = jnp.concatenate([seq.mean(axis=1, keepdims=True), seq], axis=1)

        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (self.spacial_dim ** 2 + 1, self.embed_dim))
        cls_pos = jnp.asarray(pos[:1], jnp.float32)
        grid = jnp.asarray(pos[1:], jnp.float32).reshape(
            self.spacial_dim, self.spacial_dim, self.embed_dim
        ).transpose(2, 0, 1)
        grid = resize_2d(grid, (h, w), "bilinear")
        spatial_pos = grid.reshape(self.embed_dim, h * w).T
        seq = seq + jnp.concatenate([cls_pos, spatial_pos]
                                    )[None].astype(seq.dtype)

        dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        q = dense(self.embed_dim, "q_proj")(seq)
        k = dense(self.embed_dim, "k_proj")(seq)
        v = dense(self.embed_dim, "v_proj")(seq)
        hd = self.embed_dim // self.num_heads
        split = lambda t: t.reshape(b, -1, self.num_heads, hd)
        out = dot_product_attention(split(q), split(k), split(v))
        out = dense(self.output_dim, "c_proj")(
            out.reshape(b, -1, self.embed_dim))
        global_feat = out[:, 0]
        feature_map = out[:, 1:].transpose(0, 2, 1).reshape(
            b, self.output_dim, h, w)
        return global_feat, feature_map


class CLIPResNetWithAttention(nn.Module):
    """CLIP ModifiedResNet pyramid; `with_attnpool=False` gives the plain
    `CLIPResNet` (models.py:234) used by the fpn_clip* baseline configs."""

    config: DenseCLIPConfig
    use_running_average: bool = True
    with_attnpool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 use_running_average: Optional[bool] = None):
        c = self.config
        w = c.vision_width
        # per-call override: the trainable DenseCLIP flips the backbone
        # into batch-stats BN during train steps (torch train() semantics)
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        # Flat-space Pallas convs (TUNEVLSEG_PALLAS_CONV, trace-time read)
        # need frozen BN to fold; train-mode steps keep the XLA path.
        from tunevlseg_tpu.ops.conv_pallas import flat_conv_mode
        use_flat = ura and flat_conv_mode() != "0"
        if use_flat:
            return self._flat_forward(x)
        for i, (cin, cout) in enumerate(((3, w // 2), (w // 2, w // 2),
                                         (w // 2, w))):
            x = Conv2d(cin, cout, 3, stride=2 if i == 0 else 1, padding=1,
                       use_bias=False, dtype=self.dtype, name=f"conv{i+1}")(x)
            x = nn.relu(BatchNorm2d(cout, ura, name=f"bn{i+1}")(x))
        x = avg_pool_nchw(x, 2)

        outs = []
        inplanes = w
        for stage, (planes, blocks) in enumerate(
                zip((w, w * 2, w * 4, w * 8), c.vision_layers), start=1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                x = Bottleneck(inplanes, planes, stride if b == 0 else 1,
                               ura, dtype=self.dtype,
                               name=f"layer{stage}_{b}")(x)
                inplanes = planes * Bottleneck.EXPANSION
            outs.append(x)

        if not self.with_attnpool:
            return tuple(outs)
        pooled = DenseCLIPAttentionPool(
            c.input_resolution // 32, w * 32, w * 32 // 64, c.embed_dim,
            dtype=self.dtype, name="attnpool")(outs[-1])
        return (*outs, pooled)

    def _flat_forward(self, x: jnp.ndarray):
        """Frozen-BN inference path through the flat-space Pallas convs
        (ops/conv_pallas.py): channels-last end to end, one flat boundary
        per stage, fused conv+BN+ReLU(+residual) bands inside. Identical
        param tree to the XLA path. Stage machinery shared with the CRIS
        ModifiedResNet (cris/resnet.py:run_flat_*)."""
        from tunevlseg_tpu.models.cris.resnet import (avg_pool_nhwc,
                                                      run_flat_stage,
                                                      run_flat_stem_tail)
        c = self.config
        w = c.vision_width
        x = x.transpose(0, 2, 3, 1)
        x = Conv2d(3, w // 2, 3, stride=2, padding=1, use_bias=False,
                   layout="nhwc", dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm2d(w // 2, True, layout="nhwc", name="bn1")(x))
        x = avg_pool_nhwc(run_flat_stem_tail(x, w, self.dtype), 2)

        outs = []
        inplanes = w
        for stage, (planes, blocks) in enumerate(
                zip((w, w * 2, w * 4, w * 8), c.vision_layers), start=1):
            x, inplanes = run_flat_stage(x, inplanes, planes, blocks,
                                         1 if stage == 1 else 2, stage,
                                         self.dtype)
            outs.append(x.transpose(0, 3, 1, 2))

        if not self.with_attnpool:
            return tuple(outs)
        pooled = DenseCLIPAttentionPool(
            c.input_resolution // 32, w * 32, w * 32 // 64, c.embed_dim,
            dtype=self.dtype, name="attnpool")(outs[-1])
        return (*outs, pooled)


class DropPath(nn.Module):
    """Stochastic depth (timm_utils.drop_path): per-sample residual drop."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return x * mask.astype(x.dtype) / keep


class ViTBlock(nn.Module):
    """ResidualAttentionBlock with drop_path on both residuals
    (models.py:391-427). Param names match PreNormEncoderLayer so the
    packed-MHA converter path is shared."""

    num_heads: int
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        from tunevlseg_tpu.nn.layers import MultiHeadAttention, TransformerMLP
        dp = DropPath(self.drop_path)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + dp(MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                      name="self_attn")(h), deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        return x + dp(TransformerMLP(x.shape[-1] * 4, "quick_gelu",
                                     dtype=self.dtype, name="mlp")(h),
                      deterministic)


class GroupNorm1(nn.Module):
    """torch GroupNorm(1, C) on NCHW: normalize over (C,H,W) per sample."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2, 3), keepdims=True)
        var = xf.var(axis=(1, 2, 3), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
        return y.astype(x.dtype)


def max_pool_nchw(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        jax.lax.max, (1, 1, k, k), (1, 1, k, k), "VALID")


class CLIPVisionTransformerBackbone(nn.Module):
    """CLIPVisionTransformer backbone (models.py:530-715): ViT trunk tapped at
    `vit_out_indices`, each tap reshaped to a 2D map and run through the
    fpn1..fpn4 pyramid ops (4x/2x/1x/0.5x for patch 16), plus the projected
    (global, spatial) embedding pair when `get_embeddings`.

    Faithfully keeps the reference quirk at models.py:677: the CLS position
    embedding has `class_embedding` added AGAIN on top of the CLS token that
    already contains it."""

    config: DenseCLIPConfig
    use_running_average: bool = True
    get_embeddings: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        from tunevlseg_tpu.nn.conv import ConvTranspose2d
        c = self.config
        w = c.vit_width
        spatial = c.input_resolution // c.patch_size
        x = Conv2d(3, w, c.patch_size, stride=c.patch_size, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        b, _, h, wd = x.shape
        tokens = x.reshape(b, w, h * wd).transpose(0, 2, 1)     # (B, HW, w)

        scale = w ** -0.5
        cls_emb = self.param("class_embedding",
                             nn.initializers.normal(scale), (w,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(scale),
                         (spatial * spatial + 1, w))
        cls_tok = jnp.broadcast_to(jnp.asarray(cls_emb, tokens.dtype),
                                   (b, 1, w))
        x = jnp.concatenate([cls_tok, tokens], axis=1)

        cls_pos = (pos[0] + cls_emb)[None, None]               # the quirk
        spatial_pos = jnp.asarray(pos[1:]).reshape(
            1, spatial, spatial, w).transpose(0, 3, 1, 2)
        spatial_pos = resize_2d(spatial_pos, (h, wd), "bilinear")
        spatial_pos = spatial_pos.reshape(1, w, h * wd).transpose(0, 2, 1)
        pos_full = jnp.concatenate(
            [jnp.asarray(cls_pos), spatial_pos], axis=1)
        x = x + pos_full.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)

        rates = np.linspace(0.0, c.drop_path_rate, c.vit_layers)
        taps = []
        for i in range(c.vit_layers):
            x = ViTBlock(c.vit_heads, float(rates[i]), dtype=self.dtype,
                         name=f"resblocks_{i}")(x, deterministic)
            if i in tuple(c.vit_out_indices):
                taps.append(x[:, 1:].transpose(0, 2, 1).reshape(b, w, h, wd))

        ura = self.use_running_average
        gelu = lambda t: jax.nn.gelu(t, approximate=False)
        if c.patch_size == 16:
            f = GroupNorm1(w, name="fpn1_gn")(taps[0])
            f = ConvTranspose2d(w, w, 2, dtype=self.dtype,
                                name="fpn1_deconv1")(f)
            f = gelu(BatchNorm2d(w, ura, name="fpn1_bn")(f))
            f1 = ConvTranspose2d(w, w, 2, dtype=self.dtype,
                                 name="fpn1_deconv2")(f)
            f2 = ConvTranspose2d(w, w, 2, dtype=self.dtype, name="fpn2_deconv")(
                GroupNorm1(w, name="fpn2_gn")(taps[1]))
            f3 = GroupNorm1(w, name="fpn3_gn")(taps[2])
            f4 = max_pool_nchw(GroupNorm1(w, name="fpn4_gn")(taps[3]), 2)
        elif c.patch_size == 8:
            f1 = ConvTranspose2d(w, w, 2, dtype=self.dtype, name="fpn1_deconv")(
                GroupNorm1(w, name="fpn1_gn")(taps[0]))
            f2 = GroupNorm1(w, name="fpn2_gn")(taps[1])
            f3 = max_pool_nchw(GroupNorm1(w, name="fpn3_gn")(taps[2]), 2)
            f4 = max_pool_nchw(GroupNorm1(w, name="fpn4_gn")(taps[3]), 4)
        else:
            raise ValueError(f"unsupported patch size {c.patch_size}")
        feats = [f1, f2, f3, f4]

        if not self.get_embeddings:
            return tuple(feats)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x)
        proj = self.param("proj", nn.initializers.normal(scale),
                          (w, c.embed_dim))
        y = y @ jnp.asarray(proj, y.dtype)
        global_emb = y[:, 0]
        visual_emb = y[:, 1:].reshape(b, h, wd, -1).transpose(0, 3, 1, 2)
        return (*feats, (global_emb, visual_emb))


class CLIPTextContextEncoder(nn.Module):
    """[BOS, context, class tokens] causal encoder (models.py:805-905)."""

    config: DenseCLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text: jnp.ndarray, context: jnp.ndarray):
        """text (K, N1) int token ids; context (B, N2, width).
        Returns (B, K, embed_dim)."""
        c = self.config
        emb = nn.Embed(c.vocab_size, c.transformer_width, dtype=self.dtype,
                       name="token_embedding")(text)          # (K, N1, C)
        k_cls, n1, width = emb.shape
        b, n2, _ = context.shape

        eos_idx = jnp.argmax(text.astype(jnp.int32), axis=-1) + n2  # (K,)
        eos_idx = jnp.broadcast_to(eos_idx[None], (b, k_cls)).reshape(-1)

        emb_b = jnp.broadcast_to(emb[None], (b, k_cls, n1, width))
        ctx_b = jnp.broadcast_to(context[:, None].astype(self.dtype),
                                 (b, k_cls, n2, width))
        x = jnp.concatenate([emb_b[:, :, :1], ctx_b, emb_b[:, :, 1:]],
                            axis=2).reshape(b * k_cls, n1 + n2, width)

        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (c.total_context, c.transformer_width))
        x = x + jnp.asarray(pos[:x.shape[1]], x.dtype)

        bias = causal_bias(x.shape[1], jnp.float32)
        for i in range(c.transformer_layers):
            x = PreNormEncoderLayer(
                c.transformer_heads, c.transformer_width * 4, "quick_gelu",
                1e-5, dtype=self.dtype, name=f"resblocks_{i}")(x, bias)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)

        proj = self.param("text_projection",
                          nn.initializers.normal(c.transformer_width ** -0.5),
                          (c.transformer_width, c.embed_dim))
        pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        out = pooled @ jnp.asarray(proj, pooled.dtype)
        return out.reshape(b, k_cls, c.embed_dim)


class BiasFreeMHA(nn.Module):
    """models.py Attention: bias-free q/k/v, biased output proj."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = q.shape[-1]
        hd = d // self.num_heads
        dense_nb = lambda name: nn.Dense(d, use_bias=False, dtype=self.dtype,
                                         name=name)
        qh = dense_nb("q_proj")(q)
        kh = dense_nb("k_proj")(k)
        vh = dense_nb("v_proj")(v)
        split = lambda t: t.reshape(*t.shape[:-1], self.num_heads, hd)
        out = dot_product_attention(split(qh), split(kh), split(vh))
        out = out.reshape(*q.shape[:-1], d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class ContextDecoderLayer(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, deterministic=True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        h = ln("norm1")(x)
        x = x + BiasFreeMHA(self.num_heads, self.dtype, name="self_attn")(
            h, h, h)
        q = ln("norm2")(x)
        x = x + BiasFreeMHA(self.num_heads, self.dtype, name="cross_attn")(
            q, mem, mem)
        h = ln("norm3")(x)
        d = x.shape[-1]
        h = nn.Dense(d * 4, dtype=self.dtype, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_3")(h)
        return x + h


class ContextDecoder(nn.Module):
    config: DenseCLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, visual, deterministic=True):
        c = self.config
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        mem = ln("memory_proj_0")(visual)
        mem = nn.Dense(c.decoder_width, dtype=self.dtype,
                       name="memory_proj_1")(mem)
        mem = ln("memory_proj_2")(mem)
        x = ln("text_proj_0")(text)
        x = nn.Dense(c.decoder_width, dtype=self.dtype, name="text_proj_1")(x)
        for i in range(c.decoder_layers):
            x = ContextDecoderLayer(c.decoder_heads, self.dtype,
                                    name=f"decoder_{i}")(x, mem,
                                                         deterministic)
        x = ln("out_proj_0")(x)
        return nn.Dense(c.embed_dim, dtype=self.dtype, name="out_proj_1")(x)


class FPNNeck(nn.Module):
    """mmseg-style FPN neck: 1x1 laterals + 3x3 outputs, nearest top-down."""

    in_channels: Sequence[int]
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        laterals = [
            Conv2d(cin, self.out_channels, 1, dtype=self.dtype,
                   name=f"lateral_{i}")(f)
            for i, (f, cin) in enumerate(zip(feats, self.in_channels))
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=2), 2, axis=3)
            up = up[:, :, :laterals[i - 1].shape[2], :laterals[i - 1].shape[3]]
            laterals[i - 1] = laterals[i - 1] + up
        return [
            Conv2d(self.out_channels, self.out_channels, 3, padding=1,
                   dtype=self.dtype, name=f"output_{i}")(lat)
            for i, lat in enumerate(laterals)
        ]


class FPNHead(nn.Module):
    """mmseg FPNHead: per-level conv(+GN+relu) scale heads upsampled to the
    finest stride, summed, 1x1 classifier. `dropout_ratio` is mmseg's
    channel dropout (nn.Dropout2d) before the classifier — active only in
    training (denseclip_r50.py decode_head dropout_ratio=0.1)."""

    num_classes: int
    in_channels: int
    channels: int
    dropout_ratio: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 deterministic: bool = True):
        target_hw = feats[0].shape[2:]
        total = None
        for i, f in enumerate(feats):
            h = Conv2d(self.in_channels, self.channels, 3, padding=1,
                       use_bias=False, dtype=self.dtype,
                       name=f"scale_head_{i}")(f)
            h = nn.GroupNorm(num_groups=min(32, self.channels), epsilon=1e-5,
                             dtype=self.dtype, name=f"scale_gn_{i}")(
                                 h.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            h = nn.relu(h)
            if h.shape[2:] != target_hw:
                h = resize_2d(h, target_hw, "bilinear")
            total = h if total is None else total + h
        if self.dropout_ratio > 0:
            # Dropout2d: drop whole channels (broadcast over H, W)
            total = nn.Dropout(self.dropout_ratio,
                               broadcast_dims=(2, 3))(total, deterministic)
        return Conv2d(self.channels, self.num_classes, 1, dtype=self.dtype,
                      name="cls_seg")(total)


class DenseCLIP(nn.Module):
    """Full segmentor: backbone -> text/context fusion -> score-map concat ->
    FPN neck -> FPN head -> full-resolution class logits."""

    config: DenseCLIPConfig
    class_token_ids: Any = None   # (K, text_context_length) np array
    # train-mode BN in the ResNet backbone (torch train() semantics for the
    # reference's mmseg training; running stats update as a batch_stats
    # side effect). Inference-only uses keep the default False.
    bn_train: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        if c.backbone_type == "vit":
            self.backbone = CLIPVisionTransformerBackbone(
                c, dtype=self.dtype, name="backbone")
        else:
            self.backbone = CLIPResNetWithAttention(c, dtype=self.dtype,
                                                    name="backbone")
        self.text_encoder = CLIPTextContextEncoder(c, dtype=self.dtype,
                                                   name="text_encoder")
        self.context_decoder = ContextDecoder(c, dtype=self.dtype,
                                              name="context_decoder")
        self.contexts = self.param(
            "contexts", nn.initializers.truncated_normal(1.0),
            (1, c.context_length, c.transformer_width))
        self.gamma = self.param(
            "gamma", lambda key: jnp.full((c.embed_dim,), 1e-4, jnp.float32))
        if c.backbone_type == "vit":
            stage_channels = [c.vit_width] * 4
        else:
            w = c.vision_width
            stage_channels = [w * 4, w * 8, w * 16, w * 32]
        stage_channels[c.score_concat_index] += c.num_classes
        self.neck = FPNNeck(stage_channels, c.fpn_out_channels,
                            dtype=self.dtype, name="neck")
        self.decode_head = FPNHead(c.num_classes, c.fpn_out_channels,
                                   c.head_channels,
                                   dropout_ratio=c.head_dropout,
                                   dtype=self.dtype, name="decode_head")

    def __call__(self, images: jnp.ndarray,
                 class_token_ids: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 with_score_map: bool = False):
        c = self.config
        token_ids = (class_token_ids if class_token_ids is not None
                     else jnp.asarray(self.class_token_ids))
        bn_ura = (not self.bn_train) or deterministic
        feats = (self.backbone(images, deterministic)
                 if c.backbone_type == "vit"
                 else self.backbone(images, use_running_average=bn_ura))
        x_orig = list(feats[:4])
        global_feat, visual_embeddings = feats[4]

        b, ch, h, w = visual_embeddings.shape
        visual_context = jnp.concatenate(
            [global_feat[:, :, None],
             visual_embeddings.reshape(b, ch, h * w)], axis=2
        ).transpose(0, 2, 1)                                   # (B, 1+HW, C)

        text = self.text_encoder(token_ids, self.contexts.astype(self.dtype))
        text = jnp.broadcast_to(text, (b, *text.shape[1:]))
        text_diff = self.context_decoder(text, visual_context,
                                         deterministic)
        text = text + jnp.asarray(self.gamma, text.dtype) * text_diff

        v_norm = visual_embeddings / jnp.linalg.norm(
            visual_embeddings, axis=1, keepdims=True)
        t_norm = text / jnp.linalg.norm(text, axis=2, keepdims=True)
        score_map = jnp.einsum("bchw,bkc->bkhw", v_norm, t_norm)
        idx = c.score_concat_index
        x_orig[idx] = jnp.concatenate([x_orig[idx], score_map], axis=1)

        neck_out = self.neck(x_orig)
        logits = self.decode_head(neck_out, deterministic)
        logits = resize_2d(logits, images.shape[2:], "bilinear")
        if with_score_map:
            # the raw stride-32 score map feeds the identity-head auxiliary
            # training loss (models/denseclip/loss.py)
            return logits, score_map
        return logits


class CLIPFPNBaseline(nn.Module):
    """The fpn_clip* baseline configs (fpn_clipres50_512x512_80k.py etc.):
    a frozen-CLIP backbone pyramid -> FPN neck -> FPN head, no text branch.
    Covers both the plain `CLIPResNet` and the no-embeddings ViT backbone."""

    config: DenseCLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.config
        if c.backbone_type == "vit":
            feats = CLIPVisionTransformerBackbone(
                c, get_embeddings=False, dtype=self.dtype,
                name="backbone")(images, deterministic)
            stage_channels = [c.vit_width] * 4
        else:
            feats = CLIPResNetWithAttention(
                c, with_attnpool=False, dtype=self.dtype,
                name="backbone")(images)
            w = c.vision_width
            stage_channels = [w * 4, w * 8, w * 16, w * 32]
        neck_out = FPNNeck(stage_channels, c.fpn_out_channels,
                           dtype=self.dtype, name="neck")(list(feats))
        logits = FPNHead(c.num_classes, c.fpn_out_channels, c.head_channels,
                         dtype=self.dtype, name="decode_head")(neck_out)
        return resize_2d(logits, images.shape[2:], "bilinear")
