"""CRIS multimodal neck, cross-attention decoder, and dynamic-conv projector.

Reference: src/models/components/cris_model/layers.py. The per-sample dynamic
convolution of `Projector` (layers.py:96-119) keeps torch's grouped-conv
formulation (groups = batch), which XLA lowers to a batched GEMM.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tunevlseg_tpu.nn import remat
from tunevlseg_tpu.nn.attention import dot_product_attention
from tunevlseg_tpu.nn.conv import Conv2d, conv2d
from tunevlseg_tpu.models.cris.resnet import BatchNorm1d, BatchNorm2d, avg_pool_nchw
from tunevlseg_tpu.ops.image import upsample_scale, resize_2d

Dtype = Any


class ConvBnRelu(nn.Module):
    """`conv_layer` helper (layers.py:15-26): Conv(no bias) + BN + ReLU."""

    in_dim: int
    out_dim: int
    kernel_size: int = 1
    padding: int = 0
    stride: int = 1
    use_running_average: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(self.in_dim, self.out_dim, self.kernel_size,
                   stride=self.stride, padding=self.padding, use_bias=False,
                   dtype=self.dtype, name="conv")(x)
        return nn.relu(BatchNorm2d(self.out_dim, self.use_running_average,
                                   name="bn")(x))


class LinearBnRelu(nn.Module):
    """`linear_layer` (layers.py:29-34): Linear(no bias) + BN1d + ReLU."""

    in_dim: int
    out_dim: int
    use_running_average: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="linear")(x)
        return nn.relu(BatchNorm1d(self.out_dim, self.use_running_average,
                                   name="bn")(x))


def add_coords(x: jnp.ndarray) -> jnp.ndarray:
    """Append normalized x/y coordinate channels (CoordConv, layers.py:51-64)."""
    b, _, h, w = x.shape
    xs = jnp.linspace(-1, 1, w, dtype=x.dtype)
    ys = jnp.linspace(-1, 1, h, dtype=x.dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([xx, yy])[None]
    coords = jnp.broadcast_to(coords, (b, 2, h, w))
    return jnp.concatenate([x, coords], axis=1)


class FPN(nn.Module):
    """Multimodal neck fusing the text state into the pyramid
    (layers.py:359-445)."""

    in_channels: Sequence[int] = (512, 1024, 1024)
    out_channels: Sequence[int] = (256, 512, 1024)
    use_running_average: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, state: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        v3, v4, v5 = feats
        ci, co = self.in_channels, self.out_channels
        # call-time override: e2e models train BN (bn_train) but must eval
        # with running stats (torch module.eval() semantics)
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        conv = functools.partial(ConvBnRelu, use_running_average=ura,
                                 dtype=self.dtype)

        # fusion 1: text gating of C5
        s = LinearBnRelu(ci[2], co[2], ura, self.dtype, name="txt_proj")(state)
        f5 = conv(ci[2], co[2], 1, 0, name="f1_v_proj")(v5)
        f5 = f5 * s[:, :, None, None]
        f5 = nn.relu(BatchNorm2d(co[2], ura, name="norm_layer_bn")(f5))

        # fusion 2
        f4 = conv(ci[1], co[1], 3, 1, name="f2_v_proj")(v4)
        f5_up = upsample_scale(f5, 2, "bilinear")
        f4 = conv(co[2] + co[1], co[1], 1, 0, name="f2_cat")(
            jnp.concatenate([f4, f5_up], axis=1))

        # fusion 3
        f3 = conv(ci[0], co[0], 3, 1, name="f3_v_proj")(v3)
        f3 = avg_pool_nchw(f3, 2)
        f3 = conv(co[0] + co[1], co[1], 1, 0, name="f3_cat")(
            jnp.concatenate([f3, f4], axis=1))

        # fusion 4 + aggregation
        fq5 = conv(co[2], co[1], 3, 1, name="f4_proj5")(f5)
        fq4 = conv(co[1], co[1], 3, 1, name="f4_proj4")(f4)
        fq3 = conv(co[1], co[1], 3, 1, name="f4_proj3")(f3)
        fq5 = upsample_scale(fq5, 2, "bilinear")
        fq = jnp.concatenate([fq3, fq4, fq5], axis=1)
        fq = conv(3 * co[1], co[1], 1, 0, name="aggr")(fq)
        fq = conv(co[1] + 2, co[1], 3, 1, name="coordconv_0")(add_coords(fq))
        return conv(co[1], co[1], 3, 1, name="coordconv_1")(fq)


def sincos_pos_1d(d_model: int, length: int) -> np.ndarray:
    """(length, d_model) sin/cos encoding (layers.py:149-184; base 1e-4)."""
    pe = np.zeros((length, d_model), np.float32)
    position = np.arange(length)[:, None]
    mul = 1e-4 ** (np.arange(0, d_model, 2) / d_model)
    angles = position * mul
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)
    return pe


def sincos_pos_2d(d_model: int, height: int, width: int) -> np.ndarray:
    """(height*width, d_model) 2D sin/cos encoding (layers.py:186-236)."""
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    mul = 1e-4 ** (np.arange(0, half, 2) / half)
    angles_w = np.arange(width)[:, None] * mul      # (W, half/2)
    pe[0:half:2] = np.sin(angles_w).T[:, None, :].repeat(height, axis=1)
    pe[1:half:2] = np.cos(angles_w).T[:, None, :].repeat(height, axis=1)
    angles_h = np.arange(height)[:, None] * mul
    pe[half::2] = np.sin(angles_h).T[:, :, None].repeat(width, axis=2)
    pe[half + 1::2] = np.cos(angles_h).T[:, :, None].repeat(width, axis=2)
    return pe.reshape(d_model, height * width).T


class MHA(nn.Module):
    """Explicit-QKV multi-head attention (torch nn.MultiheadAttention
    semantics with separate q/k/v inputs and optional key padding bias)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_pad_bias: Optional[jnp.ndarray] = None,
                 kv_valid: Optional[int] = None):
        d = q.shape[-1]
        hd = d // self.num_heads
        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        qh = dense("q_proj")(q)
        kh = dense("k_proj")(k)
        vh = dense("v_proj")(v)
        split = lambda t: t.reshape(*t.shape[:-1], self.num_heads, hd)
        out = dot_product_attention(split(qh), split(kh), split(vh),
                                    bias=key_pad_bias, kv_valid=kv_valid)
        out = out.reshape(*q.shape[:-1], d)
        return dense("out_proj")(out)


class CRISDecoderLayer(nn.Module):
    """Pre-norm self-attn -> cross-attn(text, key-pad mask) -> FFN with an
    internal LayerNorm (layers.py:278-356). Dropout omitted in the functional
    path is applied via the `deterministic` flag."""

    d_model: int = 512
    num_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vis, txt, vis_pos, txt_pos, key_pad_bias,
                 deterministic: bool = True,
                 kv_valid: Optional[int] = None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        drop = lambda h: nn.Dropout(self.dropout,
                                    deterministic=deterministic)(h)
        # self-attention over visual tokens; under MXU seq padding the
        # padded rows ride the GEMMs but are masked out of the keys
        # (static kv_valid, same contract as models/clip/vision.py)
        v2 = ln("norm1")(vis)
        qk = v2 + vis_pos
        v2 = MHA(self.num_heads, self.dtype, name="self_attn")(
            qk, qk, v2, kv_valid=kv_valid)
        v2 = ln("self_attn_norm")(v2)
        vis = vis + drop(v2)
        # cross-attention into text
        v2 = ln("norm2")(vis)
        v2 = MHA(self.num_heads, self.dtype, name="multihead_attn")(
            v2 + vis_pos, txt + txt_pos, txt, key_pad_bias)
        v2 = ln("cross_attn_norm")(v2)
        vis = vis + drop(v2)
        # FFN (with internal LayerNorm, layers.py:303-309)
        v2 = ln("norm3")(vis)
        v2 = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ffn_0")(v2)
        v2 = drop(nn.relu(v2))
        v2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ffn_norm")(v2)
        v2 = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_1")(v2)
        return vis + drop(v2)


class CRISTransformerDecoder(nn.Module):
    num_layers: int = 3
    d_model: int = 512
    num_heads: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fq: jnp.ndarray, txt: jnp.ndarray,
                 pad_mask: jnp.ndarray, deterministic: bool = True):
        """fq (B,C,H,W), txt (B,L,D), pad_mask (B,L) True=pad.
        Returns (B,C,H,W)."""
        from tunevlseg_tpu.models.clip.vision import decoder_padded_len

        b, c, h, w = fq.shape
        l = txt.shape[1]
        vis_pos = jnp.asarray(sincos_pos_2d(c, h, w))[None]
        txt_pos = jnp.asarray(sincos_pos_1d(txt.shape[-1], l))[None]
        key_pad_bias = jnp.where(pad_mask, jnp.finfo(jnp.float32).min, 0.0
                                 )[:, None, None, :]

        vis = fq.reshape(b, c, h * w).transpose(0, 2, 1)
        # MXU seq padding: 676 visual tokens at img 416 leave every per-token
        # GEMM on ragged row tiles; run the decoder at the next 64-aligned
        # length (704), mask padded keys in self-attn, slice off at the end —
        # numerically identical (same contract as models/clip/vision.py)
        s_real = h * w
        s_run = decoder_padded_len(s_real)
        kv_valid = None
        if s_run is not None:
            vis = jnp.pad(vis, ((0, 0), (0, s_run - s_real), (0, 0)))
            vis_pos = jnp.pad(vis_pos,
                              ((0, 0), (0, s_run - s_real), (0, 0)))
            kv_valid = s_real
        for i in range(self.num_layers):
            layer = CRISDecoderLayer(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.dropout, dtype=self.dtype, name=f"layers_{i}")
            vis = remat.layer_call(
                layer, vis, txt, vis_pos.astype(vis.dtype),
                txt_pos.astype(vis.dtype), key_pad_bias,
                deterministic=deterministic, kv_valid=kv_valid)
        vis = vis[:, :s_real]
        vis = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(vis)
        return vis.transpose(0, 2, 1).reshape(b, c, h, w)


class Projector(nn.Module):
    """Upsampling visual projector + per-sample dynamic convolution
    (layers.py:71-119)."""

    word_dim: int = 1024
    in_dim: int = 256
    kernel_size: int = 3
    use_running_average: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, word: jnp.ndarray,
                 use_running_average: Optional[bool] = None) -> jnp.ndarray:
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        conv = functools.partial(ConvBnRelu, use_running_average=ura,
                                 dtype=self.dtype)
        x = upsample_scale(x, 2, "bilinear")
        x = conv(self.in_dim * 2, self.in_dim * 2, 3, 1, name="vis_1")(x)
        x = upsample_scale(x, 2, "bilinear")
        x = conv(self.in_dim * 2, self.in_dim, 3, 1, name="vis_3")(x)
        x = Conv2d(self.in_dim, self.in_dim, 1, dtype=self.dtype,
                   name="vis_4")(x)

        b, c, h, w = x.shape
        k = self.kernel_size
        params = nn.Dense(c * k * k + 1, dtype=self.dtype, name="txt")(word)
        weight = params[:, :-1].reshape(b, c, k, k)
        bias = params[:, -1]
        # per-sample dynamic conv as k*k shifted contractions — identical
        # math to torch F.conv2d(groups=B) but ~5x faster on TPU: a grouped
        # conv with ONE output channel per group wastes the 128-lane output
        # tile (measured 18ms vs 3.4ms at b64/c256/104 net of dispatch,
        # scripts/micro_dynconv.py); each tap is a bandwidth-bound batched
        # contraction over channels with f32 accumulation
        xp = jnp.pad(x, ((0, 0), (0, 0), (k // 2, k // 2), (k // 2, k // 2)))
        wx = weight.astype(x.dtype)
        out = None
        for dy in range(k):
            for dx in range(k):
                tap = jnp.einsum("bchw,bc->bhw",
                                 xp[:, :, dy:dy + h, dx:dx + w], wx[:, :, dy, dx],
                                 preferred_element_type=jnp.float32)
                out = tap if out is None else out + tap
        out = out.astype(x.dtype) + bias.reshape(b, 1, 1).astype(x.dtype)
        return out[:, None]  # (B, 1, H, W)
