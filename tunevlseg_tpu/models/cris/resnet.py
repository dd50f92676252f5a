"""CLIP ModifiedResNet (RN50) in Flax — the CRIS image tower.

Reference: src/models/components/cris_model/clip.py:18-274 (Bottleneck with
anti-aliased stride, 3-conv stem, CRIS-variant AttentionPool2d that keeps the
spatial map, adds a conv+BN residual `connect`, and bicubic-resizes its
positional embedding). Returns the (C3, C4, C5') feature pyramid.

BatchNorm: running statistics live in the `batch_stats` collection;
`use_running_average` is threaded from the model root (True for the frozen
prompt-tuning benchmark; False trains the stats like torch train mode).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tunevlseg_tpu.nn import remat
from tunevlseg_tpu.nn.attention import dot_product_attention
from tunevlseg_tpu.nn.conv import Conv2d, conv2d
from tunevlseg_tpu.ops.conv_pallas import (FlatSpec, conv_flat, flat_begin,
                                           flat_end, make_flat_spec)
from tunevlseg_tpu.ops.image import resize_2d

Dtype = Any


class BatchNorm2d(nn.Module):
    """torch BatchNorm2d semantics (momentum 0.1, eps 1e-5). `layout`
    selects the channel axis (NCHW default; NHWC for the einsum-layout
    CRIS backbone) — the parameters/stats are layout-independent."""

    features: int
    use_running_average: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5
    layout: str = "nchw"
    dtype: Dtype = jnp.float32

    def setup(self):
        self.scale_p = self.param("weight", nn.initializers.ones,
                                  (self.features,))
        self.bias_p = self.param("bias", nn.initializers.zeros,
                                 (self.features,))
        self.ra_mean = self.variable("batch_stats", "running_mean",
                                     lambda: jnp.zeros((self.features,)))
        self.ra_var = self.variable("batch_stats", "running_var",
                                    lambda: jnp.ones((self.features,)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale, bias = self.scale_p, self.bias_p
        ra_mean, ra_var = self.ra_mean, self.ra_var
        nhwc = self.layout == "nhwc"
        axes = (0, 1, 2) if nhwc else (0, 2, 3)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axes)
            var = jnp.var(x32, axes)
            if not self.is_initializing():
                n = x.size // x.shape[3 if nhwc else 1]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * unbiased
        shape = (1, 1, 1, -1) if nhwc else (1, -1, 1, 1)
        inv = jax.lax.rsqrt(var + self.epsilon)
        out = (x.astype(jnp.float32) - mean.reshape(shape)) * inv.reshape(shape)
        out = out * scale.reshape(shape) + bias.reshape(shape)
        return out.astype(x.dtype)

    def folded_affine(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Fold the frozen BN into a per-channel (scale, offset) pair for
        the fused Pallas conv epilogue. Only valid with running stats."""
        assert self.use_running_average, "BN folding requires frozen stats"
        inv = jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        s = self.scale_p * inv
        return s, self.bias_p - self.ra_mean.value * s


class BatchNorm1d(nn.Module):
    """torch BatchNorm1d on (B, C)."""

    features: int
    use_running_average: bool = True
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "running_mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "running_var",
                               lambda: jnp.ones((self.features,)))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, 0)
            var = jnp.var(x32, 0)
            if not self.is_initializing():
                n = x.shape[0]
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = (1 - self.momentum) * ra_mean.value \
                    + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value \
                    + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon)
        out = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return out.astype(x.dtype)


def avg_pool_nchw(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """nn.AvgPool2d(window) on NCHW (stride == window)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 1, window, window), (1, 1, window, window), "VALID",
    ) / (window * window)


def avg_pool_nhwc(x: jnp.ndarray, window: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, window, window, 1), "VALID",
    ) / (window * window)


class Bottleneck(nn.Module):
    inplanes: int
    planes: int
    stride: int = 1
    use_running_average: bool = True
    layout: str = "nchw"                 # "nchw" | "nhwc" | "flat"
    flat_spec_in: FlatSpec | None = None
    flat_spec_out: FlatSpec | None = None
    dtype: Dtype = jnp.float32

    EXPANSION = 4

    def _flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """Flat-space Pallas execution (ops/conv_pallas.py): the whole
        bottleneck — 1x1/3x3/1x1 with folded frozen-BN affines, the
        residual add and both ReLUs — runs as fused flat convs; a stride-2
        block transitions spec via flat_end -> avgpool -> flat_begin."""
        assert self.use_running_average, "flat path requires frozen BN"
        si = self.flat_spec_in
        so = self.flat_spec_out or si
        p = self.planes

        def conv_w(ci, co, k, name):
            return Conv2d(ci, co, k, padding=k // 2, use_bias=False,
                          dtype=self.dtype, name=name).materialize_weight()

        def aff(f, name):
            return BatchNorm2d(f, True, name=name).folded_affine()

        w1 = conv_w(self.inplanes, p, 1, "conv1")
        out = conv_flat(x, si, w1, *aff(p, "bn1"), relu=True)
        w2 = conv_w(p, p, 3, "conv2")
        out = conv_flat(out, si, w2, *aff(p, "bn2"), relu=True)
        if self.stride > 1:
            out = flat_begin(avg_pool_nhwc(flat_end(out, si), self.stride),
                             so)
        w3 = conv_w(p, p * self.EXPANSION, 1, "conv3")
        s3, o3 = aff(p * self.EXPANSION, "bn3")
        if self.stride > 1 or self.inplanes != p * self.EXPANSION:
            idn = x if self.stride == 1 else flat_begin(
                avg_pool_nhwc(flat_end(x, si), self.stride), so)
            wd = conv_w(self.inplanes, p * self.EXPANSION, 1,
                        "downsample_conv")
            identity = conv_flat(idn, so, wd,
                                 *aff(p * self.EXPANSION, "downsample_bn"))
        else:
            identity = x
        return conv_flat(out, so, w3, s3, o3, relu=True, residual=identity)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.layout == "flat":
            return self._flat(x)
        ura = self.use_running_average
        lo = self.layout
        pool = avg_pool_nhwc if lo == "nhwc" else avg_pool_nchw
        bn = lambda f, name: BatchNorm2d(f, ura, layout=lo, name=name)
        cv = lambda ci, co, k, p, name: Conv2d(
            ci, co, k, padding=p, use_bias=False, layout=lo,
            dtype=self.dtype, name=name)
        out = cv(self.inplanes, self.planes, 1, 0, "conv1")(x)
        out = nn.relu(bn(self.planes, "bn1")(out))
        out = cv(self.planes, self.planes, 3, 1, "conv2")(out)
        out = nn.relu(bn(self.planes, "bn2")(out))
        if self.stride > 1:
            out = pool(out, self.stride)
        out = cv(self.planes, self.planes * self.EXPANSION, 1, 0,
                 "conv3")(out)
        out = bn(self.planes * self.EXPANSION, "bn3")(out)

        identity = x
        if self.stride > 1 or self.inplanes != self.planes * self.EXPANSION:
            identity = x if self.stride == 1 else pool(x, self.stride)
            identity = cv(self.inplanes, self.planes * self.EXPANSION, 1, 0,
                          "downsample_conv")(identity)
            identity = bn(self.planes * self.EXPANSION,
                          "downsample_bn")(identity)
        return nn.relu(out + identity)


def run_flat_stem_tail(x: jnp.ndarray, width: int, dtype) -> jnp.ndarray:
    """conv2/bn2 + conv3/bn3 of the CLIP ResNet stem as one flat-space
    Pallas chain (NHWC in/out). Called inside a compact module context —
    children attach to the CALLER's scope under the standard names, so
    the param tree is identical to the XLA formulation. Shared by the
    CRIS ModifiedResNet and the DenseCLIP RN backbone."""
    spec = make_flat_spec(x.shape[1], x.shape[2], 1,
                          max_k2c=9 * (width // 2),
                          itemsize=jnp.dtype(dtype).itemsize)
    f = flat_begin(x, spec)
    for ci, co, cn, bn in ((width // 2, width // 2, "conv2", "bn2"),
                           (width // 2, width, "conv3", "bn3")):
        wt = Conv2d(ci, co, 3, padding=1, use_bias=False,
                    dtype=dtype, name=cn).materialize_weight()
        sc, of = BatchNorm2d(co, True, name=bn).folded_affine()
        f = conv_flat(f, spec, wt, sc, of, relu=True)
    return flat_end(f, spec)


def run_flat_stage(x: jnp.ndarray, inplanes: int, planes: int, blocks: int,
                   stride: int, stage: int, dtype):
    """One ResNet stage (NHWC in/out) as a flat-space chain: flat_begin,
    `blocks` Bottlenecks with fused epilogues (the strided block 0
    transitions specs internally), flat_end. Returns (x, inplanes').
    Shared by ModifiedResNet._flat_forward and the DenseCLIP backbone."""
    itemsize = jnp.dtype(dtype).itemsize
    spec_in = make_flat_spec(x.shape[1], x.shape[2], 1,
                             max_k2c=9 * planes, itemsize=itemsize)
    spec_out = spec_in if stride == 1 else make_flat_spec(
        x.shape[1] // stride, x.shape[2] // stride, 1,
        max_k2c=9 * planes, itemsize=itemsize)
    f = flat_begin(x, spec_in)
    for b in range(blocks):
        f = Bottleneck(inplanes, planes, stride if b == 0 else 1, True,
                       layout="flat",
                       flat_spec_in=spec_in if b == 0 else spec_out,
                       flat_spec_out=spec_out, dtype=dtype,
                       name=f"layer{stage}_{b}")(f)
        inplanes = planes * Bottleneck.EXPANSION
    return flat_end(f, spec_out), inplanes


class AttentionPool2d(nn.Module):
    """CRIS variant (clip.py:78-182): spatial self-attention over the C5 map
    with bicubic-resized positional embedding and a conv+BN residual; returns
    a (B, output_dim, H, W) map (no CLS pooling)."""

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    use_running_average: bool = True
    layout: str = "nchw"                 # layout of the INPUT map
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Returns (B, output_dim, H, W) — NCHW regardless of input layout
        (from NHWC the sequence view is a free reshape, no transpose)."""
        nhwc = self.layout == "nhwc"
        if nhwc:
            b, h, w, c = x.shape
        else:
            b, c, h, w = x.shape
        res = Conv2d(self.embed_dim, self.output_dim, 1, use_bias=False,
                     layout=self.layout, dtype=self.dtype,
                     name="connect_conv")(x)
        res = BatchNorm2d(self.output_dim, self.use_running_average,
                          layout=self.layout, name="connect_bn")(res)
        if nhwc:
            res = res.transpose(0, 3, 1, 2)

        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.embed_dim ** -0.5),
                         (self.spacial_dim ** 2 + 1, self.embed_dim))
        # drop the CLS slot; bicubic-resize the spatial grid to (h, w)
        grid = jnp.asarray(pos[1:], jnp.float32).reshape(
            self.spacial_dim, self.spacial_dim, self.embed_dim
        ).transpose(2, 0, 1)
        grid = resize_2d(grid, (h, w), "bicubic")
        pos_hw = grid.reshape(self.embed_dim, h * w).T  # (hw, C)

        seq = (x.reshape(b, h * w, c) if nhwc
               else x.reshape(b, c, h * w).transpose(0, 2, 1))  # (B, hw, C)
        seq = seq + pos_hw[None].astype(seq.dtype)

        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, name=name)
        q = dense(self.embed_dim, "q_proj")(seq)
        k = dense(self.embed_dim, "k_proj")(seq)
        v = dense(self.embed_dim, "v_proj")(seq)
        hd = self.embed_dim // self.num_heads
        split = lambda t: t.reshape(b, h * w, self.num_heads, hd)
        attn = dot_product_attention(split(q), split(k), split(v))
        attn = attn.reshape(b, h * w, self.embed_dim)
        out = dense(self.output_dim, "c_proj")(attn)
        out = out.transpose(0, 2, 1).reshape(b, self.output_dim, h, w)
        return nn.relu(out + res)


class ModifiedResNet(nn.Module):
    """`layout="nhwc"` runs the ENTIRE backbone channels-last with 1x1s
    lowered to einsums — measured r4 (scripts/micro_conv_nhwc.py on chip,
    b64@416): -16% on the C<=64 3x3s, -24..-44% on every 1x1 vs the NCHW
    conv emitter (the r3 conv-floor, docs/ROOFLINE.md). The boundary stays
    NCHW: input is transposed once on entry and the (C3, C4) pyramid once
    on exit, so the FPN/decoder and all converters are unchanged."""

    layers: Sequence[int] = (3, 4, 6, 3)          # RN50
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    width: int = 64
    use_running_average: bool = True
    layout: str = "nchw"                 # "nchw" | "nhwc" | "flat"
    flat_stages: Sequence[str] = ("stem", "1", "2", "3", "4")
    dtype: Dtype = jnp.float32

    def _flat_forward(self, x: jnp.ndarray):
        """layout="flat": the stages named in `flat_stages` run as
        flat-space Pallas conv chains (ops/conv_pallas.py) — one
        pad/reshape on stage entry, fused conv+BN+ReLU(+residual) bands
        inside, one slice on exit; everything else (stem conv1 with its
        3 input channels, the avgpools, stages not listed, attnpool)
        stays on the XLA NHWC path. Requires frozen BN (always true for
        the CRIS/CLIP backbone, which the reference freezes outright)."""
        assert self.use_running_average, "flat layout requires frozen BN"
        x = x.transpose(0, 2, 3, 1)
        w = self.width
        x = Conv2d(3, w // 2, 3, stride=2, padding=1, use_bias=False,
                   layout="nhwc", dtype=self.dtype, name="conv1")(x)
        x = nn.relu(BatchNorm2d(w // 2, True, layout="nhwc", name="bn1")(x))
        if "stem" in self.flat_stages:
            x = run_flat_stem_tail(x, w, self.dtype)
        else:
            for ci, co, cn, bn in ((w // 2, w // 2, "conv2", "bn2"),
                                   (w // 2, w, "conv3", "bn3")):
                x = Conv2d(ci, co, 3, padding=1, use_bias=False,
                           layout="nhwc", dtype=self.dtype, name=cn)(x)
                x = nn.relu(BatchNorm2d(co, True, layout="nhwc",
                                        name=bn)(x))
        x = avg_pool_nhwc(x, 2)

        inplanes = w
        feats = []
        for stage, (planes, blocks) in enumerate(
                zip((w, w * 2, w * 4, w * 8), self.layers), start=1):
            stride = 1 if stage == 1 else 2
            if str(stage) in self.flat_stages:
                x, inplanes = run_flat_stage(x, inplanes, planes, blocks,
                                             stride, stage, self.dtype)
            else:
                for b in range(blocks):
                    x = Bottleneck(inplanes, planes,
                                   stride if b == 0 else 1, True,
                                   layout="nhwc", dtype=self.dtype,
                                   name=f"layer{stage}_{b}")(x)
                    inplanes = planes * Bottleneck.EXPANSION
            feats.append(x)

        c5 = AttentionPool2d(self.input_resolution // 32, w * 32,
                             self.heads, self.output_dim, True,
                             layout="nhwc", dtype=self.dtype,
                             name="attnpool")(feats[3])
        return (feats[1].transpose(0, 3, 1, 2),
                feats[2].transpose(0, 3, 1, 2), c5)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """(B, 3, H, W) -> (C3, C4, C5') with strides 8/16/32 (all NCHW)."""
        if self.layout == "flat":
            return self._flat_forward(x)
        ura = self.use_running_average
        lo = self.layout
        nhwc = lo == "nhwc"
        if nhwc:
            x = x.transpose(0, 2, 3, 1)
        pool = avg_pool_nhwc if nhwc else avg_pool_nchw
        w = self.width
        for i, (cin, cout) in enumerate(((3, w // 2), (w // 2, w // 2),
                                         (w // 2, w))):
            x = Conv2d(cin, cout, 3, stride=2 if i == 0 else 1, padding=1,
                       use_bias=False, layout=lo, dtype=self.dtype,
                       name=f"conv{i+1}")(x)
            x = nn.relu(BatchNorm2d(cout, ura, layout=lo,
                                    name=f"bn{i+1}")(x))
        x = pool(x, 2)

        inplanes = w
        feats = []
        for stage, (planes, blocks) in enumerate(
                zip((w, w * 2, w * 4, w * 8), self.layers), start=1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                block = Bottleneck(inplanes, planes, stride if b == 0 else 1,
                                   ura, layout=lo, dtype=self.dtype,
                                   name=f"layer{stage}_{b}")
                # per-block remat only with frozen BN: a remat'd block must
                # not write batch_stats (prompt-tuning CRIS freezes BN; the
                # e2e bn-train path keeps the plain call)
                x = remat.layer_call(block, x) if ura else block(x)
                inplanes = planes * Bottleneck.EXPANSION
            feats.append(x)

        c5 = AttentionPool2d(self.input_resolution // 32, w * 32, self.heads,
                             self.output_dim, ura, layout=lo,
                             dtype=self.dtype, name="attnpool")(feats[3])
        if nhwc:
            return (feats[1].transpose(0, 3, 1, 2),
                    feats[2].transpose(0, 3, 1, 2), c5)
        return feats[1], feats[2], c5
