"""Detectron2-style ResNet-FPN backbone (Flax) for FreeSOLO/SOLOv2.

Mirrors the vendored detectron2 subset the reference uses
(detectron2/modelling/backbone/resnet.py:316-629, fpn.py:17-233):
  * BasicStem: 7x7/2 conv + FrozenBN + relu + 3x3/2 maxpool;
  * BottleneckBlocks with FrozenBN, stride in the 3x3 conv
    (STRIDE_IN_1X1: False in the zsseg config), shortcut 1x1 conv on the
    first block of each stage;
  * FPN: 1x1 laterals + 3x3 output convs, nearest top-down upsampling, sum
    fusion, LastLevelMaxPool producing p6.

FrozenBatchNorm is a pure affine at inference:
    y = (x - running_mean) / sqrt(running_var + eps) * weight + bias
kept as 4 separate parameters so detectron2 checkpoints map 1:1.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.nn.conv import Conv2d, conv2d
from tunevlseg_tpu.ops.conv_pallas import (FlatSpec, conv_flat, flat_begin,
                                           flat_end, make_flat_spec)

Dtype = Any

RESNET_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBN(nn.Module):
    features: int
    epsilon: float = 1e-5

    def setup(self):
        self.w = self.param("weight", nn.initializers.ones, (self.features,))
        self.b = self.param("bias", nn.initializers.zeros, (self.features,))
        self.mean = self.param("running_mean", nn.initializers.zeros,
                               (self.features,))
        self.var = self.param("running_var", nn.initializers.ones,
                              (self.features,))

    def folded_affine(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(scale, offset) for the fused Pallas conv epilogue."""
        inv = jax.lax.rsqrt(self.var + self.epsilon)
        s = self.w * inv
        return s, self.b - self.mean * s

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s, o = self.folded_affine()
        return (x * s.reshape(1, -1, 1, 1).astype(x.dtype)
                + o.reshape(1, -1, 1, 1).astype(x.dtype))


def max_pool_nchw(x: jnp.ndarray, window: int, stride: int,
                  padding: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1, window, window), (1, 1, stride, stride),
        ((0, 0), (0, 0), (padding, padding), (padding, padding)))


class BottleneckBlock(nn.Module):
    in_channels: int
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = False
    flat_spec: FlatSpec | None = None   # set => x is flat, stride must be 1
    dtype: Dtype = jnp.float32

    def _flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """Flat-space Pallas execution for the stride-1 blocks (the bulk
        of R50/R101: every block but the first of each stage). FrozenBN
        affines, the residual add and all ReLUs fuse into the convs."""
        assert self.stride == 1 and self.in_channels == self.out_channels
        spec = self.flat_spec
        bc = self.bottleneck_channels

        def conv_w(ci, co, k, name):
            return Conv2d(ci, co, k, padding=k // 2, use_bias=False,
                          dtype=self.dtype, name=name).materialize_weight()

        out = conv_flat(x, spec, conv_w(self.in_channels, bc, 1, "conv1"),
                        *FrozenBN(bc, name="conv1_norm").folded_affine(),
                        relu=True)
        out = conv_flat(out, spec, conv_w(bc, bc, 3, "conv2"),
                        *FrozenBN(bc, name="conv2_norm").folded_affine(),
                        relu=True)
        return conv_flat(out, spec, conv_w(bc, self.out_channels, 1, "conv3"),
                         *FrozenBN(self.out_channels,
                                   name="conv3_norm").folded_affine(),
                         relu=True, residual=x)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.flat_spec is not None:
            return self._flat(x)
        s1, s3 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        out = Conv2d(self.in_channels, self.bottleneck_channels, 1, stride=s1,
                     use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(FrozenBN(self.bottleneck_channels, name="conv1_norm")(out))
        out = Conv2d(self.bottleneck_channels, self.bottleneck_channels, 3,
                     stride=s3, padding=1, use_bias=False, dtype=self.dtype,
                     name="conv2")(out)
        out = nn.relu(FrozenBN(self.bottleneck_channels, name="conv2_norm")(out))
        out = Conv2d(self.bottleneck_channels, self.out_channels, 1,
                     use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBN(self.out_channels, name="conv3_norm")(out)

        if self.in_channels != self.out_channels or self.stride > 1:
            sc = Conv2d(self.in_channels, self.out_channels, 1,
                        stride=self.stride, use_bias=False, dtype=self.dtype,
                        name="shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_norm")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class D2ResNet(nn.Module):
    depth: int = 101
    stem_out: int = 64
    res2_out: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        x = Conv2d(3, self.stem_out, 7, stride=2, padding=3, use_bias=False,
                   dtype=self.dtype, name="stem_conv1")(x)
        x = nn.relu(FrozenBN(self.stem_out, name="stem_conv1_norm")(x))
        x = max_pool_nchw(x, 3, 2, 1)

        # Flat-space Pallas conv execution (TUNEVLSEG_PALLAS_CONV, read at
        # trace time): the stride-1 blocks of each stage — all of res2 past
        # block 0, and blocks 1+ of res3/4/5 — chain through
        # ops/conv_pallas.py with one NCHW<->flat boundary per stage. The
        # strided block 0 stays on the XLA path.
        from tunevlseg_tpu.ops.conv_pallas import flat_conv_mode
        use_flat = flat_conv_mode() != "0"
        itemsize = jnp.dtype(self.dtype).itemsize

        feats = {}
        in_ch = self.stem_out
        out_ch = self.res2_out
        bottleneck = self.res2_out // 4
        for stage_idx, n_blocks in enumerate(RESNET_STAGE_BLOCKS[self.depth],
                                             start=2):
            start = 0
            if use_flat:
                # block 0 (strided past res2, and/or with the projection
                # shortcut) stays on the XLA path
                x = BottleneckBlock(in_ch, bottleneck, out_ch,
                                    2 if stage_idx > 2 else 1,
                                    dtype=self.dtype,
                                    name=f"res{stage_idx}_0")(x)
                in_ch = out_ch
                start = 1
            if use_flat and n_blocks > start:
                spec = make_flat_spec(x.shape[2], x.shape[3], 1,
                                      max_k2c=9 * bottleneck,
                                      itemsize=itemsize)
                f = flat_begin(x.transpose(0, 2, 3, 1), spec)
                for b in range(start, n_blocks):
                    # only stride-1 blocks enter the flat chain (b >= 1)
                    f = BottleneckBlock(
                        in_ch, bottleneck, out_ch, 1,
                        flat_spec=spec, dtype=self.dtype,
                        name=f"res{stage_idx}_{b}")(f)
                    in_ch = out_ch
                x = flat_end(f, spec).transpose(0, 3, 1, 2)
            else:
                for b in range(start, n_blocks):
                    stride = 2 if (b == 0 and stage_idx > 2) else 1
                    x = BottleneckBlock(
                        in_ch, bottleneck, out_ch, stride,
                        dtype=self.dtype, name=f"res{stage_idx}_{b}")(x)
                    in_ch = out_ch
            feats[f"res{stage_idx}"] = x
            out_ch *= 2
            bottleneck *= 2
        return feats


class D2FPN(nn.Module):
    """FPN over res2..res5 with LastLevelMaxPool (p2..p6), sum fusion."""

    out_channels: int = 256
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        names = ["res2", "res3", "res4", "res5"]
        laterals = [
            Conv2d(cin, self.out_channels, 1, dtype=self.dtype,
                   name=f"fpn_lateral{i+2}")(feats[n])
            for i, (n, cin) in enumerate(zip(names, self.in_channels))
        ]
        # top-down: nearest 2x upsampling + sum
        results = {}
        prev = laterals[-1]
        results["p5"] = Conv2d(self.out_channels, self.out_channels, 3,
                               padding=1, dtype=self.dtype,
                               name="fpn_output5")(prev)
        for level in (4, 3, 2):
            lat = laterals[level - 2]
            up = jnp.repeat(jnp.repeat(prev, 2, axis=2), 2, axis=3)
            up = up[:, :, :lat.shape[2], :lat.shape[3]]
            prev = lat + up
            results[f"p{level}"] = Conv2d(
                self.out_channels, self.out_channels, 3, padding=1,
                dtype=self.dtype, name=f"fpn_output{level}")(prev)
        results["p6"] = max_pool_nchw(results["p5"], 1, 2, 0)
        return results
