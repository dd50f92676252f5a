"""Convolution helpers in NCHW layout (torch convention).

Flax's `nn.Conv` is NHWC-first; the converters and parity tests are simpler
when the array layout matches the reference exactly, and XLA:TPU handles
either layout. Where a conv is really a matmul in disguise (patch embedding,
stride==kernel transposed conv) we lower it to an einsum explicitly so it is
guaranteed to hit the MXU as a single GEMM.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
Size2 = Union[int, tuple[int, int]]


def _pair(v: Size2) -> tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(x: jnp.ndarray, weight: jnp.ndarray, bias=None, stride: Size2 = 1,
           padding: Union[str, Size2] = 0, dilation: Size2 = 1,
           groups: int = 1, pad_mode: str = "zeros") -> jnp.ndarray:
    """torch.nn.functional.conv2d semantics: x (B,C,H,W), weight (O,I/g,kh,kw).

    `padding="same"` with `pad_mode="replicate"` reproduces
    nn.Conv2d(padding="same", padding_mode="replicate") used by the
    `use_new_last_layer` additive head (reference base_clipseg.py:64-70).
    """
    kh, kw = weight.shape[2], weight.shape[3]
    dh, dw = _pair(dilation)
    if padding == "same":
        ph, pw = (kh - 1) * dh, (kw - 1) * dw
        pads = ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2))
    elif isinstance(padding, str):
        raise ValueError(f"unsupported padding {padding}")
    else:
        p = _pair(padding)
        pads = ((p[0], p[0]), (p[1], p[1]))

    if pad_mode != "zeros" and any(p != (0, 0) for p in pads):
        mode = {"replicate": "edge", "reflect": "reflect"}[pad_mode]
        x = jnp.pad(x, ((0, 0), (0, 0), pads[0], pads[1]), mode=mode)
        pads = ((0, 0), (0, 0))

    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=_pair(stride),
        padding=pads,
        rhs_dilation=(dh, dw),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        # NOTE: no preferred_element_type — it breaks lax.conv's transpose
        # rule when the weight is cast (f32 param -> bf16 compute); TPU
        # convs accumulate in f32 on the MXU regardless
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1).astype(out.dtype)
    return out


def conv_transpose_patch(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
                         stride: int = 16) -> jnp.ndarray:
    """ConvTranspose2d with kernel_size == stride — a pure per-pixel linear
    map + depth-to-space, lowered to one GEMM. x (B,C,h,w),
    weight (C, O, k, k) [torch ConvTranspose layout], returns (B,O,h*k,w*k)."""
    c, o, kh, kw = weight.shape
    b, _, h, w = x.shape
    wmat = weight.reshape(c, o * kh * kw)
    y = jnp.einsum("bchw,cf->bhwf", x, wmat.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b, h, w, o, kh, kw).transpose(0, 3, 1, 4, 2, 5)
    y = y.reshape(b, o, h * kh, w * kw)
    if bias is not None:
        y = y + bias.reshape(1, -1, 1, 1).astype(y.dtype)
    return y


def _torch_conv_init(fan_in: int):
    """torch's default kaiming_uniform(a=sqrt(5)) ≡ U(-1/√fan_in, 1/√fan_in)."""
    bound = (1.0 / fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def conv2d_nhwc(x: jnp.ndarray, weight: jnp.ndarray, bias=None,
                stride: Size2 = 1, padding: Union[str, Size2] = 0,
                pad_mode: str = "zeros") -> jnp.ndarray:
    """NHWC conv with the weight still in torch OIHW layout (the layout
    transpose is a free constant fold on the small weight). 1x1 stride-1
    convs lower to an explicit (B*H*W, C) @ (C, O) einsum — measured r4
    (scripts/micro_conv_nhwc.py, b64@416 early RN50 shapes): einsum-1x1 is
    24-44%% faster than the conv emitter, and NHWC 3x3 is ~16%% faster than
    NCHW at C<=64. This is the CRIS conv-floor fix (VERDICT r3 #2)."""
    kh, kw = weight.shape[2], weight.shape[3]
    sh, sw = _pair(stride)
    if padding == "same":
        pads = ((kh - 1) // 2, kh - 1 - (kh - 1) // 2), \
               ((kw - 1) // 2, kw - 1 - (kw - 1) // 2)
    elif isinstance(padding, str):
        raise ValueError(f"unsupported padding {padding}")
    else:
        p = _pair(padding)
        pads = ((p[0], p[0]), (p[1], p[1]))
    if pad_mode != "zeros" and any(p != (0, 0) for p in pads):
        mode = {"replicate": "edge", "reflect": "reflect"}[pad_mode]
        x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)), mode=mode)
        pads = ((0, 0), (0, 0))
    if kh == kw == 1 and sh == sw == 1 and pads == ((0, 0), (0, 0)):
        out = jnp.einsum("bhwc,co->bhwo", x, weight[:, :, 0, 0].T.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        out = jax.lax.conv_general_dilated(
            x, jnp.transpose(weight, (2, 3, 1, 0)).astype(x.dtype),
            window_strides=(sh, sw),
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    return out


class Conv2d(nn.Module):
    """Parameter-holding wrapper with torch layout (O, I, kh, kw).

    `layout="nhwc"` consumes/produces NHWC activations while keeping the
    PARAMETER in torch OIHW layout, so converters and state dicts are
    layout-independent (only plain zero padding is supported there)."""

    in_channels: int
    out_channels: int
    kernel_size: Size2
    stride: Size2 = 1
    padding: Union[str, Size2] = 0
    pad_mode: str = "zeros"
    use_bias: bool = True
    bias_init_value: Union[float, None] = None  # fixed-constant bias init
    layout: str = "nchw"
    dtype: Dtype = jnp.float32

    def setup(self):
        kh, kw = _pair(self.kernel_size)
        fan_in = self.in_channels * kh * kw
        self.weight = self.param(
            "weight", _torch_conv_init(fan_in),
            (self.out_channels, self.in_channels, kh, kw))
        if self.use_bias:
            if self.bias_init_value is not None:
                bias_initializer = nn.initializers.constant(
                    self.bias_init_value)
            else:
                bias_initializer = _torch_conv_init(fan_in)
            self.bias = self.param("bias", bias_initializer,
                                   (self.out_channels,))

    def materialize_weight(self) -> jnp.ndarray:
        """Return the OIHW weight without running the conv — the
        flat-space Pallas conv path (ops/conv_pallas.py) consumes raw
        parameters while keeping the checkpoint tree identical."""
        assert not self.use_bias, "flat conv path is bias-free"
        return self.weight

    def materialize_params(self):
        """(weight, bias|None) for flat paths whose convs carry a bias
        (the bias folds into the fused epilogue's offset)."""
        return self.weight, (self.bias if self.use_bias else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.weight
        bias = self.bias if self.use_bias else None
        if self.layout == "nhwc":
            return conv2d_nhwc(x.astype(self.dtype), weight, bias,
                               self.stride, self.padding,
                               pad_mode=self.pad_mode)
        return conv2d(x.astype(self.dtype), weight, bias, self.stride,
                      self.padding, pad_mode=self.pad_mode)


class ConvTranspose2d(nn.Module):
    """ConvTranspose2d with kernel == stride (the only flavor CLIPSeg needs);
    torch weight layout (I, O, k, k)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        fan_in = self.out_channels * k * k  # torch uses weight.shape[1]
        weight = self.param("weight", _torch_conv_init(fan_in),
                            (self.in_channels, self.out_channels, k, k))
        bias = self.param("bias", _torch_conv_init(fan_in), (self.out_channels,))
        return conv_transpose_patch(x.astype(self.dtype), weight, bias, k)
