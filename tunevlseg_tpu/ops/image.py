"""Image resampling as precomputed matmuls — TPU-native resize.

PyTorch's `F.interpolate(mode="bicubic"/"bilinear", align_corners=False)` is a
separable convolution with *statically known* sample positions whenever input
and output sizes are static (always true under jit). We therefore express each
resize as two small dense matmuls

    out = W_rows @ img @ W_cols^T

which run on the MXU instead of a gather-heavy general resampler. The weight
matrices match torch numerics exactly:
  * half-pixel coordinate transform (align_corners=False):
        src = (dst + 0.5) * (in/out) - 0.5
  * cubic kernel with A = -0.75 (torch/OpenCV convention; note jax.image uses
    A = -0.5, which does NOT match torch)
  * border replication of out-of-range taps.

Used for: CLIP vision position-embedding interpolation (HF CLIPSeg
`interpolate_pos_encoding`, bicubic), the `use_new_last_layer` additive head's
`nn.Upsample(bilinear)` (reference: src/models/core_models/coop/
base_clipseg.py:58-72), CRIS's final bicubic upsample (reference:
src/models/components/cris_model/__init__.py:132), and prediction-mask
restoration (reference: src/utils/save_utils.py).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=128)
def _resize_matrix(in_size: int, out_size: int, mode: str,
                   align_corners: bool = False) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        src = np.arange(out_size, dtype=np.float64) * scale
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5

    w = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for tap, weight in ((base, 1.0 - frac), (base + 1, frac)):
            idx = np.clip(tap, 0, in_size - 1)
            np.add.at(w, (np.arange(out_size), idx), weight)
    elif mode == "bicubic":
        base = np.floor(src).astype(np.int64)
        frac = src - base
        for offset in range(-1, 3):
            weight = _cubic_kernel(frac - offset)
            idx = np.clip(base + offset, 0, in_size - 1)
            np.add.at(w, (np.arange(out_size), idx), weight)
    elif mode == "nearest":
        # torch "nearest" (floor of dst*scale, no half-pixel shift)
        idx = np.clip(np.floor(np.arange(out_size) * (in_size / out_size)
                               ).astype(np.int64), 0, in_size - 1)
        w[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"unknown resize mode: {mode}")
    return w.astype(np.float32)


def _pad_matrix(m: np.ndarray, out_pad: int) -> np.ndarray:
    """Duplicate the first/last rows `out_pad` times: the resize matmul then
    EMITS a replicate-padded output for free — the duplicated row computes
    the identical dot product, so the result is bitwise what
    `jnp.pad(resize(x), ..., mode="edge")` produces, with no extra pass.
    This is the trans_seg Upsampler's pad-fusion (the explicit replicate
    pad before each 3x3 conv measured ~2x the conv itself:
    PERF_r05/micro_upsampler_variants.log)."""
    if not out_pad:
        return m
    return np.concatenate([np.repeat(m[:1], out_pad, 0), m,
                           np.repeat(m[-1:], out_pad, 0)])


def resize_2d(img: jnp.ndarray, out_hw: tuple[int, int], method: str = "bilinear",
              align_corners: bool = False, out_pad: int = 0) -> jnp.ndarray:
    """Resize the trailing two axes of `img` (..., H, W) -> (..., H', W').

    Matches `torch.nn.functional.interpolate(img, out_hw, mode=method,
    align_corners=align_corners)` numerics (without antialiasing, like torch's
    default). Implemented as two MXU matmuls.

    `out_pad=p` additionally replicate-pads the output by p on each side of
    H and W (-> H'+2p, W'+2p) inside the same matmuls (see _pad_matrix).
    """
    h_in, w_in = img.shape[-2], img.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out) and not out_pad:
        return img
    wr = jnp.asarray(_pad_matrix(
        _resize_matrix(h_in, h_out, method, align_corners), out_pad))
    wc = jnp.asarray(_pad_matrix(
        _resize_matrix(w_in, w_out, method, align_corners), out_pad))
    dtype = img.dtype
    if _resize_bf16() and dtype == jnp.bfloat16:
        x = jnp.einsum("oh,...hw->...ow", wr.astype(dtype), img,
                       preferred_element_type=jnp.float32)
        x = jnp.einsum("ow,...hw->...ho", wc.astype(dtype),
                       x.astype(dtype), preferred_element_type=jnp.float32)
        return x.astype(dtype)
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,...hw->...ow", wr, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("ow,...hw->...ho", wc, x, preferred_element_type=jnp.float32)
    return x.astype(dtype)


def _resize_bf16() -> bool:
    """TUNEVLSEG_RESIZE_BF16=1 (trace-time read): run resize matmuls with
    bf16 operands + f32 accumulation instead of full-f32 operands. f32
    matmuls cost ~4x MXU passes; the bf16 path rounds the interpolation
    WEIGHTS to bf16 (~0.4% relative), so it is numerics-affecting and
    stays OPT-IN pending an accuracy + e2e A/B. Only engages when the
    tensor is already bf16."""
    import os
    return os.environ.get("TUNEVLSEG_RESIZE_BF16", "0") == "1"


def resize_2d_nhwc(img: jnp.ndarray, out_hw: tuple[int, int],
                   method: str = "bilinear",
                   align_corners: bool = False,
                   out_pad: int = 0) -> jnp.ndarray:
    """`resize_2d` for channels-last (B, H, W, C) maps — same precomputed
    matrices applied to the middle axes, identical numerics."""
    h_in, w_in = img.shape[1], img.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out) and not out_pad:
        return img
    wr = jnp.asarray(_pad_matrix(
        _resize_matrix(h_in, h_out, method, align_corners), out_pad))
    wc = jnp.asarray(_pad_matrix(
        _resize_matrix(w_in, w_out, method, align_corners), out_pad))
    dtype = img.dtype
    if _resize_bf16() and dtype == jnp.bfloat16:
        x = jnp.einsum("oh,bhwc->bowc", wr.astype(dtype), img,
                       preferred_element_type=jnp.float32)
        x = jnp.einsum("ow,bhwc->bhoc", wc.astype(dtype),
                       x.astype(dtype), preferred_element_type=jnp.float32)
        return x.astype(dtype)
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,bhwc->bowc", wr, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("ow,bhwc->bhoc", wc, x, preferred_element_type=jnp.float32)
    return x.astype(dtype)


def _cubic_kernel_jnp(x: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    x = jnp.abs(x)
    x2, x3 = x * x, x * x * x
    return jnp.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        jnp.where(x < 2.0,
                  a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0))


def _crop_axis_taps(start: jnp.ndarray, clen: jnp.ndarray, n_in: int,
                    out_size: int):
    """Per-proposal bicubic taps for one axis of a crop-resize.

    `start`/`clen` (P,) int canvas origin/length in source coords. Returns
    (idx, weight, ok) each (4, P, out_size): absolute source index (clamped
    into the image), cubic weight, and whether the CANVAS tap lands inside
    the image (outside-canvas taps clamp to the canvas edge first — the
    same np.add.at accumulation semantics as _resize_matrix — and the
    canvas is zero wherever it exceeds the image)."""
    j = jnp.arange(out_size, dtype=jnp.float32)
    src = (j[None] + 0.5) * (clen[:, None].astype(jnp.float32)
                             / out_size) - 0.5          # (P, S) canvas space
    base = jnp.floor(src)
    frac = src - base
    idxs, wgts, oks = [], [], []
    for m in range(-1, 3):
        w = _cubic_kernel_jnp(frac - m)
        cidx = jnp.clip(base + m, 0, (clen - 1)[:, None].astype(jnp.float32))
        aidx = start[:, None].astype(jnp.float32) + cidx
        ok = (aidx >= 0) & (aidx < n_in)
        idxs.append(jnp.clip(aidx, 0, n_in - 1).astype(jnp.int32))
        wgts.append(w.astype(jnp.float32))
        oks.append(ok)
    return (jnp.stack(idxs), jnp.stack(wgts),
            jnp.stack(oks).astype(jnp.float32))


def crop_resize_bicubic_masked(image: jnp.ndarray,   # (C, H, W)
                               masks: jnp.ndarray,   # (P, H, W) {0,1}
                               boxes: jnp.ndarray,   # (P, 4) x1 y1 x2 y2
                               out_size: int) -> jnp.ndarray:
    """Device-side `torchvision.resized_crop` of the mask-filled image for
    EVERY proposal at once — the zsseg crop-features path
    (reference zero_shot_ris/__init__.py:106-159) without the per-crop
    host loop. Exactly matches the host reference implementation
    (ZeroShotRIS.get_crop_features): the crop canvas is the mask-filled
    image (fill = per-channel image mean) inside the image bounds and ZERO
    outside; bicubic A=-0.75 with edge-clamped taps in canvas space;
    int-truncated boxes; degenerate boxes clamp to 1px. Returns
    (P, C, out_size, out_size) float32."""
    c, h, w = image.shape
    image = image.astype(jnp.float32)
    masks = masks.astype(jnp.float32)
    mean = image.mean(axis=(1, 2))                       # (C,)
    bi = boxes.astype(jnp.int32)                         # trunc toward zero
    x1, y1, x2, y2 = bi[:, 0], bi[:, 1], bi[:, 2], bi[:, 3]
    cw = jnp.maximum(x2 - x1, 1)
    ch = jnp.maximum(y2 - y1, 1)
    xi, xw, xo = _crop_axis_taps(x1, cw, w, out_size)    # (4, P, S)
    yi, yw, yo = _crop_axis_taps(y1, ch, h, out_size)

    def per_proposal(mask_p, xi_p, xw_p, xo_p, yi_p, yw_p, yo_p):
        acc_w = jnp.zeros((c, h, out_size), jnp.float32)
        for m in range(4):
            img_cols = image[:, :, xi_p[m]]              # (C, H, S)
            m_cols = mask_p[:, xi_p[m]]                  # (H, S)
            fill = (img_cols * m_cols[None]
                    + (1.0 - m_cols[None]) * mean[:, None, None])
            acc_w = acc_w + fill * (xw_p[m] * xo_p[m])[None, None, :]
        acc = jnp.zeros((c, out_size, out_size), jnp.float32)
        for m in range(4):
            rows = acc_w[:, yi_p[m], :]                  # (C, S, S)
            acc = acc + rows * (yw_p[m] * yo_p[m])[None, :, None]
        return acc

    return jax.vmap(per_proposal, in_axes=(0, 1, 1, 1, 1, 1, 1))(
        masks, xi, xw, xo, yi, yw, yo)


def upsample_scale(img: jnp.ndarray, scale: int, method: str = "bilinear") -> jnp.ndarray:
    """`nn.Upsample(scale_factor=scale, mode=method)` on (..., H, W)."""
    h, w = img.shape[-2], img.shape[-1]
    return resize_2d(img, (h * scale, w * scale), method)
