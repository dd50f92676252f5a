"""Attention dispatch: XLA einsum path + (optional) fused Pallas TPU kernel.

Every attention in the framework funnels through `dot_product_attention`:
  * CLIP text tower: causal + padding bias, S = 77 (+ prompt tokens)
  * CLIP vision tower: bidirectional, S = (img/patch)^2 + 1 (+ prompts)
  * CLIPSeg decoder / CRIS decoder: bidirectional or cross, tiny S

Sequence lengths here are short, so the XLA path (one fused
softmax(QK^T)V) is already close to the memory-bandwidth roofline; the Pallas
flash kernel in `tunevlseg_tpu.ops.flash_attention` removes the materialized
S×S score matrix for the larger vision shapes and is enabled on TPU for
sequences above `_FLASH_MIN_SEQ`.

The reference inherits its attention from HF `CLIPSegAttention` (eager
softmax(QK^T)V; transformers/models/clipseg/modeling_clipseg.py) — numerics
here match that: scores accumulated in f32, softmax in f32, cast back.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# "auto" (default) uses the Pallas kernel for self-attention at S >=
# _FLASH_MIN_SEQ on TPU — in-jit scanned A/B at the vision shape (b64 s485
# h12 d64 bf16) measures 2.86ms vs 4.63ms for XLA (scripts/micro_attn.py;
# e2e bench 14.23 -> 15.14 steps/s). "1" forces it everywhere, "0" disables.
# "strict" dispatches like "auto" but kernel failures RAISE instead of
# silently falling back (ops/flash_attention.py:_strict) — used by the TPU
# test-suite runs. Read at call time so tests can toggle per-case.
# (An earlier per-launch-synced A/B wrongly concluded the kernel was slower:
# ~30ms dispatch noise per measurement swamped the ~2ms delta.)
_FLASH_MIN_SEQ = 256


def _flash_mode() -> str:
    return os.environ.get("TUNEVLSEG_FLASH", "auto")


def _kernels_blocked() -> bool:
    from tunevlseg_tpu.ops.spmd import multi_device_kernels_blocked
    return multi_device_kernels_blocked()


def xla_attention(
    q: jnp.ndarray,  # (B, S, H, Dh)
    k: jnp.ndarray,  # (B, T, H, Dh)
    v: jnp.ndarray,  # (B, T, H, Dh)
    bias: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, S, T)
    kv_valid: Optional[int] = None,      # static: mask keys >= kv_valid
) -> jnp.ndarray:
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # f32 accumulation on the MXU regardless of input dtype; the S x T score
    # tensor is then STORED at the input dtype (for bf16 models this halves
    # the dominant HBM traffic of the tower — measured ~10% step time on
    # v5e) while the softmax itself still computes in f32.
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores.astype(q.dtype)
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    scores = scores.astype(jnp.float32)
    if kv_valid is not None and kv_valid < k.shape[1]:
        # model-level seq padding: -inf keys -> exact-zero probabilities,
        # identical numerics to the unpadded sequence
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
        scores = jnp.where(col < kv_valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kv_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Dispatch between the Pallas flash kernel and the XLA path.

    `kv_valid` is the STATIC count of real key/value tokens when the model
    runs with MXU-aligned sequence padding (models/clip/vision.py); both
    paths zero out attention to positions >= kv_valid."""
    mode = _flash_mode()
    use_flash = mode == "1" or (
        mode in ("auto", "strict")
        and bias is None  # only the validated batched-heads kernel by default
        and q.shape[1] >= _FLASH_MIN_SEQ
        and q.shape[1] == k.shape[1]
        and jax.default_backend() == "tpu"
        # multi-device programs run the kernel through its
        # custom_partitioning rule (ops/spmd.py: batch/head shardable,
        # seq/head_dim replicated — matches the dp/tp/fsdp shardings);
        # TUNEVLSEG_KERNELS_SPMD=0 is the kill switch back to XLA
        and not _kernels_blocked()
    )
    if use_flash:
        from tunevlseg_tpu.ops import flash_attention as fa

        out = fa.flash_attention(q, k, v, bias=bias, kv_valid=kv_valid)
        if out is not None:
            return out
    return xla_attention(q, k, v, bias, kv_valid=kv_valid)


def causal_bias(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, S, S) additive causal mask; matches HF
    `_create_4d_causal_attention_mask` (min-value fill above the diagonal)."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), jnp.finfo(dtype).min, dtype), k=1)
    return mask[None, None]


def padding_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, S) {0,1} keep-mask -> (B, 1, 1, S) additive bias; matches HF
    `_prepare_4d_attention_mask` (masked keys get dtype-min)."""
    neg = jnp.finfo(dtype).min
    bias = (1.0 - attention_mask.astype(dtype)) * neg
    return bias[:, None, None, :]
