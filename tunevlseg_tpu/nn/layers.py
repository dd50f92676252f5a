"""Shared transformer building blocks (Flax linen).

These are the JAX-native equivalents of the encoder layers the reference gets
from HF transformers (CLIPSegEncoderLayer / CLIPSegDecoderLayer in
transformers.models.clipseg.modeling_clipseg; reference call sites:
src/models/core_models/coop/coop_clipseg.py:136-165).

Design notes (TPU):
  * All shapes static; no data-dependent control flow.
  * Attention runs through `tunevlseg_tpu.nn.attention.dot_product_attention`
    which dispatches to a fused Pallas kernel on TPU for the hot shapes and
    falls back to a pure-XLA einsum path elsewhere.
  * Activations may run in bfloat16 ("param dtype f32, compute dtype bf16")
    via the `dtype` attribute, mirroring Lightning `precision: 16-mixed`.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.nn.attention import dot_product_attention

Dtype = Any


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


ACT2FN: dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "quick_gelu": quick_gelu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (CLIP convention)."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,            # (B, S, D)
        attn_bias: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, S, S)
        kv_states: Optional[jnp.ndarray] = None,  # cross-attention memory (B, T, D)
        kv_valid: Optional[int] = None,           # static real-token count
    ) -> jnp.ndarray:
        d = hidden_states.shape[-1]
        if d % self.num_heads:
            raise ValueError(f"hidden dim {d} not divisible by heads {self.num_heads}")
        head_dim = d // self.num_heads
        kv = hidden_states if kv_states is None else kv_states

        dense = lambda name: nn.Dense(d, dtype=self.dtype, name=name)
        q = dense("q_proj")(hidden_states)
        k = dense("k_proj")(kv)
        v = dense("v_proj")(kv)

        def split(x):
            return x.reshape(*x.shape[:-1], self.num_heads, head_dim)

        out = dot_product_attention(split(q), split(k), split(v),
                                    bias=attn_bias, kv_valid=kv_valid)
        out = out.reshape(*hidden_states.shape[:-1], d)
        return dense("out_proj")(out)


class TransformerMLP(nn.Module):
    intermediate_size: int
    act: str = "quick_gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = ACT2FN[self.act](h)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(h)


class PreNormEncoderLayer(nn.Module):
    """Pre-LayerNorm transformer block (CLIP text/vision encoder layer)."""

    num_heads: int
    intermediate_size: int
    act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray] = None,
                 kv_valid: Optional[int] = None):
        ln = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        h = ln("layer_norm1")(x)
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   name="self_attn")(h, attn_bias,
                                                     kv_valid=kv_valid)
        h = ln("layer_norm2")(x)
        return x + TransformerMLP(self.intermediate_size, self.act,
                                  dtype=self.dtype, name="mlp")(h)


class PostNormEncoderLayer(nn.Module):
    """Post-LayerNorm block — the CLIPSeg *decoder* layer variant
    (normalization applied after attention/MLP residuals)."""

    num_heads: int
    intermediate_size: int
    act: str = "relu"
    layer_norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray] = None):
        ln = lambda name: nn.LayerNorm(epsilon=self.layer_norm_eps,
                                       dtype=self.dtype, name=name)
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                   name="self_attn")(x, attn_bias)
        x = ln("layer_norm1")(x)
        x = x + TransformerMLP(self.intermediate_size, self.act,
                               dtype=self.dtype, name="mlp")(x)
        return ln("layer_norm2")(x)
