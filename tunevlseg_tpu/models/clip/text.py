"""CLIP text tower with prompt-token splicing (Flax).

Re-implements the forward semantics of HF `CLIPSegTextTransformer` plus the
reference's prompt surgery (src/models/core_models/coop/coop_clipseg.py:40-299):

  * token embed -> splice `[BOS, ctx, mid..., last]` clipped to
    max_position_embeddings while preserving the final token
    (coop_context_learner.py:136-181);
  * position embeddings added for the spliced (longer) sequence;
  * causal mask built at the new length; padding mask prepended with ones for
    the context slots then clipped (coop_context_learner.py:102-107);
  * encoder layers run with the context slots [1 : 1+n_ctx] overwritten by
    `stack[i]` while layer index (1-based) < prompt_depth
    (coop_clipseg.py:159-165);
  * final LayerNorm, then EOS pooling at
    min(argmax_logic(ids) + n_ctx, max_pos - 1) with the `eos_token_id == 2`
    legacy branch (coop_clipseg.py:261-289).

TPU notes: the splice is static concatenation (prompt positions are
compile-time constants); the per-layer overwrite is a static slice update.
The layer loop is a Python loop (12 iters) so XLA sees a fully unrolled,
fusable graph.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.models.clip.config import CLIPTextConfig
from tunevlseg_tpu.nn import remat
from tunevlseg_tpu.nn.attention import causal_bias, padding_bias
from tunevlseg_tpu.nn.layers import PreNormEncoderLayer
from tunevlseg_tpu.parallel import activation_sharding

Dtype = Any


def splice_text_context(
    inputs_embeds: jnp.ndarray,   # (B, L, D)
    context: jnp.ndarray,         # (n, D) or (B, n, D)
    max_length: Optional[int],
) -> jnp.ndarray:
    """[BOS, ctx, mid, last] with truncation preserving the last token.

    Mirrors CoOpContextLearner.forward (coop_context_learner.py:136-181):
    mid = embeds[:, 1 : min(max_length - n, L) - 1], last = embeds[:, -1:].
    """
    b, l, d = inputs_embeds.shape
    if context.ndim == 2:
        context = jnp.broadcast_to(context[None], (b, *context.shape))
    n = context.shape[1]
    first = inputs_embeds[:, :1]
    mid_last = l - 1 if max_length is None else min(max_length - n, l) - 1
    mid = inputs_embeds[:, 1:mid_last]
    last = inputs_embeds[:, -1:]
    return jnp.concatenate([first, context.astype(inputs_embeds.dtype), mid, last],
                           axis=1)


def extend_text_mask(mask: jnp.ndarray, num_context: int,
                     max_length: Optional[int], value: int) -> jnp.ndarray:
    """Prepend `num_context` entries of `value` then clip to max_length
    (coop_context_learner.py:82-114; ones for attention-mask, zeros for
    pad-mask). Valid because the first real token (BOS) is always unmasked."""
    ext = jnp.full((mask.shape[0], num_context), value, mask.dtype)
    out = jnp.concatenate([ext, mask], axis=1)
    return out if max_length is None else out[:, :max_length]


def eos_pooled_indices(input_ids: jnp.ndarray, eos_token_id: int,
                       num_context: int, max_position_embeddings: int) -> jnp.ndarray:
    """Index of the pooled (EOT) token per sample after context insertion
    (coop_clipseg.py:261-289)."""
    ids = input_ids.astype(jnp.int32)
    if eos_token_id == 2:
        # legacy: EOT is the highest token id in each sequence
        pre = ids
    else:
        pre = (ids == eos_token_id).astype(jnp.int32)
    idx = jnp.argmax(pre, axis=-1) + num_context
    return jnp.minimum(idx, max_position_embeddings - 1)


class CLIPTextTower(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.token_embedding = nn.Embed(c.vocab_size, c.hidden_size,
                                        dtype=self.dtype, name="token_embedding")
        self.position_embedding = nn.Embed(c.max_position_embeddings, c.hidden_size,
                                           dtype=self.dtype,
                                           name="position_embedding")
        self.layers = [
            PreNormEncoderLayer(c.num_heads, c.intermediate_size, c.hidden_act,
                                c.layer_norm_eps, dtype=self.dtype,
                                name=f"layers_{i}")
            for i in range(c.num_layers)
        ]
        self.final_layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                             dtype=self.dtype,
                                             name="final_layer_norm")

    def __call__(
        self,
        input_ids: jnp.ndarray,                   # (B, L) int
        attention_mask: Optional[jnp.ndarray] = None,   # (B, L) {0,1}
        text_ctx: Optional[jnp.ndarray] = None,   # (depth, n, D) | (depth, B, n, D)
        prompt_depth: int = 0,
    ):
        """Returns (last_hidden_state, pooled_output).

        With `text_ctx=None` this is the stock HF text transformer; with a
        context stack it applies the full CoOp/CoCoOp splice semantics.
        """
        c = self.config
        x = self.token_embedding(input_ids)

        num_ctx = 0
        if text_ctx is not None:
            num_ctx = text_ctx.shape[-2]
            x = splice_text_context(x, text_ctx[0], c.max_position_embeddings)

        seq = x.shape[1]
        positions = jnp.arange(seq)[None, :]
        x = x + self.position_embedding(positions)

        bias = causal_bias(seq, jnp.float32)
        if attention_mask is not None:
            mask = attention_mask
            if num_ctx:
                mask = extend_text_mask(mask, num_ctx, c.max_position_embeddings, 1)
            bias = bias + padding_bias(mask, jnp.float32)

        # sequence-parallel residual stream (no-op unless enabled): shard the
        # LN/residual/ctx-splice regions over the model axis so GSPMD splits
        # the per-block TP all-reduce into reduce-scatter + all-gather.
        x = activation_sharding.constrain(x)
        for i, layer in enumerate(self.layers, start=1):
            x = activation_sharding.constrain(
                remat.layer_call(layer, x, bias))
            if text_ctx is not None and i < prompt_depth:
                ctx_i = text_ctx[i]
                if ctx_i.ndim == 2:
                    ctx_i = jnp.broadcast_to(ctx_i[None],
                                             (x.shape[0], *ctx_i.shape))
                x = x.at[:, 1:1 + num_ctx].set(ctx_i.astype(x.dtype))

        x = self.final_layer_norm(x)
        pool_idx = eos_pooled_indices(input_ids, c.eos_token_id, num_ctx,
                                      c.max_position_embeddings)
        pooled = jnp.take_along_axis(x, pool_idx[:, None, None], axis=1)[:, 0]
        return x, pooled
