"""Prompt-strategy context learners (CoOp, CoCoOp, VPT, MaPLe,
Shared-Separate, Shared-Attention) as functional Flax modules.

Reference semantics (src/models/core_models/coop/context_learner/):
  * every learner owns `context_vectors` of shape (prompt_depth, num_context,
    context_dim), init N(0, 0.02) or from an embedded text initializer
    (coop_context_learner.py:16-63);
  * textual contexts are spliced after BOS, visual contexts appended at the
    sequence end (base_visual_learner.py:18-23);
  * at encoder layer `i` (1-based) while `i < prompt_depth`, the context
    slots of the hidden states are *overwritten* with `stack[i]`
    (coop_clipseg.py:159-165, vpt_clipseg.py:120-124).

TPU-first redesign: instead of stateful per-layer mutation hooks + the
SharedAttn cross-branch CPU cache (shared_attn_learner.py:39-92), each learner
computes a full per-depth context stack ONCE per step as a pure function:

    stacks = learner(image_features)   # PromptStacks(text=?, visual=?)

The towers then read `stack[i]` inside their (statically unrolled) layer loop.
The SharedAttn transformer projection naturally runs once and both modality
halves are split from the same activation — no cache required.

Stack shapes: (depth, num_ctx, dim) when shared across the batch, or
(depth, B, num_ctx, dim) when image-conditioned (CoCoOp).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any
Initializer = Callable[..., jnp.ndarray]


class PromptStacks(NamedTuple):
    """Per-depth context tensors for each modality (None = modality unused)."""

    text: Optional[jnp.ndarray] = None    # (D, n, td) or (D, B, n, td)
    visual: Optional[jnp.ndarray] = None  # (D, n, vd)


def context_vectors_init(
    prompt_depth: int,
    num_context: int,
    context_dim: int,
    vector_std: float = 0.02,
    initializer_embeddings: Optional[np.ndarray] = None,
) -> Initializer:
    """Build the init fn for `context_vectors`.

    `initializer_embeddings` is the token-embedded context initializer (e.g.
    "a photo of a" -> (depth_init, n, d)) computed ahead of time by
    `tunevlseg_tpu.models.prompt.init_text`; remaining depths are filled with
    N(0, std) (coop_context_learner.py:52-63).
    """

    def init(key, shape=None, dtype=jnp.float32):
        vecs = vector_std * jax.random.normal(
            key, (prompt_depth, num_context, context_dim), dtype)
        if initializer_embeddings is not None:
            emb = jnp.asarray(initializer_embeddings, dtype)
            if emb.ndim == 2:
                emb = emb[None]
            d = min(emb.shape[0], prompt_depth)
            vecs = vecs.at[:d].set(emb[:d])
        return vecs

    return init


class MLPProjector(nn.Module):
    """`BaseProjectorLearner.get_mlp_projection` equivalent: Linear when
    `intermediate_dims` is empty, else Linear->ReLU stacks with an optional
    final LayerNorm (base_projector_learner.py:95-139)."""

    out_dim: int
    intermediate_dims: Sequence[int] = ()
    use_final_norm: bool = False
    use_final_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.intermediate_dims:
            # reference short-circuits to a bare Linear, IGNORING
            # use_final_norm/use_final_bias (base_projector_learner.py:103-104)
            return nn.Dense(self.out_dim, dtype=self.dtype, name="out")(x)
        kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
        for i, dim in enumerate(self.intermediate_dims):
            x = nn.Dense(dim, kernel_init=kaiming, dtype=self.dtype,
                         name=f"hidden_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     use_bias=(not self.use_final_norm) and self.use_final_bias,
                     name="out")(x)
        if self.use_final_norm:
            x = nn.LayerNorm(epsilon=1e-5, use_bias=self.use_final_bias,
                             dtype=self.dtype, name="norm")(x)
        return x


class LoRAProjector(nn.Module):
    """`get_lora_projection`: low-rank Linear pair (base_projector_learner.py:65-93)."""

    out_dim: int
    rank: int
    use_final_norm: bool = False
    use_final_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        min_dim = min(self.out_dim, self.rank)
        x = nn.Dense(min_dim, use_bias=False, dtype=self.dtype, name="down")(x)
        if self.rank <= self.out_dim:
            x = nn.Dense(self.out_dim, dtype=self.dtype,
                         use_bias=(not self.use_final_norm) and self.use_final_bias,
                         name="up")(x)
        if self.use_final_norm:
            x = nn.LayerNorm(epsilon=1e-5, use_bias=self.use_final_bias,
                             dtype=self.dtype, name="norm")(x)
        return x


class TorchTransformerEncoderLayer(nn.Module):
    """Semantics of `torch.nn.TransformerEncoderLayer` (the SharedAttn
    projector, configs/model/shared_attn_clipseg.yaml: nhead=16,
    dim_feedforward=1536, dropout=0.25, norm_first=True, batch_first=False).

    Inputs follow the torch seq-first convention: the reference feeds
    (1, n_ctx, d) which torch reads as (seq=1, batch=n_ctx, d) — so
    self-attention runs over a length-1 sequence per context slot.
    """

    num_heads: int
    dim_feedforward: int
    dropout_rate: float = 0.0
    norm_first: bool = True
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: (seq, batch, d) — torch convention (batch_first=False).
        from tunevlseg_tpu.nn.layers import ACT2FN, MultiHeadAttention

        d = x.shape[-1]
        drop = lambda h: nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        # torch LayerNorm eps default is 1e-5 (flax defaults to 1e-6 — with the
        # tiny-variance context vectors that is a ~1% difference)
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")

        def sa(h):
            # attention over the seq axis; convert to batch-first for our MHA
            hb = jnp.swapaxes(h, 0, 1)
            out = MultiHeadAttention(self.num_heads, dtype=self.dtype,
                                     name="self_attn")(hb)
            return jnp.swapaxes(out, 0, 1)

        def ff(h):
            h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(h)
            h = ACT2FN[self.activation](h)
            h = drop(h)
            return nn.Dense(d, dtype=self.dtype, name="linear2")(h)

        if self.norm_first:
            x = x + drop(sa(ln1(x)))
            x = x + drop(ff(ln2(x)))
        else:
            x = ln1(x + drop(sa(x)))
            x = ln2(x + drop(ff(x)))
        return x


class BasePromptLearner(nn.Module):
    """Shared attributes; subclasses define `__call__(image_features=None,
    deterministic=True) -> PromptStacks`."""

    prompt_depth: int = 1
    num_context: int = 4
    context_dim: int = 512
    vector_std: float = 0.02
    initializer_embeddings: Optional[np.ndarray] = None
    dtype: Dtype = jnp.float32

    has_text: bool = False
    has_visual: bool = False
    needs_image_features: bool = False  # CoCoOp: text stack is image-conditioned

    def _context_vectors(self) -> jnp.ndarray:
        return self.param(
            "context_vectors",
            context_vectors_init(self.prompt_depth, self.num_context,
                                 self.context_dim, self.vector_std,
                                 self.initializer_embeddings),
        ).astype(self.dtype)

    @staticmethod
    def check_depth(prompt_depth: int, max_network_depth: int) -> None:
        if not 1 <= prompt_depth <= max_network_depth:
            raise ValueError(
                f"prompt_depth={prompt_depth} must be in [1, {max_network_depth}]")


class CoOpLearner(BasePromptLearner):
    """Textual-only contexts (coop_context_learner.py:15)."""

    has_text: bool = True

    @nn.compact
    def __call__(self, image_features=None, deterministic: bool = True) -> PromptStacks:
        return PromptStacks(text=self._context_vectors())


class CoCoOpLearner(BasePromptLearner):
    """Image-conditioned textual contexts: a meta-net projects pooled image
    features to a per-sample bias added to every context token
    (cocoop_context_learner.py:33-58)."""

    visual_dim: int = 512
    norm_image_features: bool = True
    use_unified_projection: bool = True
    intermediate_dims: Sequence[int] = ()
    use_proj_norm: bool = False
    use_lora_proj: bool = False

    has_text: bool = True
    needs_image_features: bool = True

    @nn.compact
    def __call__(self, image_features=None, deterministic: bool = True) -> PromptStacks:
        if image_features is None:
            raise ValueError("CoCoOp requires pooled image features")
        ctx = self._context_vectors()                       # (D, n, td)
        feats = image_features.astype(self.dtype)           # (B, vd)
        if self.norm_image_features:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        n_proj = 1 if self.use_unified_projection else self.prompt_depth
        # CoCoOp's projector has no final bias (cocoop_context_learner.py:17)
        make = lambda i: (
            LoRAProjector(self.context_dim, self.intermediate_dims[0],
                          self.use_proj_norm, use_final_bias=False,
                          dtype=self.dtype, name=f"proj_{i}")
            if self.use_lora_proj and self.intermediate_dims
            else MLPProjector(self.context_dim, self.intermediate_dims,
                              self.use_proj_norm, use_final_bias=False,
                              dtype=self.dtype, name=f"proj_{i}"))
        biases = [make(i)(feats) for i in range(n_proj)]    # each (B, td)
        if n_proj == 1:
            biases = biases * self.prompt_depth
        bias = jnp.stack(biases)                            # (D, B, td)
        # (D, 1, n, td) + (D, B, 1, td) -> (D, B, n, td)
        return PromptStacks(text=ctx[:, None] + bias[:, :, None, :])


class VPTLearner(BasePromptLearner):
    """Visual-only contexts appended after the patch tokens
    (vpt_context_learner.py:46-64)."""

    has_visual: bool = True

    @nn.compact
    def __call__(self, image_features=None, deterministic: bool = True) -> PromptStacks:
        return PromptStacks(visual=self._context_vectors())


class MapleLearner(BasePromptLearner):
    """MaPLe: textual contexts are the parameters; visual contexts are a
    per-depth projection of them (maple_context_learner.py:7-20)."""

    visual_dim: int = 768
    use_unified_projection: bool = True
    intermediate_dims: Sequence[int] = ()
    use_proj_norm: bool = False
    use_lora_proj: bool = False

    has_text: bool = True
    has_visual: bool = True

    @nn.compact
    def __call__(self, image_features=None, deterministic: bool = True) -> PromptStacks:
        ctx = self._context_vectors()                       # (D, n, td)
        n_proj = 1 if self.use_unified_projection else self.prompt_depth
        make = lambda i: (
            LoRAProjector(self.visual_dim, self.intermediate_dims[0],
                          self.use_proj_norm, dtype=self.dtype, name=f"proj_{i}")
            if self.use_lora_proj and self.intermediate_dims
            else MLPProjector(self.visual_dim, self.intermediate_dims,
                              self.use_proj_norm, dtype=self.dtype,
                              name=f"proj_{i}"))
        projs = [make(i) for i in range(n_proj)]
        visual = jnp.stack([
            projs[0 if n_proj == 1 else i](ctx[i]) for i in range(self.prompt_depth)
        ])                                                  # (D, n, vd)
        return PromptStacks(text=ctx, visual=visual)


class SharedSeparateLearner(BasePromptLearner):
    """Shared low-dim latent contexts + two per-depth projector stacks to the
    textual and visual widths (shared_separate_learner.py:11-98).
    `context_dim` is the shared latent dim (default 64)."""

    textual_dim: int = 512
    visual_dim: int = 768
    use_unified_projection: bool = True
    intermediate_dims: Sequence[int] = ()
    use_proj_norm: bool = False
    use_lora_proj: bool = False

    has_text: bool = True
    has_visual: bool = True

    @nn.compact
    def __call__(self, image_features=None, deterministic: bool = True) -> PromptStacks:
        ctx = self._context_vectors()                       # (D, n, shared)
        n_proj = 1 if self.use_unified_projection else self.prompt_depth

        def make(prefix: str, out_dim: int, i: int):
            if self.use_lora_proj and self.intermediate_dims:
                return LoRAProjector(out_dim, self.intermediate_dims[0],
                                     self.use_proj_norm, dtype=self.dtype,
                                     name=f"{prefix}_{i}")
            return MLPProjector(out_dim, self.intermediate_dims,
                                self.use_proj_norm, dtype=self.dtype,
                                name=f"{prefix}_{i}")

        t_projs = [make("text_proj", self.textual_dim, i) for i in range(n_proj)]
        v_projs = [make("visual_proj", self.visual_dim, i) for i in range(n_proj)]
        pick = lambda ps, i: ps[0 if n_proj == 1 else i]
        text = jnp.stack([pick(t_projs, i)(ctx[i]) for i in range(self.prompt_depth)])
        visual = jnp.stack([pick(v_projs, i)(ctx[i]) for i in range(self.prompt_depth)])
        return PromptStacks(text=text, visual=visual)


class SharedAttnLearner(BasePromptLearner):
    """Shared (textual_dim + visual_dim)-wide contexts run through a per-depth
    transformer layer; the output splits into the text half and the vision
    half (shared_attn_learner.py:9-103). Computed once per step — the
    reference's cross-branch CPU cache is unnecessary in a functional design.
    `context_dim` must equal textual_dim + visual_dim."""

    textual_dim: int = 512
    visual_dim: int = 768
    use_unified_projection: bool = True
    proj_num_heads: int = 16
    proj_dim_feedforward: int = 1536
    proj_dropout: float = 0.25
    proj_norm_first: bool = True

    has_text: bool = True
    has_visual: bool = True

    @nn.compact
    def __call__(self, image_features=None, deterministic: bool = True) -> PromptStacks:
        if self.context_dim != self.textual_dim + self.visual_dim:
            raise ValueError("context_dim must be textual_dim + visual_dim")
        ctx = self._context_vectors()                       # (D, n, td+vd)
        n_proj = 1 if self.use_unified_projection else self.prompt_depth
        projs = [
            TorchTransformerEncoderLayer(
                self.proj_num_heads, self.proj_dim_feedforward,
                self.proj_dropout, self.proj_norm_first,
                dtype=self.dtype, name=f"proj_{i}")
            for i in range(n_proj)
        ]
        outs = []
        for i in range(self.prompt_depth):
            proj = projs[0 if n_proj == 1 else i]
            # torch path feeds (1, n, d) = (seq=1, batch=n, d)
            outs.append(proj(ctx[i][None], deterministic=deterministic)[0])
        combined = jnp.stack(outs)                          # (D, n, td+vd)
        return PromptStacks(text=combined[..., : self.textual_dim],
                            visual=combined[..., self.textual_dim:])


LEARNER_REGISTRY = {
    "coop": CoOpLearner,
    "cocoop": CoCoOpLearner,
    "vpt": VPTLearner,
    "maple": MapleLearner,
    "shared_separate": SharedSeparateLearner,
    "shared_attn": SharedAttnLearner,
}
