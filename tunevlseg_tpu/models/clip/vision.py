"""CLIP ViT vision tower with visual-prompt support (Flax).

Re-implements HF `CLIPSegVisionTransformer` semantics plus the reference's
visual prompt surgery (src/models/core_models/coop/vpt_clipseg.py:36-235):

  * patch embedding as space-to-depth + matmul (MXU-friendly; equivalent to
    the stride-p Conv2d in CLIPSegVisionEmbeddings);
  * position embeddings bicubic-resized from the pretraining grid to the input
    grid (HF `interpolate_pos_encoding`) — precomputed as a static matmul,
    matching torch bicubic numerics (see ops/image.py);
  * visual context appended AFTER the embeddings and BEFORE pre-layernorm
    ("concatenating after results in unstable training", vpt_clipseg.py:174-181);
  * per-layer overwrite of the trailing context slots while layer index
    (1-based) < prompt_depth;
  * hidden states collected per layer for the CLIPSeg decoder's extract
    layers; optional static early exit after max(extract_layers)
    (vpt_clipseg.py:129-131).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tunevlseg_tpu.models.clip.config import CLIPVisionConfig
from tunevlseg_tpu.nn import remat
from tunevlseg_tpu.nn.layers import PreNormEncoderLayer
from tunevlseg_tpu.ops.image import resize_2d
from tunevlseg_tpu.parallel import activation_sharding

Dtype = Any

# MXU sequence padding: at 352² the token count is 22·22+1 = 485, which
# leaves the tower's GEMMs on ragged tiles; padding to the next multiple of
# 128 (512) measured ~15% FASTER per encoder layer on v5e despite 5.6% more
# FLOPs (scripts/micro_layer_scan.py: 5.45 vs 6.40 ms at b64 bf16).  Padded
# tokens ride through LN/GEMMs but are never attended to (static `kv_valid`
# masking in nn/attention.py) and are sliced off every exposed hidden state,
# so the numerics are IDENTICAL to the unpadded run.  "auto" pads on TPU
# only; "1" forces (tests), "0" disables.
# read at TRACE time (not import) so per-process A/B harnesses that flip
# the env var between model builds (scripts/ab_env.py) actually compare two
# different programs — an import-time constant silently reran variant A
# (r4 code-review finding; the first ab_cris_padseq run was invalid)
_PAD_MIN_SEQ = 256


def _padded_len(s: int) -> Optional[int]:
    """Target length if MXU padding applies at this sequence, else None."""
    mode = os.environ.get("TUNEVLSEG_PAD_SEQ", "auto")
    if mode == "0" or s % 128 == 0 or s < _PAD_MIN_SEQ:
        return None
    if mode != "1" and jax.default_backend() != "tpu":
        return None
    return (s + 127) // 128 * 128


def decoder_padded_len(s: int, multiple: int = 64) -> Optional[int]:
    """MXU padding target for decoder token stacks (CRIS: 676 @ img 416).

    Decoder sequences appear as GEMM *rows* (per-token projections/FFN) and
    inside the flash kernel (which lane-pads its own score tiles to 128), so
    a 64-multiple (676 -> 704, +4.1% rows) was expected to capture a tiling
    win — but the chip A/B measured it 0.52% SLOWER e2e on CRIS b64@416
    (PERF_r04/ab_cris_padseq2.log: paired ratio 0.9948 over 6 windows; the
    decoder is a small share of the step and the extra rows cost more than
    the alignment saves at multiple=64). Decoder padding is therefore
    OPT-IN (TUNEVLSEG_PAD_SEQ=1, kept for tests and future shapes); the
    tower's 128-pad above stays "auto" — its +1.3% e2e flagship win was
    measured separately (CLAUDE.md r2)."""
    mode = os.environ.get("TUNEVLSEG_PAD_SEQ", "auto")
    if mode != "1" or s % multiple == 0 or s < _PAD_MIN_SEQ:
        return None
    return (s + multiple - 1) // multiple * multiple


class CLIPVisionTower(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.config
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(1.0), (c.hidden_size,))
        # stored at the pretraining grid; resized at trace time for other sizes
        num_positions = (c.image_size // c.patch_size) ** 2 + 1
        self.position_embedding = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (num_positions, c.hidden_size))
        self.patch_proj = self.param(
            "patch_proj", nn.initializers.lecun_normal(),
            (c.patch_size * c.patch_size * c.num_channels, c.hidden_size))
        self.pre_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                          dtype=self.dtype, name="pre_layernorm")
        self.layers = [
            PreNormEncoderLayer(c.num_heads, c.intermediate_size, c.hidden_act,
                                c.layer_norm_eps, dtype=self.dtype,
                                name=f"layers_{i}")
            for i in range(c.num_layers)
        ]
        self.post_layernorm = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                           dtype=self.dtype, name="post_layernorm")

    def embed_patches(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, C, H, W) -> (B, 1 + hw, D) with CLS token and resized pos-emb."""
        c = self.config
        b, ch, h, w = pixel_values.shape
        p = c.patch_size
        gh, gw = h // p, w // p
        # space-to-depth: (B, C, gh, p, gw, p) -> (B, gh*gw, C*p*p)
        x = pixel_values.reshape(b, ch, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, ch * p * p)
        # channel-major flatten order must match Conv2d weight layout
        # (out, in, kh, kw) -> converter flattens identically.
        patches = jnp.dot(x.astype(self.dtype),
                          jnp.asarray(self.patch_proj, self.dtype),
                          preferred_element_type=jnp.float32).astype(self.dtype)

        cls = jnp.broadcast_to(
            jnp.asarray(self.class_embedding, self.dtype)[None, None],
            (b, 1, c.hidden_size))
        embeds = jnp.concatenate([cls, patches], axis=1)

        pos = jnp.asarray(self.position_embedding, jnp.float32)
        grid = c.image_size // p
        if (gh, gw) != (grid, grid):
            cls_pos, patch_pos = pos[:1], pos[1:]
            patch_pos = patch_pos.reshape(grid, grid, -1).transpose(2, 0, 1)
            patch_pos = resize_2d(patch_pos, (gh, gw), "bicubic")
            patch_pos = patch_pos.transpose(1, 2, 0).reshape(gh * gw, -1)
            pos = jnp.concatenate([cls_pos, patch_pos], axis=0)
        return embeds + pos[None].astype(self.dtype)

    def __call__(
        self,
        pixel_values: jnp.ndarray,                  # (B, C, H, W)
        visual_ctx: Optional[jnp.ndarray] = None,   # (depth, n, D)
        prompt_depth: int = 0,
        extract_layers: Optional[Sequence[int]] = None,
        early_exit: bool = False,
    ):
        """Returns (hidden_states_list, last_hidden_state, pooled_output).

        `hidden_states_list[i]` is the input to layer i (i.e. index 0 is the
        embedding output), matching HF `output_hidden_states=True` indexing so
        `extract_layers` values select `hidden_states_list[i + 1]`
        (coop_clipseg.py:361-363).

        With `early_exit=True` layers beyond max(extract_layers) are skipped
        statically and (last, pooled) are returned as None
        (vpt_clipseg.py:129-131, 190-192).
        """
        x = self.embed_patches(pixel_values)

        num_ctx = 0
        if visual_ctx is not None:
            num_ctx = visual_ctx.shape[-2]
            ctx0 = jnp.broadcast_to(visual_ctx[0][None],
                                    (x.shape[0], *visual_ctx.shape[1:]))
            x = jnp.concatenate([x, ctx0.astype(x.dtype)], axis=1)

        # MXU seq padding (see _padded_len): the tower runs at the aligned
        # length; every EXPOSED state (hidden_states entries, last, pooled)
        # is sliced back to s_real, and attention masks the pad keys — the
        # padded run is numerically identical to the unpadded one.
        s_real = x.shape[1]
        s_run = _padded_len(s_real)
        if s_run is not None:
            x = jnp.pad(x, ((0, 0), (0, s_run - s_real), (0, 0)))
        kv_valid = s_real if s_run is not None else None

        x = self.pre_layernorm(x)
        # sequence-parallel residual stream (no-op unless enabled): shard the
        # LN/residual/ctx-write regions over the model axis so GSPMD splits
        # the per-block TP all-reduce into reduce-scatter + all-gather.
        x = activation_sharding.constrain(x)

        hidden_states = [x[:, :s_real]]
        max_layer = (max(extract_layers) if (early_exit and extract_layers)
                     else len(self.layers))
        for i, layer in enumerate(self.layers, start=1):
            x = activation_sharding.constrain(
                remat.layer_call(layer, x, kv_valid=kv_valid))
            if visual_ctx is not None and i < prompt_depth:
                ctx_i = jnp.broadcast_to(visual_ctx[i][None],
                                         (x.shape[0], *visual_ctx.shape[1:]))
                x = x.at[:, s_real - num_ctx:s_real].set(ctx_i.astype(x.dtype))
            hidden_states.append(x[:, :s_real])
            if i > max_layer:
                break

        if early_exit and extract_layers and max(extract_layers) < len(self.layers):
            return hidden_states, None, None

        pooled = self.post_layernorm(x[:, 0])
        return hidden_states, x[:, :s_real], pooled
