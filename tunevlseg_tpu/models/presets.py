"""Named model presets mirroring the reference's canonical configurations.

The flagship benchmark model is CLIPSeg ViT-B/16 ("CIDAS/clipseg-rd64",
reference configs/experiment/coop/clipseg.yaml: model_pretrained_path) with
CoOp prompt tuning at img 352², batch 64 (BASELINE.md canonical recipe).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from tunevlseg_tpu.models.clip.config import (CLIPSegConfig, CLIPTextConfig,
                                              CLIPVisionConfig)
from tunevlseg_tpu.models.clipseg.model import (CLIPSegForSegmentation,
                                                strategy_additive_mode)
from tunevlseg_tpu.models.prompt.learners import LEARNER_REGISTRY
from tunevlseg_tpu.training.optim import FreezeSpec


def clipseg_rd64_config(complex_head: bool = False) -> CLIPSegConfig:
    """CIDAS/clipseg-rd64(-refined): CLIP ViT-B/16 + 512-wide text tower."""
    return CLIPSegConfig(
        text=CLIPTextConfig(),          # 512 hidden, 12 layers, 8 heads
        vision=CLIPVisionConfig(),      # ViT-B/16: 768 hidden, 12 layers
        projection_dim=512,
        extract_layers=(3, 6, 9),
        reduce_dim=64,
        decoder_num_heads=4,
        decoder_intermediate_size=2048,
        conditional_layer=0,
        complex_transposed_convolution=complex_head,
    )


def default_learner_kwargs(strategy: str, cfg: CLIPSegConfig) -> dict:
    """Per-strategy dims wired from the model config, as the thin wrapper
    ctors do in the reference (maple_clipseg.py:11-25 etc.)."""
    t, v, p = cfg.text.hidden_size, cfg.vision.hidden_size, cfg.projection_dim
    return {
        "coop": dict(context_dim=t),
        "cocoop": dict(context_dim=t, visual_dim=p, norm_image_features=False,
                       use_unified_projection=False, intermediate_dims=(64,),
                       use_proj_norm=True),
        "vpt": dict(context_dim=v),
        "maple": dict(context_dim=t, visual_dim=v,
                      use_unified_projection=False, intermediate_dims=(64,),
                      use_proj_norm=True),
        "shared_separate": dict(context_dim=64, textual_dim=t, visual_dim=v,
                                use_unified_projection=False,
                                use_proj_norm=True),
        "shared_attn": dict(context_dim=t + v, textual_dim=t, visual_dim=v,
                            use_unified_projection=False, proj_num_heads=16,
                            proj_dim_feedforward=1536, proj_dropout=0.25),
    }[strategy]


def cris_rn50_config(img_size: int = 416) -> "CRISConfig":
    """The canonical CRIS recipe: CLIP RN50 + FPN/decoder/projector head
    (reference configs/model/coop/cris.yaml:5-18)."""
    from tunevlseg_tpu.models.cris.model import CRISConfig

    return CRISConfig(img_size=img_size)


def build_cris(
    strategy: Optional[str] = "coop",
    prompt_depth: int = 1,
    num_context: int = 4,
    config=None,
    use_new_last_layer: bool = True,
    freeze_all: bool = True,
    no_freeze_last_layer: bool = False,
    freeze_encoder: Optional[bool] = None,
    dtype: Any = jnp.float32,
    learner_overrides: Optional[dict] = None,
    initializer_embeddings=None,
):
    """CRIS + CoOp/CoCoOp (the only strategies the reference wires to CRIS).

    The learner's context width is the TEXT transformer width (the reference
    passes word_dim but only ever runs with a text initializer whose
    embeddings are transformer-width — coop_cris.py:42-47)."""
    from tunevlseg_tpu.models.cris.model import CRISConfig, CRISForSegmentation
    from tunevlseg_tpu.models.prompt.learners import CoCoOpLearner, CoOpLearner

    cfg = config or cris_rn50_config()
    learner = None
    if strategy not in (None, "e2e"):
        common = dict(prompt_depth=prompt_depth, num_context=num_context,
                      context_dim=cfg.transformer_width, dtype=dtype,
                      initializer_embeddings=initializer_embeddings)
        if strategy == "coop":
            learner = CoOpLearner(**common)
        elif strategy == "cocoop":
            learner = CoCoOpLearner(
                visual_dim=cfg.embed_dim, norm_image_features=False,
                use_unified_projection=False, intermediate_dims=(64,),
                use_proj_norm=True, **{**common,
                                       **(learner_overrides or {})})
        else:
            raise ValueError(f"CRIS supports coop/cocoop, got {strategy}")
        learner.check_depth(prompt_depth, cfg.transformer_layers)
    bn_train = strategy in (None, "e2e")  # torch train-mode BN for e2e runs
    model = CRISForSegmentation(
        cfg, learner=learner,
        additive_mode=("residual" if use_new_last_layer
                       and strategy not in (None, "e2e") else "none"),
        bn_train=bn_train, dtype=dtype)
    spec = FreezeSpec(
        freeze_all=freeze_all if strategy not in (None, "e2e") else False,
        # CRIS default: frozen CLIP towers (ref cris_model/__init__.py:36,
        # freeze_encoder=True); overridable for the zss surface
        freeze_encoder=(strategy in (None, "e2e") if freeze_encoder is None
                        else freeze_encoder),
        no_freeze_last_layer=no_freeze_last_layer,
        use_new_last_layer=use_new_last_layer and strategy not in (None, "e2e"),
        family="cris")
    return model, spec


def build_clipseg(
    strategy: Optional[str] = "coop",
    prompt_depth: int = 1,
    num_context: int = 4,
    config: Optional[CLIPSegConfig] = None,
    use_new_last_layer: bool = True,
    freeze_all: bool = True,
    no_freeze_last_layer: bool = False,
    freeze_encoder: Optional[bool] = None,
    freeze_decoder: bool = False,
    dtype: Any = jnp.float32,
    learner_overrides: Optional[dict] = None,
    initializer_embeddings=None,
) -> tuple[CLIPSegForSegmentation, FreezeSpec]:
    """Build the model + freeze spec for a strategy (None = e2e fine-tune)."""
    cfg = config or clipseg_rd64_config()
    learner = None
    if strategy is not None and strategy != "e2e":
        kwargs = default_learner_kwargs(strategy, cfg)
        kwargs.update(learner_overrides or {})
        if strategy in ("coop", "cocoop", "maple") and \
                initializer_embeddings is not None:
            kwargs["initializer_embeddings"] = initializer_embeddings
        learner = LEARNER_REGISTRY[strategy](
            prompt_depth=prompt_depth, num_context=num_context,
            dtype=dtype, **kwargs)
        learner.check_depth(prompt_depth,
                            min(cfg.text.num_layers, cfg.vision.num_layers))
    model = CLIPSegForSegmentation(
        cfg, learner=learner,
        additive_mode=strategy_additive_mode(strategy, use_new_last_layer),
        dtype=dtype)
    spec = FreezeSpec(
        freeze_all=freeze_all if strategy not in (None, "e2e") else False,
        # zss surface (ref configs/model/clipseg_zss.yaml): stock net with
        # frozen CLIP towers, trainable decoder
        freeze_encoder=bool(freeze_encoder),
        freeze_decoder=freeze_decoder,
        no_freeze_last_layer=no_freeze_last_layer,
        use_new_last_layer=use_new_last_layer and strategy not in (None, "e2e"),
        complex_head=cfg.complex_transposed_convolution)
    return model, spec
