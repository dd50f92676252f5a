"""Prompt-strategy parity: our functional JAX wrappers vs the REFERENCE torch
wrappers (imported read-only as oracles) on identical random weights.

This covers the subtlest semantics in the framework (SURVEY §7 hard part #1):
context splicing, per-layer overwrites, EOS-index shifting, mask extension,
visual-prompt stripping in the decoder, and the per-strategy additive-head
blend quirks.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_oracle import (make_reference_wrapper,
                                    reference_available, run_reference)
from tests.test_clipseg_parity import make_inputs, tiny_hf_config
from tunevlseg_tpu.convert.clipseg import (config_from_hf,
                                           convert_reference_wrapper,
                                           torch_state_dict_to_numpy)
from tunevlseg_tpu.models.clipseg.model import (CLIPSegForSegmentation,
                                                strategy_additive_mode)
from tunevlseg_tpu.models.prompt.learners import (CoCoOpLearner, CoOpLearner,
                                                  MapleLearner,
                                                  SharedAttnLearner,
                                                  SharedSeparateLearner,
                                                  VPTLearner)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

TOL = 3e-4

TEXT_DIM, VIS_DIM, PROJ_DIM = 16, 24, 20


def build_ours(strategy, cfg, prompt_depth, num_context, use_new_last_layer=True):
    common = dict(prompt_depth=prompt_depth, num_context=num_context)
    learners = {
        "coop": lambda: CoOpLearner(context_dim=TEXT_DIM, **common),
        "cocoop": lambda: CoCoOpLearner(
            context_dim=TEXT_DIM, visual_dim=PROJ_DIM, norm_image_features=False,
            use_unified_projection=False, intermediate_dims=(8,),
            use_proj_norm=True, **common),
        "vpt": lambda: VPTLearner(context_dim=VIS_DIM, **common),
        "maple": lambda: MapleLearner(
            context_dim=TEXT_DIM, visual_dim=VIS_DIM,
            use_unified_projection=False, intermediate_dims=(8,),
            use_proj_norm=True, **common),
        "shared_separate": lambda: SharedSeparateLearner(
            context_dim=8, textual_dim=TEXT_DIM, visual_dim=VIS_DIM,
            use_unified_projection=False, use_proj_norm=True, **common),
        "shared_attn": lambda: SharedAttnLearner(
            context_dim=TEXT_DIM + VIS_DIM, textual_dim=TEXT_DIM,
            visual_dim=VIS_DIM, use_unified_projection=False,
            proj_num_heads=2, proj_dim_feedforward=16, proj_dropout=0.25,
            **common),
    }
    return CLIPSegForSegmentation(
        cfg, learner=learners[strategy](),
        additive_mode=strategy_additive_mode(strategy, use_new_last_layer))


def ref_learner_kwargs(strategy, prompt_depth, num_context):
    common = dict(prompt_depth=prompt_depth, num_context=num_context,
                  context_initializer=None, vector_std=0.02)
    if strategy == "cocoop":
        return dict(common, norm_image_features=False,
                    use_unified_projection=False, intermediate_dim=8,
                    use_proj_norm=True, use_lora_proj=False)
    if strategy == "maple":
        return dict(common, use_unified_projection=False, intermediate_dim=8,
                    use_proj_norm=True, use_lora_proj=False)
    if strategy == "shared_separate":
        return dict(common, shared_dim=8, use_unified_projection=False,
                    intermediate_dim=None, use_proj_norm=True)
    if strategy == "shared_attn":
        import functools
        return dict(prompt_depth=prompt_depth, num_context=num_context,
                    vector_std=0.02, use_unified_projection=False,
                    unified_projector=functools.partial(
                        torch.nn.TransformerEncoderLayer, nhead=2,
                        dim_feedforward=16, dropout=0.25, norm_first=True))
    if strategy == "vpt":
        return dict(prompt_depth=prompt_depth, num_context=num_context,
                    vector_std=0.02)
    return common


@pytest.mark.parametrize("strategy", ["coop", "cocoop", "vpt", "maple",
                                      "shared_separate", "shared_attn"])
@pytest.mark.parametrize("prompt_depth", [1, 3])
def test_strategy_parity(strategy, prompt_depth):
    num_context = 4
    hf_cfg = tiny_hf_config()
    ref = make_reference_wrapper(
        strategy, hf_cfg, ref_learner_kwargs(strategy, prompt_depth, num_context),
        wrapper_kwargs=dict(freeze_all=True, use_new_last_layer=True))
    pixel, ids, mask = make_inputs(hf_cfg)

    ref_out = run_reference(ref, ids, mask, pixel)

    cfg = config_from_hf(hf_cfg)
    params = convert_reference_wrapper(
        torch_state_dict_to_numpy(ref.state_dict()), cfg, strategy)
    model = build_ours(strategy, cfg, prompt_depth, num_context)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(pixel), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref_out, atol=TOL, rtol=1e-3)


def test_coop_new_eos_semantics():
    """Non-legacy eos pooling (config eos_token_id != 2) uses
    first-position-of-eos + context shift (coop_clipseg.py:279-288)."""
    hf_cfg = tiny_hf_config()
    hf_cfg.text_config.eos_token_id = 98
    ref = make_reference_wrapper(
        "coop", hf_cfg, ref_learner_kwargs("coop", 2, 4),
        wrapper_kwargs=dict(freeze_all=True, use_new_last_layer=False))
    pixel, ids, mask = make_inputs(hf_cfg)  # EOT already = 98 = vocab-1

    ref_out = run_reference(ref, ids, mask, pixel)

    cfg = config_from_hf(hf_cfg)
    assert cfg.text.eos_token_id == 98
    params = convert_reference_wrapper(
        torch_state_dict_to_numpy(ref.state_dict()), cfg, "coop")
    model = build_ours("coop", cfg, 2, 4, use_new_last_layer=False)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(pixel), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref_out, atol=TOL, rtol=1e-3)


def test_long_text_truncation_parity():
    """Full-length (max_position) text: splice must drop mid tokens while
    preserving the last token (coop_context_learner.py:150-160)."""
    hf_cfg = tiny_hf_config()
    ref = make_reference_wrapper(
        "coop", hf_cfg, ref_learner_kwargs("coop", 1, 4),
        wrapper_kwargs=dict(freeze_all=True, use_new_last_layer=False))
    pixel, ids, mask = make_inputs(hf_cfg, seq=77)

    ref_out = run_reference(ref, ids, mask, pixel)

    cfg = config_from_hf(hf_cfg)
    params = convert_reference_wrapper(
        torch_state_dict_to_numpy(ref.state_dict()), cfg, "coop")
    model = build_ours("coop", cfg, 1, 4, use_new_last_layer=False)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(pixel), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref_out, atol=TOL, rtol=1e-3)
