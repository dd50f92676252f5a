"""CRIS parity: our Flax CRIS vs the reference torch CRIS/COOPCRIS (f64
oracle) on identical random weights — covers the ModifiedResNet pyramid,
CRIS AttentionPool2d (incl. bicubic pos-emb resize), text transformer with
key-padding masks, FPN fusion, cross-attention decoder, dynamic-conv
projector, align_corners=True upsample, and the CRIS prompt quirks."""
import functools
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tunevlseg_tpu.convert.cris import convert_cris
from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
from tunevlseg_tpu.models.cris.model import CRISConfig, CRISForSegmentation
from tunevlseg_tpu.models.prompt.learners import CoCoOpLearner, CoOpLearner

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not (REFERENCE / "src").is_dir(),
                                reason="reference repo not mounted")

TOL = 5e-4


def make_reference_cris(cfg: CRISConfig, strategy=None, learner_kwargs=None,
                        wrapper_kwargs=None, seed=0):
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from src.models.components.cris_model import CRIS
    from src.models.components.cris_model import clip as ref_clip
    from src.models.components.cris_model.clip import CLIP
    from src.models.core_models.coop.coop_cris import COOPCRIS
    from src.models.core_models.coop.context_learner import (
        CoCoOpContextLearner, CoOpContextLearner)

    # the vendored fp16-handling LayerNorm casts inputs to f32, which breaks
    # the f64 oracle (mixed dtype); use the plain layer norm instead
    ref_clip.LayerNorm.forward = torch.nn.LayerNorm.forward

    torch.manual_seed(seed)
    clip = CLIP(cfg.embed_dim, cfg.image_resolution, tuple(cfg.vision_layers),
                cfg.vision_width, None, cfg.context_length, cfg.vocab_size,
                cfg.transformer_width, cfg.transformer_heads,
                cfg.transformer_layers).float()

    model_cfg = dict(
        clip_pretrain=None, fpn_in=list(cfg.fpn_in), fpn_out=list(cfg.fpn_out),
        vis_dim=cfg.vis_dim, word_dim=cfg.embed_dim, num_layers=cfg.num_layers,
        num_head=cfg.num_head, dim_ffn=cfg.dim_ffn, dropout=cfg.dropout,
        return_intermediate=False, img_size=cfg.img_size, freeze_encoder=True)

    orig = CRIS.get_backbone
    CRIS.get_backbone = staticmethod(lambda *_: clip)
    try:
        if strategy is None:
            ref = CRIS(**model_cfg)
        else:
            lcls = {"coop": CoOpContextLearner,
                    "cocoop": CoCoOpContextLearner}[strategy]
            ref = COOPCRIS(model_cfg=model_cfg,
                           context_learner=functools.partial(
                               lcls, **(learner_kwargs or {})),
                           **(wrapper_kwargs or {}))
    finally:
        CRIS.get_backbone = orig
    return ref.double().eval()


def make_inputs(cfg: CRISConfig, batch=2, img=None, seq=12, seed=1):
    rng = np.random.default_rng(seed)
    img = img or cfg.img_size
    pixel = rng.normal(size=(batch, 3, img, img)).astype(np.float32)
    ids = rng.integers(3, cfg.vocab_size - 1, size=(batch, seq)).astype(np.int64)
    ids[:, 0] = 1
    for b, l in enumerate((seq, seq - 3)):
        ids[b, l - 1] = cfg.vocab_size - 1
        ids[b, l:] = 0
    mask = (ids != 0).astype(np.int64)
    return pixel, ids, mask


def run_ref(ref, ids, mask, pixel):
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            out = ref({"input_ids": torch.tensor(ids),
                       "attention_mask": torch.tensor(mask)},
                      torch.tensor(pixel, dtype=torch.float64))
    finally:
        torch.set_default_dtype(prev)
    return out.numpy()


@pytest.mark.parametrize("img_mult", [1.0, 1.5])
def test_e2e_cris_parity(img_mult):
    """Plain CRIS; img_mult=1.5 exercises the attnpool pos-emb resize."""
    cfg = CRISConfig.tiny(img_size=int(64 * img_mult))
    ref = make_reference_cris(cfg)
    pixel, ids, mask = make_inputs(cfg)
    ref_out = run_ref(ref, ids, mask, pixel)

    converted = convert_cris(torch_state_dict_to_numpy(ref.state_dict()), cfg)
    model = CRISForSegmentation(cfg)
    got = np.asarray(model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(ids), jnp.asarray(pixel), jnp.asarray(mask)))
    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got, ref_out, atol=TOL, rtol=1e-3)


def test_backbone_nhwc_equivalence():
    """The NHWC/einsum backbone (r4 conv-floor fix) must be numerically
    equivalent to the NCHW formulation on IDENTICAL params — the param tree
    is layout-independent (torch OIHW weights, per-channel BN vectors)."""
    from tunevlseg_tpu.models.cris.resnet import ModifiedResNet

    kw = dict(layers=(1, 1, 1, 1), output_dim=32, heads=4,
              input_resolution=64, width=16)
    m_nchw = ModifiedResNet(layout="nchw", **kw)
    m_nhwc = ModifiedResNet(layout="nhwc", **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 64, 64)),
                    jnp.float32)
    variables = m_nchw.init(jax.random.PRNGKey(0), x)
    # identical param trees: nhwc init must produce the same structure
    chex_tree = jax.tree_util.tree_structure(variables)
    assert jax.tree_util.tree_structure(
        m_nhwc.init(jax.random.PRNGKey(0), x)) == chex_tree
    outs_a = m_nchw.apply(variables, x)
    outs_b = m_nhwc.apply(variables, x)
    for a, b in zip(outs_a, outs_b):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("strategy,depth", [("coop", 1), ("coop", 2),
                                            ("cocoop", 1)])
def test_coop_cris_parity(strategy, depth):
    cfg = CRISConfig.tiny()
    lk = dict(prompt_depth=depth, num_context=4, context_initializer=None,
              vector_std=0.02)
    if strategy == "cocoop":
        lk.update(norm_image_features=False, use_unified_projection=False,
                  intermediate_dim=8, use_proj_norm=True, use_lora_proj=False)
    ref = make_reference_cris(
        cfg, strategy, lk,
        wrapper_kwargs=dict(freeze_all=True, use_new_last_layer=True))
    pixel, ids, mask = make_inputs(cfg)
    ref_out = run_ref(ref, ids, mask, pixel)

    converted = convert_cris(torch_state_dict_to_numpy(ref.state_dict()), cfg,
                             strategy)
    common = dict(prompt_depth=depth, num_context=4,
                  context_dim=cfg.transformer_width)
    if strategy == "coop":
        learner = CoOpLearner(**common)
    else:
        learner = CoCoOpLearner(visual_dim=cfg.embed_dim,
                                norm_image_features=False,
                                use_unified_projection=False,
                                intermediate_dims=(8,), use_proj_norm=True,
                                **common)
    model = CRISForSegmentation(cfg, learner=learner, additive_mode="residual")
    got = np.asarray(model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        jnp.asarray(ids), jnp.asarray(pixel), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref_out, atol=TOL, rtol=1e-3)


def test_additive_head_fused_pad_equivalence():
    """Fused replicate pad in the CRIS additive residual head (r5,
    ops/image out_pad): identical param tree, outputs equal up to XLA
    fusion reassociation (<=2 ulp f32; the isolated resize/conv pair is
    bitwise — PERF_r05/micro_upsampler_variants.log motivates the fusion,
    docs/ROOFLINE.md r5 section has the A/B)."""
    import os

    import jax.tree_util as jtu

    from tunevlseg_tpu.models.cris.model import (CRISConfig,
                                                 CRISForSegmentation)
    from tunevlseg_tpu.models.prompt.learners import CoOpLearner

    rng = np.random.default_rng(0)
    cfg = CRISConfig.tiny()

    def build():
        return CRISForSegmentation(
            cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                     context_dim=cfg.transformer_width),
            additive_mode="residual")

    ids = rng.integers(3, cfg.vocab_size - 2,
                       size=(2, cfg.context_length)).astype(np.int32)
    ids[:, 0] = 1
    am = np.ones_like(ids)
    pix = rng.normal(size=(2, 3, cfg.img_size, cfg.img_size)
                     ).astype(np.float32)
    prev = os.environ.get("TUNEVLSEG_ADDITIVE_FUSED_PAD")
    try:
        os.environ["TUNEVLSEG_ADDITIVE_FUSED_PAD"] = "0"
        m0 = build()
        v0 = m0.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                     jnp.asarray(pix), jnp.asarray(am))
        y0 = m0.apply(v0, jnp.asarray(ids), jnp.asarray(pix),
                      jnp.asarray(am))
        os.environ["TUNEVLSEG_ADDITIVE_FUSED_PAD"] = "1"
        m1 = build()
        v1 = m1.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                     jnp.asarray(pix), jnp.asarray(am))
        assert jtu.tree_structure(v0) == jtu.tree_structure(v1)
        y1 = m1.apply(v0, jnp.asarray(ids), jnp.asarray(pix),
                      jnp.asarray(am))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=0, atol=1e-6)
    finally:
        if prev is None:
            os.environ.pop("TUNEVLSEG_ADDITIVE_FUSED_PAD", None)
        else:
            os.environ["TUNEVLSEG_ADDITIVE_FUSED_PAD"] = prev
