"""TransformerSegmentor parity vs the reference (f64 oracle, tiny CLIPModel)."""
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
from tunevlseg_tpu.convert.trans_segmentor import convert_trans_segmentor
from tunevlseg_tpu.models.trans_segmentor.model import (TransformerSegmentor,
                                                        TransSegmentorConfig)

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not (REFERENCE / "src").is_dir(),
                                reason="reference repo not mounted")


def tiny_clip_model():
    from transformers import CLIPConfig, CLIPModel
    cfg = CLIPConfig(
        text_config={"vocab_size": 99, "hidden_size": 16,
                     "num_hidden_layers": 2, "num_attention_heads": 2,
                     "intermediate_size": 32, "max_position_embeddings": 77,
                     "eos_token_id": 2},
        vision_config={"hidden_size": 24, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 48,
                       "patch_size": 16, "image_size": 32},
        projection_dim=20)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    return CLIPModel(cfg)


@pytest.mark.parametrize("use_existing_proj", [True, False])
def test_trans_segmentor_parity(use_existing_proj):
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import src.models.core_models.trans_segmentor.encoder as enc_mod
    from src.models.components.pre_cross_attn_decoder import (
        PreCrossAttentionTransformerDecoderLayer)
    from src.models.core_models.trans_segmentor import TransformerSegmentor \
        as RefSegmentor

    clip = tiny_clip_model()
    proj_dim = 20 if use_existing_proj else 24

    orig = enc_mod.AutoModel.from_pretrained
    enc_mod.AutoModel.from_pretrained = staticmethod(lambda *a, **k: clip)
    try:
        torch.manual_seed(1)
        dec_layer = PreCrossAttentionTransformerDecoderLayer(
            d_model=proj_dim, nhead=2, dim_feedforward=16, dropout=0.0,
            activation=torch.nn.GELU(approximate="none"), batch_first=True,
            norm_first=True)
        ref = RefSegmentor(
            pretrained_model_name_or_path="x",
            use_existing_proj=use_existing_proj,
            freeze_encoders=True, add_pos_enc=True,
            transformer_decoder=torch.nn.TransformerDecoder(
                dec_layer, num_layers=2,
                norm=torch.nn.LayerNorm(proj_dim)),
            num_upsampler_layers=2,
            upsampler_act=torch.nn.ReLU(),
            upsampler_norm="layer",
            image_size=None, num_output_channels=1,
            output_bias=-1.5).double().eval()
    finally:
        enc_mod.AutoModel.from_pretrained = orig

    rng = np.random.default_rng(2)
    pixel = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(3, 98, size=(2, 10)).astype(np.int64)
    ids[:, 0] = 1
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    ids[1, 7:] = 0

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        with torch.no_grad():
            ref_out = ref({"input_ids": torch.tensor(ids),
                           "attention_mask": torch.tensor(mask)},
                          torch.tensor(pixel, dtype=torch.float64)).numpy()
    finally:
        torch.set_default_dtype(prev)

    # decoder_activation="relu": torch's TransformerDecoder deepcopy resets
    # module-type activations (the configured GELU) to F.relu — quirk mirrored
    from tunevlseg_tpu.models.clip.config import CLIPTextConfig
    cfg = TransSegmentorConfig.tiny(
        # match the 99-vocab torch oracle above (the tiny DEFAULT now uses
        # the real 49408 vocab so real BPE ids survive the CLI debug hook)
        text=CLIPTextConfig(vocab_size=99, hidden_size=16, num_layers=2,
                            num_heads=2, intermediate_size=32),
        use_existing_proj=use_existing_proj, add_pos_enc=True,
        decoder_num_layers=2, decoder_num_heads=2, decoder_dim_feedforward=16,
        decoder_dropout=0.0, decoder_activation="relu",
        num_upsampler_layers=2, output_bias=-1.5)
    params = convert_trans_segmentor(
        torch_state_dict_to_numpy(ref.state_dict()), cfg)
    model = TransformerSegmentor(cfg)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(pixel), jnp.asarray(mask)))
    assert got.shape == ref_out.shape == (2, 1, 32, 32)
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=1e-3)


def test_siglip_encoder_family_forward():
    """SigLIP towers drive the segmentor end-to-end (no oracle: HF SigLIP
    parity is covered indirectly by structure; this guards shapes/finiteness
    and the no-CLS square-sequence path)."""
    import jax

    cfg = TransSegmentorConfig.tiny(encoder_family="siglip",
                                    use_existing_proj=False,
                                    decoder_activation="relu")
    model = TransformerSegmentor(cfg)
    rng = np.random.default_rng(0)
    pixel = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(3, 98, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                           jnp.asarray(pixel), jnp.asarray(mask))
    out = model.apply(variables, jnp.asarray(ids), jnp.asarray(pixel),
                      jnp.asarray(mask))
    assert out.shape == (2, 1, 32, 32)
    assert bool(jnp.isfinite(out).all())


def test_upsampler_nhwc_equivalence():
    """The channels-last upsampler (r4 conv-floor treatment) must match the
    NCHW formulation on IDENTICAL params — including the per-stage full
    (C, H, W) LayerNorm affine, whose params keep the layout-independent
    shape (_SampleNormNHWC)."""
    import jax

    from tunevlseg_tpu.models.trans_segmentor.model import Upsampler

    for norm in ("layer", "group", None):
        import dataclasses as dc
        cfg = dc.replace(TransSegmentorConfig.tiny(), image_size=64,
                         projection_dim=20, num_upsampler_layers=2,
                         upsampler_norm=norm, upsampler_group_channels=5)
        a = Upsampler(cfg, layout="nchw")
        b = Upsampler(cfg, layout="nhwc")
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 20, 4, 4)), jnp.float32)
        va = a.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(b.init(jax.random.PRNGKey(0), x))
                == jax.tree_util.tree_structure(va))
        out_a = a.apply(va, x)
        out_b = b.apply(va, x)
        assert out_a.shape == out_b.shape
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=2e-5, rtol=1e-5)


def test_upsampler_fused_pad_equivalence(rng):
    """Fused replicate pad (resize matmuls with duplicated edge rows,
    default ON — ops/image._pad_matrix) is bitwise the legacy
    jnp.pad+conv path, with an identical parameter tree.
    PERF_r05/micro_upsampler_variants.log: the explicit pad measured ~2x
    the zero-pad conv at the production shapes."""
    import os

    import jax
    import jax.tree_util as jtu

    from tunevlseg_tpu.models.trans_segmentor.model import (
        TransSegmentorConfig, Upsampler)
    from tunevlseg_tpu.ops.image import resize_2d

    x = jnp.asarray(rng.normal(size=(2, 7, 13, 13)), jnp.bfloat16)
    a = resize_2d(x, (22, 22), "bilinear", out_pad=1)
    b = jnp.pad(resize_2d(x, (22, 22), "bilinear"),
                ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    assert bool(jnp.all(a == b))

    cfg = TransSegmentorConfig.tiny()
    xin = jnp.asarray(
        rng.normal(size=(2, cfg.effective_projection_dim, 2, 2)),
        jnp.float32)
    prev = os.environ.get("TUNEVLSEG_UPSAMPLER_FUSED_PAD")
    try:
        os.environ["TUNEVLSEG_UPSAMPLER_FUSED_PAD"] = "0"
        legacy = Upsampler(cfg)
        v0 = legacy.init(jax.random.PRNGKey(0), xin)
        y0 = legacy.apply(v0, xin)
        os.environ["TUNEVLSEG_UPSAMPLER_FUSED_PAD"] = "1"
        fused = Upsampler(cfg)
        v1 = fused.init(jax.random.PRNGKey(0), xin)
        assert jtu.tree_structure(v0) == jtu.tree_structure(v1)
        y1 = fused.apply(v0, xin)  # legacy params through the fused path
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
        # grads agree too (the bwd runs through the augmented matrices)
        g0 = jax.grad(lambda v: jnp.sum(legacy.apply(v, xin) ** 2))(v0)
        g1 = jax.grad(lambda v: jnp.sum(fused.apply(v, xin) ** 2))(v0)
        for l0, l1 in zip(jtu.tree_leaves(g0), jtu.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                       rtol=1e-6, atol=1e-6)
    finally:
        if prev is None:
            os.environ.pop("TUNEVLSEG_UPSAMPLER_FUSED_PAD", None)
        else:
            os.environ["TUNEVLSEG_UPSAMPLER_FUSED_PAD"] = prev
