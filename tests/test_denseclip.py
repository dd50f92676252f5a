"""DenseCLIP component parity vs the reference models.py (mmseg stubbed)."""
import sys
import types
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tunevlseg_tpu.convert.clipseg import torch_state_dict_to_numpy
from tunevlseg_tpu.convert.denseclip import (convert_backbone,
                                             convert_context_decoder,
                                             convert_text_encoder)
from tunevlseg_tpu.models.denseclip.model import (CLIPResNetWithAttention,
                                                  CLIPTextContextEncoder,
                                                  ContextDecoder, DenseCLIP,
                                                  DenseCLIPConfig)

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not (REFERENCE / "src").is_dir(),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_models():
    """Import reference denseclip/models.py with an mmseg registry stub."""
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    mmseg = types.ModuleType("mmseg")
    models_mod = types.ModuleType("mmseg.models")
    builder = types.ModuleType("mmseg.models.builder")
    builder.BACKBONES = _Registry()
    models_mod.builder = builder
    mmseg.models = models_mod
    import importlib.machinery as mach
    for m in (mmseg, models_mod, builder):
        m.__spec__ = mach.ModuleSpec(m.__name__, None)
    sys.modules.setdefault("mmseg", mmseg)
    sys.modules.setdefault("mmseg.models", models_mod)
    sys.modules.setdefault("mmseg.models.builder", builder)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_denseclip_models",
        REFERENCE / "src/models/components/denseclip/models.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_denseclip_models"] = mod
    # models.py does `from .timm_utils import ...` — give it a package home
    mod.__package__ = ""
    src_text = (REFERENCE / "src/models/components/denseclip/models.py"
                ).read_text().replace("from .timm_utils import",
                                      "from ref_denseclip_timm import")
    timm_spec = importlib.util.spec_from_file_location(
        "ref_denseclip_timm",
        REFERENCE / "src/models/components/denseclip/timm_utils.py")
    timm_mod = importlib.util.module_from_spec(timm_spec)
    sys.modules["ref_denseclip_timm"] = timm_mod
    timm_spec.loader.exec_module(timm_mod)
    exec(compile(src_text, "ref_denseclip_models.py", "exec"), mod.__dict__)
    # the fp16-handling LayerNorm casts inputs to f32, breaking the f64 oracle
    mod.LayerNorm.forward = torch.nn.LayerNorm.forward
    return mod


def test_backbone_parity(ref_models):
    cfg = DenseCLIPConfig.tiny()
    torch.manual_seed(0)
    ref = ref_models.CLIPResNetWithAttention(
        layers=list(cfg.vision_layers), output_dim=cfg.embed_dim,
        input_resolution=cfg.input_resolution, width=cfg.vision_width
    ).double().eval()
    conv = convert_backbone(torch_state_dict_to_numpy(ref.state_dict()), cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs = ref(torch.tensor(x, dtype=torch.float64))
    model = CLIPResNetWithAttention(cfg)
    mine = model.apply({"params": conv["params"],
                        "batch_stats": conv["batch_stats"]}, jnp.asarray(x))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(mine[i]), outs[i].numpy(),
                                   atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mine[4][0]), outs[4][0].numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mine[4][1]), outs[4][1].numpy(),
                               atol=3e-4, rtol=1e-3)


def test_text_context_encoder_parity(ref_models):
    cfg = DenseCLIPConfig.tiny()
    torch.manual_seed(1)
    ref = ref_models.CLIPTextContextEncoder(
        context_length=cfg.total_context, vocab_size=cfg.vocab_size,
        transformer_width=cfg.transformer_width,
        transformer_heads=cfg.transformer_heads,
        transformer_layers=cfg.transformer_layers,
        embed_dim=cfg.embed_dim).double().eval()
    with torch.no_grad():
        ref.positional_embedding.normal_(std=0.02)
        ref.text_projection.normal_(std=0.05)
    params = convert_text_encoder(
        torch_state_dict_to_numpy(ref.state_dict()), cfg)

    rng = np.random.default_rng(1)
    k, n1, n2 = 4, cfg.text_context_length, cfg.context_length
    text = rng.integers(1, cfg.vocab_size - 1, (k, n1)).astype(np.int64)
    text[:, -1] = cfg.vocab_size - 1  # EOT = argmax
    context = rng.normal(size=(1, n2, cfg.transformer_width)) * 0.02
    with torch.no_grad():
        ref_out = ref(torch.tensor(text),
                      torch.tensor(context, dtype=torch.float64)).numpy()
    model = CLIPTextContextEncoder(cfg)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(text),
                                 jnp.asarray(context, jnp.float32)))
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=1e-3)


def test_context_decoder_parity(ref_models):
    cfg = DenseCLIPConfig.tiny()
    torch.manual_seed(2)
    ref = ref_models.ContextDecoder(
        transformer_width=cfg.decoder_width,
        transformer_heads=cfg.decoder_heads,
        transformer_layers=cfg.decoder_layers,
        visual_dim=cfg.embed_dim, dropout=0.0).double().eval()
    params = convert_context_decoder(
        torch_state_dict_to_numpy(ref.state_dict()), cfg)

    rng = np.random.default_rng(2)
    text = rng.normal(size=(2, 4, cfg.embed_dim)).astype(np.float32)
    visual = rng.normal(size=(2, 17, cfg.embed_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(text, dtype=torch.float64),
                      torch.tensor(visual, dtype=torch.float64)).numpy()
    model = ContextDecoder(cfg)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(text),
                                 jnp.asarray(visual)))
    np.testing.assert_allclose(got, ref_out, atol=3e-4, rtol=1e-3)


def test_full_denseclip_forward():
    cfg = DenseCLIPConfig.tiny()
    rng = np.random.default_rng(3)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (2, cfg.num_classes, 64, 64)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("img", [64, 96])  # 96 exercises pos-emb interpolation
def test_vit_backbone_parity(ref_models, img):
    from tunevlseg_tpu.convert.denseclip import convert_vit_backbone
    from tunevlseg_tpu.models.denseclip.model import (
        CLIPVisionTransformerBackbone)

    cfg = DenseCLIPConfig.tiny_vit()
    torch.manual_seed(4)
    ref = ref_models.CLIPVisionTransformer(
        input_resolution=cfg.input_resolution, patch_size=cfg.patch_size,
        width=cfg.vit_width, layers=cfg.vit_layers, heads=cfg.vit_heads,
        output_dim=cfg.embed_dim, out_indices=list(cfg.vit_out_indices),
        get_embeddings=True).double().eval()
    conv = convert_vit_backbone(torch_state_dict_to_numpy(ref.state_dict()),
                                cfg)

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        outs = ref(torch.tensor(x, dtype=torch.float64))
    model = CLIPVisionTransformerBackbone(cfg)
    mine = model.apply({"params": conv["params"],
                        "batch_stats": conv["batch_stats"]}, jnp.asarray(x))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(mine[i]), outs[i].numpy(),
                                   atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mine[4][0]), outs[4][0].numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(mine[4][1]), outs[4][1].numpy(),
                               atol=3e-4, rtol=1e-3)


def test_vit_denseclip_and_fpn_baseline_forward():
    from tunevlseg_tpu.models.denseclip.model import CLIPFPNBaseline

    cfg = DenseCLIPConfig.tiny_vit()
    rng = np.random.default_rng(5)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (2, cfg.num_classes, 64, 64)
    assert bool(jnp.isfinite(out).all())

    base = CLIPFPNBaseline(DenseCLIPConfig.tiny())
    v2 = base.init(jax.random.PRNGKey(1), jnp.asarray(x))
    out2 = base.apply(v2, jnp.asarray(x))
    assert out2.shape == (2, cfg.num_classes, 64, 64)


def test_slide_inference_semantics():
    """Crop == image is identical to whole inference; tiled sweep reproduces
    mmseg's clamped ceil-grid average (numpy re-derivation)."""
    from tunevlseg_tpu.models.denseclip.inference import (slide_inference,
                                                          whole_inference)

    rng = np.random.default_rng(6)
    h = w = 40
    img = rng.normal(size=(1, 3, h, w)).astype(np.float32)

    # apply_fn: logits depend on absolute pixel values so window placement
    # matters — mean-pooled channel stats broadcast over a 2-class map
    def apply_fn(x):
        x = jnp.asarray(x)
        c0 = x.mean(axis=1, keepdims=True)
        return jnp.concatenate([c0, -c0], axis=1)

    whole = np.asarray(whole_inference(apply_fn, img))
    same = np.asarray(slide_inference(apply_fn, img, (h, w), (h, w)))
    np.testing.assert_allclose(same, whole, rtol=1e-6)

    crop, stride = (24, 24), (16, 16)
    got = np.asarray(slide_inference(apply_fn, img, crop, stride))
    preds = np.zeros((1, 2, h, w)); count = np.zeros((1, 1, h, w))
    grids = lambda d, c, s: max(d - c + s - 1, 0) // s + 1
    for i in range(grids(h, crop[0], stride[0])):
        for j in range(grids(w, crop[1], stride[1])):
            y1 = min(i * stride[0], h - crop[0])
            x1 = min(j * stride[1], w - crop[1])
            window = img[:, :, y1:y1 + crop[0], x1:x1 + crop[1]]
            logits = np.asarray(apply_fn(window))
            preds[:, :, y1:y1 + crop[0], x1:x1 + crop[1]] += logits
            count[:, :, y1:y1 + crop[0], x1:x1 + crop[1]] += 1
    assert count.min() >= 1
    np.testing.assert_allclose(got, preds / count, rtol=1e-5, atol=1e-6)
