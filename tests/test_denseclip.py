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


@pytest.mark.parametrize("variant", ["rn50", "rn101"])
def test_backbone_parity(ref_models, variant):
    """tiny = RN50 structure; the rn101 case keeps tiny widths but the
    res101 recipe's STRUCTURE (denseclip_fpn_res101_512x512_80k.py:16):
    a deep stage 3 with >=11 blocks (two-digit torch block indices — the
    converter must not break at resblocks past .9) and a joint dim that
    differs from RN50's (output_dim 512 vs 1024 at full size)."""
    cfg = (DenseCLIPConfig.tiny() if variant == "rn50"
           else DenseCLIPConfig.tiny(vision_layers=(1, 1, 11, 1),
                                     embed_dim=16))
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


def test_seg_ce_and_denseclip_loss_match_torch_f64():
    """f64 oracle for the training loss (reference denseclip.py:206-258 +
    mmseg CrossEntropyLoss): decode CE with ignore_index=255 and the
    avg_non_ignore=False quirk (mean divides by ALL pixels), plus the
    identity-head aux CE over score_map/tau resized to the label grid at
    weight 0.4."""
    import torch.nn.functional as F

    from tunevlseg_tpu.models.denseclip.loss import (cross_entropy_seg,
                                                     denseclip_losses)

    rng = np.random.default_rng(0)
    B, K, H, W = 2, 5, 16, 16
    logits = rng.normal(size=(B, K, H, W)).astype(np.float32)
    score = (0.3 * rng.normal(size=(B, K, 4, 4))).astype(np.float32)
    labels = rng.integers(0, K, size=(B, H, W)).astype(np.int32)
    labels[0, :5] = 255                      # ignored region
    labels[1, :, :3] = 255

    lt = torch.tensor(logits, dtype=torch.float64)
    lab = torch.tensor(labels, dtype=torch.long)
    el = F.cross_entropy(lt, lab, ignore_index=255, reduction="none")
    ref_decode = float(el.sum() / lab.numel())          # mean over ALL px
    id_t = F.interpolate(torch.tensor(score, dtype=torch.float64) / 0.07,
                         size=(H, W), mode="bilinear", align_corners=False)
    el2 = F.cross_entropy(id_t, lab, ignore_index=255, reduction="none")
    ref_identity = float(el2.sum() / lab.numel())

    got = denseclip_losses(jnp.asarray(logits), jnp.asarray(score),
                           jnp.asarray(labels))
    np.testing.assert_allclose(float(got["loss_decode"]), ref_decode,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got["loss_aux_identity"]), ref_identity,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(got["loss"]),
                               ref_decode + 0.4 * ref_identity,
                               rtol=1e-4, atol=1e-4)

    # the OTHER averaging mode must equal torch's reduction="mean"
    ref_mean = float(F.cross_entropy(lt, lab, ignore_index=255))
    got_mean = float(cross_entropy_seg(jnp.asarray(logits),
                                       jnp.asarray(labels),
                                       avg_non_ignore=True))
    np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-5, atol=1e-5)
    # and the two modes genuinely differ on this input
    assert abs(ref_mean - ref_decode) > 1e-3


def test_denseclip_train_smoke():
    """Tiny-config training: 20 jitted steps on the CPU mesh decrease the
    loss; the text encoder (lr_mult 0.0) never moves; backbone BN running
    stats update (bn_train); the poly+warmup schedule matches mmcv at the
    endpoints."""
    from tunevlseg_tpu.models.denseclip.model import DenseCLIP
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.denseclip_task import (DenseCLIPTask,
                                                       poly_warmup_schedule)

    cfg = DenseCLIPConfig.tiny(head_dropout=0.0)
    rng = np.random.default_rng(1)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids, bn_train=True)
    task = DenseCLIPTask(model, learning_rate=3e-3, total_iters=200,
                         warmup_iters=5)

    B, H = 8, 64
    images = rng.normal(size=(B, 3, H, H)).astype(np.float32)
    labels = np.zeros((B, H, H), np.int32)
    yy, xx = np.mgrid[:H, :H]
    labels[:, :] = ((yy // 16 + xx // 16) % cfg.num_classes)
    labels[:, :4] = 255                       # ignored band
    batch = {"image": images, "label": labels}

    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    text0 = jax.tree_util.tree_map(np.asarray, frozen["params"])
    bn0 = jax.tree_util.tree_map(np.asarray, state.model_state)
    assert "text_encoder" not in state.trainable
    assert "batch_stats" in state.model_state

    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    train, evals = task.compile_steps(mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)

    losses = []
    for _ in range(20):
        state, m = train(state, frozen, sharded)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(m["acc"]) <= 1.0

    # text encoder untouched; BN stats moved
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
        text0, frozen["params"])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()),
        bn0, state.model_state)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    ev = evals(state, frozen, sharded)
    assert np.isfinite(float(ev["loss"]))

    # mmcv poly schedule endpoints
    sched = poly_warmup_schedule(1e-4, 80_000, warmup_iters=1500,
                                 warmup_ratio=1e-6)
    np.testing.assert_allclose(float(sched(0)), 1e-4 * 1e-6,
                               rtol=0.05)  # f32 rounding of (1 - 1e-6)
    np.testing.assert_allclose(float(sched(1500)),
                               (1e-4 - 1e-6) * (1 - 1500 / 80_000) ** 0.9
                               + 1e-6, rtol=1e-5)
    np.testing.assert_allclose(float(sched(80_000)), 1e-6, rtol=1e-5)


def test_denseclip_multistep_matches_sequential():
    """compile_train_multistep(K=2) (steps-per-execution) produces the same
    trainable params and mean metrics as two sequential launches — the scan
    changes dispatch, never semantics (dropout rngs fold from state.step
    either way).

    Tested under SGD: the scan body and the single step compile into
    DIFFERENT fusions, whose f32 reassociation perturbs near-zero gradients
    by ~1e-7, and Adam turns any near-zero-grad perturbation into a full
    g/|g|-scale update (sign flip) — full-finetune DenseCLIP has millions
    of such params at init. SGD keeps params linear in grads so the
    structural equivalence is visible; the Adam flavor of this invariant is
    covered by test_multistep_scan_matches_sequential (prompt-only CLIPSeg,
    well-conditioned grads)."""
    import optax

    from tunevlseg_tpu.models.denseclip.model import DenseCLIP
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.denseclip_task import DenseCLIPTask

    cfg = DenseCLIPConfig.tiny(head_dropout=0.0)
    rng = np.random.default_rng(3)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids, bn_train=True)
    task = DenseCLIPTask(model, learning_rate=3e-3, total_iters=200,
                         warmup_iters=5, donate_state=False)
    task.tx = optax.sgd(1e-2)         # see docstring: isolate the scan

    B, H = 8, 64
    b1 = {"image": rng.normal(size=(B, 3, H, H)).astype(np.float32),
          "label": rng.integers(0, cfg.num_classes, (B, H, H)
                                ).astype(np.int32)}
    b2 = {"image": rng.normal(size=(B, 3, H, H)).astype(np.float32),
          "label": rng.integers(0, cfg.num_classes, (B, H, H)
                                ).astype(np.int32)}

    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), b1)
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)

    train, _ = task.compile_steps(mesh)
    s_seq, m1 = train(state, frozen, mesh_lib.shard_batch(mesh, b1))
    s_seq, m2 = train(s_seq, frozen, mesh_lib.shard_batch(mesh, b2))

    from jax.sharding import NamedSharding, PartitionSpec as P
    stacked_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
    stacked = {k: jax.device_put(np.stack([b1[k], b2[k]]), stacked_sh)
               for k in b1}
    multi = task.compile_train_multistep(mesh, 2)
    s_multi, mm = multi(state, frozen, stacked)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        s_seq.trainable, s_multi.trainable)
    np.testing.assert_allclose(
        float(mm["loss"]),
        (float(m1["loss"]) + float(m2["loss"])) / 2, rtol=1e-5)
    assert int(s_multi.step) == 2


def test_denseclip_fsdp_remat_accum_step():
    """The TPU scaling levers on the DenseCLIP task: fsdp-sharded params +
    Adam state, remat, and grad accumulation compose into one finite jitted
    step with real 1/8 shards and a frozen text tower."""
    from tunevlseg_tpu.models.denseclip.model import DenseCLIP
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.denseclip_task import DenseCLIPTask

    cfg = DenseCLIPConfig.tiny(head_dropout=0.0)
    rng = np.random.default_rng(2)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids, bn_train=True)
    task = DenseCLIPTask(model, learning_rate=3e-3, total_iters=200,
                         warmup_iters=5, accumulate_grad_batches=2,
                         remat=True, grad_clip_norm=1.0)

    B, H = 8, 64
    images = rng.normal(size=(B, 3, H, H)).astype(np.float32)
    labels = ((np.mgrid[:H, :H][0] // 16) % cfg.num_classes
              )[None].repeat(B, 0).astype(np.int32)
    batch = {"image": images, "label": labels}

    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    ssh = task.state_fsdp_shardings(mesh, state)
    state = jax.tree_util.tree_map(jax.device_put, state, ssh)
    frozen = mesh_lib.replicate(mesh, frozen)
    train, evals = task.compile_steps(mesh, state_shardings=ssh)
    sharded = mesh_lib.shard_batch(mesh, batch)

    for _ in range(4):   # 2 optimizer updates at k=2
        state, m = train(state, frozen, sharded)
    assert np.isfinite(float(m["loss"]))
    n_shard = sum(
        1 for leaf in jax.tree_util.tree_leaves(state.trainable)
        if hasattr(leaf, "addressable_shards")
        and leaf.addressable_shards[0].data.size < leaf.size)
    assert n_shard >= 1
    ev = evals(state, frozen, sharded)
    assert np.isfinite(float(ev["loss"]))


def test_train_denseclip_driver_smoke(tmp_path):
    """The standalone DenseCLIP training CLI (scripts/train_denseclip.py,
    the reference's mmseg recipe): synthetic tiny run produces finite
    decreasing loss and a checkpoint."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "train_denseclip", "scripts/train_denseclip.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    final = mod.main(["--synthetic", "--tiny", "--iters", "20",
                      "--batch", "8", "--warmup-iters", "5",
                      "--lr", "3e-3", "--val-every", "10",
                      "--log-every", "5", "--spe", "4",
                      "--out", str(tmp_path / "dc")])
    assert np.isfinite(final["loss"])
    assert (tmp_path / "dc" / "checkpoints" / "last").exists()
    assert (tmp_path / "dc" / "metrics.jsonl").exists()

    # --resume (mmseg --resume-from): continues from the restored iteration
    # counter instead of restarting at 0
    final_r = mod.main(["--synthetic", "--tiny", "--iters", "28",
                        "--batch", "8", "--warmup-iters", "5",
                        "--lr", "3e-3", "--val-every", "10",
                        "--log-every", "5", "--resume",
                        "--out", str(tmp_path / "dc")])
    assert np.isfinite(final_r["loss"])
    iters = [json.loads(ln)["iter"] for ln in
             (tmp_path / "dc" / "metrics.jsonl").read_text().splitlines()]
    assert max(iters) == 28
    # the resumed run logged only NEW iterations (started past 20)
    assert min(i for i in iters if i > 20) > 20

    # ViT-backbone variant (denseclip_fpn_vit-b_640x640_80k recipe surface)
    final_vit = mod.main(["--synthetic", "--tiny", "--backbone", "vitb16",
                          "--iters", "8", "--batch", "8",
                          "--warmup-iters", "2", "--lr", "3e-3",
                          "--val-every", "8", "--log-every", "4",
                          "--out", str(tmp_path / "dcv")])
    assert np.isfinite(final_vit["loss"])

    # RN101 variant (denseclip_fpn_res101_512x512_80k recipe surface:
    # deep stage 3, joint dim != RN50's)
    final_101 = mod.main(["--synthetic", "--tiny", "--backbone", "rn101",
                          "--iters", "8", "--batch", "8",
                          "--warmup-iters", "2", "--lr", "3e-3",
                          "--val-every", "8", "--log-every", "4",
                          "--out", str(tmp_path / "dc101")])
    assert np.isfinite(final_101["loss"])


def test_denseclip_vit_train_step_with_drop_path(rng):
    """Training through the ViT backbone exercises stochastic depth
    (DropPath, reference drop_path_rate=0.1 in the vit recipe): the task
    must thread the dropout rng and produce finite grads/updates."""
    import jax

    from tunevlseg_tpu.models.denseclip.model import (DenseCLIP,
                                                      DenseCLIPConfig)
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.denseclip_task import DenseCLIPTask

    cfg = DenseCLIPConfig.tiny_vit(head_dropout=0.0, drop_path_rate=0.25)
    ids = rng.integers(1, cfg.vocab_size - 1,
                       (cfg.num_classes, cfg.text_context_length)
                       ).astype(np.int32)
    model = DenseCLIP(cfg, class_token_ids=ids)
    task = DenseCLIPTask(model, learning_rate=1e-3, total_iters=10,
                         warmup_iters=2)
    batch = {"image": rng.integers(0, 255, (8, 3, 64, 64), dtype=np.uint8)
                         .astype(np.float32),
             "label": rng.integers(0, cfg.num_classes,
                                   (8, 64, 64)).astype(np.int32)}
    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    ctx0 = np.asarray(state.trainable["contexts"])
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    train, _ = task.compile_steps(mesh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    losses = []
    for _ in range(3):
        state, metrics = train(state, frozen, sharded)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert not np.allclose(np.asarray(state.trainable["contexts"]), ctx0)
