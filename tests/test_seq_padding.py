"""MXU sequence-padding equivalence: the padded vision tower must be
numerically identical to the unpadded one (pad keys masked via static
kv_valid, exposed states sliced — models/clip/vision.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tunevlseg_tpu.models.clip import vision as vision_mod
from tunevlseg_tpu.models.clip.config import CLIPVisionConfig
from tunevlseg_tpu.nn.attention import xla_attention


@pytest.fixture
def force_pad(monkeypatch):
    # the env var is read at TRACE time (r4: import-time constant made the
    # ab_env per-variant flip a no-op), so patch the environment
    monkeypatch.setenv("TUNEVLSEG_PAD_SEQ", "1")
    monkeypatch.setattr(vision_mod, "_PAD_MIN_SEQ", 0)


def tiny_cfg():
    return CLIPVisionConfig(image_size=20, patch_size=4, hidden_size=32,
                            intermediate_size=64, num_layers=3, num_heads=4)


def _run(cfg, visual_ctx=None, prompt_depth=0):
    tower = vision_mod.CLIPVisionTower(cfg)
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.normal(size=(2, 3, 20, 20)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), pix)
    hs, last, pooled = tower.apply(params, pix, visual_ctx=visual_ctx,
                                   prompt_depth=prompt_depth,
                                   extract_layers=(1, 2))
    return params, pix, [np.asarray(h) for h in hs], np.asarray(
        last), np.asarray(pooled)


def test_padded_tower_matches_unpadded(force_pad, monkeypatch):
    cfg = tiny_cfg()
    _, _, hs_p, last_p, pooled_p = _run(cfg)
    monkeypatch.setenv("TUNEVLSEG_PAD_SEQ", "0")
    _, _, hs_u, last_u, pooled_u = _run(cfg)
    assert last_p.shape == last_u.shape  # (2, 26, 32): pad sliced off
    for a, b in zip(hs_p, hs_u):
        np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(last_p, last_u, atol=1e-5)
    np.testing.assert_allclose(pooled_p, pooled_u, atol=1e-5)


def test_padded_tower_with_visual_ctx(force_pad, monkeypatch):
    cfg = tiny_cfg()
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(rng.normal(size=(3, 4, 32)), jnp.float32)
    _, _, hs_p, last_p, pooled_p = _run(cfg, ctx, prompt_depth=3)
    monkeypatch.setenv("TUNEVLSEG_PAD_SEQ", "0")
    _, _, hs_u, last_u, pooled_u = _run(cfg, ctx, prompt_depth=3)
    for a, b in zip(hs_p, hs_u):
        np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(pooled_p, pooled_u, atol=1e-5)


def test_padded_grads_match(force_pad, monkeypatch):
    """Gradients through the padded tower (the VPT training path) equal the
    unpadded ones — pad rows receive exactly zero gradient."""
    cfg = tiny_cfg()
    tower = vision_mod.CLIPVisionTower(cfg)
    rng = np.random.default_rng(2)
    pix = jnp.asarray(rng.normal(size=(2, 3, 20, 20)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(3, 4, 32)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), pix)

    def loss(ctx):
        hs, last, pooled = tower.apply(params, pix, visual_ctx=ctx,
                                       prompt_depth=3,
                                       extract_layers=(1, 2))
        return (jnp.sum(last ** 2) + jnp.sum(pooled ** 2)
                + sum(jnp.sum(h ** 2) for h in hs))

    g_pad = np.asarray(jax.grad(loss)(ctx))
    monkeypatch.setenv("TUNEVLSEG_PAD_SEQ", "0")
    g_ref = np.asarray(jax.grad(loss)(ctx))
    np.testing.assert_allclose(g_pad, g_ref, rtol=1e-4, atol=1e-4)


def test_xla_attention_kv_valid_equals_sliced():
    rng = np.random.default_rng(3)
    b, s, h, d, valid = 2, 16, 2, 8, 11
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    out = xla_attention(q, k, v, kv_valid=valid)
    ref = xla_attention(q[:, :valid], k[:, :valid], v[:, :valid])
    np.testing.assert_allclose(np.asarray(out[:, :valid]), np.asarray(ref),
                               atol=1e-6)


def test_flash_interpret_kv_valid_equals_sliced():
    from tunevlseg_tpu.ops import flash_attention as fa
    old = fa._INTERPRET
    fa._INTERPRET = True
    try:
        rng = np.random.default_rng(4)
        b, s, h, d, valid = 1, 256, 2, 8, 200
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        out = fa.flash_attention_p(valid, q, k, v, None)
        ref = xla_attention(q, k, v, kv_valid=valid)
        np.testing.assert_allclose(np.asarray(out[:, :valid]),
                                   np.asarray(ref[:, :valid]), atol=2e-5)

        # backward parity (batched-heads bwd kernel with kv_valid)
        def f_flash(q, k, v):
            return jnp.sum(fa.flash_attention_p(valid, q, k, v, None)
                           [:, :valid] ** 2)

        def f_ref(q, k, v):
            return jnp.sum(xla_attention(q, k, v, kv_valid=valid)
                           [:, :valid] ** 2)

        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_flash, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-5)
    finally:
        fa._INTERPRET = old


def test_cris_decoder_padded_matches_unpadded(force_pad, monkeypatch):
    """CRIS decoder MXU pad (676 -> 704 at full size; here 36 -> padded):
    output must be identical to the unpadded run (VERDICT r2 #6)."""
    from tunevlseg_tpu.models.cris.layers import CRISTransformerDecoder

    rng = np.random.default_rng(2)
    b, c, h, w, l = 2, 32, 6, 6, 7
    fq = jnp.asarray(rng.normal(size=(b, c, h, w)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(b, l, c)), jnp.float32)
    pad_mask = jnp.asarray([[False] * 5 + [True] * 2,
                            [False] * 7])

    def run():
        dec = CRISTransformerDecoder(num_layers=2, d_model=c, num_heads=4,
                                     dim_feedforward=48, dropout=0.0)
        params = dec.init(jax.random.PRNGKey(0), fq, txt, pad_mask)
        return params, np.asarray(dec.apply(params, fq, txt, pad_mask))

    params_p, out_p = run()
    monkeypatch.setenv("TUNEVLSEG_PAD_SEQ", "0")
    params_u, out_u = run()
    # padding must not create/rename params (converter compatibility)
    assert (jax.tree_util.tree_structure(params_p)
            == jax.tree_util.tree_structure(params_u))
    np.testing.assert_allclose(out_p, out_u, atol=1e-5)
