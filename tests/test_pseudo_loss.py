"""Parity tests for the FreeSOLO/BoxInst pseudo-supervision losses.

Oracles the torch reference utils (src/models/core_models/solov2/utils.py)
directly in f64 — they are framework-pure (no skimage/detectron2 deps) —
and checks `paired_losses` against a line-by-line torch re-derivation of
ref solov2.py:416-476 built from those same reference primitives.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.reference_oracle import reference_available, setup_solov2_imports
from tunevlseg_tpu.models.solov2 import pseudo_loss as pl

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_utils():
    assert setup_solov2_imports()
    from src.models.core_models.solov2 import utils
    return utils


def test_unfold_wo_center_matches_torch(ref_utils):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 9, 11))
    for k, d in ((3, 2), (3, 1), (5, 2)):
        ref = ref_utils.unfold_wo_center(torch.tensor(x), k, d).numpy()
        got = np.asarray(pl.unfold_wo_center(jnp.asarray(x), k, d))
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_color_similarity_matches_torch(ref_utils):
    rng = np.random.default_rng(1)
    lab = rng.standard_normal((1, 3, 8, 10)) * 40.0
    mask = (rng.random((8, 10)) > 0.2).astype(np.float64)
    ref = ref_utils.get_images_color_similarity(
        torch.tensor(lab), torch.tensor(mask), 3, 2).numpy()
    got = np.asarray(pl.images_color_similarity(
        jnp.asarray(lab), jnp.asarray(mask)[None], 3, 2))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_pairwise_term_matches_torch(ref_utils):
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((4, 1, 8, 10)) * 3.0
    ref = ref_utils.compute_pairwise_term(torch.tensor(logits), 3, 2).numpy()
    got = np.asarray(pl.compute_pairwise_term(jnp.asarray(logits), 3, 2))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_dice_coefficient_matches_torch(ref_utils):
    rng = np.random.default_rng(3)
    x = rng.random((5, 8, 10))
    t = (rng.random((5, 8, 10)) > 0.5).astype(np.float64)
    ref = ref_utils.dice_coefficient(torch.tensor(x), torch.tensor(t)).numpy()
    got = np.asarray(pl.dice_coefficient(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_rgb2lab_known_values():
    # canonical sRGB -> CIELAB (D65/2°) values, the skimage convention the
    # reference feeds through color.rgb2lab (pseudo_solov2.py:157)
    rgb = jnp.array([[0, 0, 0], [255, 255, 255],
                     [255, 0, 0], [0, 255, 0], [0, 0, 255]], jnp.float32)
    lab = np.asarray(pl.rgb2lab(rgb))
    expect = np.array([
        [0.0, 0.0, 0.0],
        [100.0, 0.0, 0.0],
        [53.2408, 80.0925, 67.2032],
        [87.7347, -86.1827, 83.1793],
        [32.2970, 79.1875, -107.8602],
    ])
    np.testing.assert_allclose(lab, expect, atol=2e-2)


def test_paired_losses_match_reference_derivation(ref_utils):
    """Re-derives ref solov2.py:426-476 in torch from the reference
    primitives and checks the fixed-shape jnp objective (valid rows only)."""
    rng = np.random.default_rng(4)
    n, h, w = 6, 16, 16
    logits = rng.standard_normal((n, h, w)) * 2.0
    # box-style targets: filled rectangles
    target = np.zeros((n, h, w))
    for i in range(n):
        y0, x0 = rng.integers(0, 6, 2)
        target[i, y0:y0 + 8, x0:x0 + 8] = 1.0
    sim = rng.random((n, 8, h, w))
    valid = np.ones((n,))
    step, warmup = 500, 1000

    # --- torch reference derivation
    tin = torch.tensor(logits)
    ttar = torch.tensor(target)
    scores = torch.sigmoid(tin)
    ly = ref_utils.dice_coefficient(scores.max(dim=1, keepdim=True)[0],
                                    ttar.max(dim=1, keepdim=True)[0])
    lx = ref_utils.dice_coefficient(scores.max(dim=2, keepdim=True)[0],
                                    ttar.max(dim=2, keepdim=True)[0])
    loss_ins_max = (ly + lx).mean() * 3.0
    ly = ref_utils.dice_coefficient(scores.mean(dim=1, keepdim=True),
                                    ttar.mean(dim=1, keepdim=True))
    lx = ref_utils.dice_coefficient(scores.mean(dim=2, keepdim=True),
                                    ttar.mean(dim=2, keepdim=True))
    loss_ins = (ly + lx).mean() * 3.0 * 0.1
    pw = ref_utils.compute_pairwise_term(tin[:, None], 3, 2)
    box_t = (ttar.max(dim=1, keepdim=True)[0].expand(-1, h, -1)
             * ttar.max(dim=2, keepdim=True)[0].expand(-1, -1, w))
    weights = (torch.tensor(sim) >= 0.3).float() * box_t[:, None].float()
    loss_pw = ((pw * weights).sum() / weights.sum().clamp(min=1.0)
               * min(step / warmup, 1.0))

    got = pl.paired_losses(jnp.asarray(logits), jnp.asarray(target),
                           jnp.asarray(sim), jnp.asarray(valid),
                           step=step, warmup_iters=warmup)
    np.testing.assert_allclose(float(got["loss_ins_max"]),
                               float(loss_ins_max), rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_ins"]),
                               float(loss_ins), rtol=1e-4)
    np.testing.assert_allclose(float(got["loss_pairwise"]),
                               float(loss_pw), rtol=1e-4)


def test_paired_losses_per_level_matches_reference_loop(ref_utils):
    """With `level_ids`, aggregation must match the reference's per-FPN-level
    loop EXACTLY (ref solov2.py:423-495: per-level instance mean, then mean
    over levels that have instances) — including uneven level occupancy and
    an empty level."""
    rng = np.random.default_rng(7)
    n, h, w = 7, 16, 16
    logits = rng.standard_normal((n, h, w)) * 2.0
    target = np.zeros((n, h, w))
    for i in range(n):
        y0, x0 = rng.integers(0, 6, 2)
        target[i, y0:y0 + 8, x0:x0 + 8] = 1.0
    sim = rng.random((n, 8, h, w))
    # levels 0 (4 inst), 2 (1 inst), 3 (2 inst); levels 1 and 4 empty
    level_ids = np.array([0, 0, 2, 3, 0, 3, 0])
    step, warmup = 500, 1000

    # torch reference loop over levels (skipping empty ones = input is None)
    li_max, li, lpw = [], [], []
    for lv in range(5):
        sel = level_ids == lv
        if not sel.any():
            continue
        tin = torch.tensor(logits[sel])
        ttar = torch.tensor(target[sel])
        scores = torch.sigmoid(tin)
        ly = ref_utils.dice_coefficient(scores.max(dim=1, keepdim=True)[0],
                                        ttar.max(dim=1, keepdim=True)[0])
        lx = ref_utils.dice_coefficient(scores.max(dim=2, keepdim=True)[0],
                                        ttar.max(dim=2, keepdim=True)[0])
        li_max.append((ly + lx).mean())
        ly = ref_utils.dice_coefficient(scores.mean(dim=1, keepdim=True),
                                        ttar.mean(dim=1, keepdim=True))
        lx = ref_utils.dice_coefficient(scores.mean(dim=2, keepdim=True),
                                        ttar.mean(dim=2, keepdim=True))
        li.append((ly + lx).mean())
        pw = ref_utils.compute_pairwise_term(tin[:, None], 3, 2)
        box_t = (ttar.max(dim=1, keepdim=True)[0].expand(-1, h, -1)
                 * ttar.max(dim=2, keepdim=True)[0].expand(-1, -1, w))
        weights = ((torch.tensor(sim[sel]) >= 0.3).float()
                   * box_t[:, None].float())
        lpw.append((pw * weights).sum() / weights.sum().clamp(min=1.0)
                   * min(step / warmup, 1.0))
    ref = {
        "loss_ins_max": torch.stack(li_max).mean() * 3.0,
        "loss_ins": torch.stack(li).mean() * 3.0 * 0.1,
        "loss_pairwise": torch.stack(lpw).mean(),
    }

    got = pl.paired_losses(jnp.asarray(logits), jnp.asarray(target),
                           jnp.asarray(sim), jnp.ones((n,)),
                           level_ids=jnp.asarray(level_ids), num_levels=5,
                           step=step, warmup_iters=warmup)
    for k in ref:
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-4)

    # padding invariance holds in per-level mode too
    pad = lambda a: jnp.concatenate(
        [jnp.asarray(a), jnp.asarray(rng.standard_normal((2, *a.shape[1:])))])
    padded = pl.paired_losses(
        pad(logits),
        jnp.concatenate([jnp.asarray(target), jnp.zeros((2, h, w))]),
        pad(sim), jnp.array([1.0] * n + [0.0] * 2),
        level_ids=jnp.asarray(np.concatenate([level_ids, [1, 4]])),
        num_levels=5, step=step, warmup_iters=warmup)
    for k in ref:
        np.testing.assert_allclose(float(padded[k]), float(got[k]), rtol=1e-6)


def test_paired_losses_padding_invariance():
    """Appending invalid rows must not change any loss term."""
    rng = np.random.default_rng(5)
    n, h, w = 4, 12, 12
    logits = rng.standard_normal((n, h, w))
    target = (rng.random((n, h, w)) > 0.5).astype(np.float64)
    sim = rng.random((n, 8, h, w))
    base = pl.paired_losses(jnp.asarray(logits), jnp.asarray(target),
                            jnp.asarray(sim), jnp.ones((n,)), step=2000)
    pad = lambda a: jnp.concatenate(
        [jnp.asarray(a), jnp.asarray(rng.standard_normal((2, *a.shape[1:])))])
    padded = pl.paired_losses(
        pad(logits),
        jnp.concatenate([jnp.asarray(target), jnp.zeros((2, h, w))]),
        pad(sim), jnp.array([1.0] * n + [0.0] * 2), step=2000)
    for k in base:
        np.testing.assert_allclose(float(padded[k]), float(base[k]),
                                   rtol=1e-6)


def test_prepare_color_similarity_shapes():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (2, 3, 32, 32)).astype(np.float32)
    mask = np.ones((2, 32, 32), np.float32)
    out = pl.prepare_color_similarity(jnp.asarray(img), jnp.asarray(mask))
    assert out.shape == (2, 8, 8, 8)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
