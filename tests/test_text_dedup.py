"""Prompt-dedup (`text_index`) tests.

The reference's canonical single-class recipes feed the SAME prompt to every
batch row (ImageTextMaskDataset prompt selection with a fixed prompt_index,
/root/reference/src/data/core_datasets/image_text_mask_dataset.py:101-128) —
yet its text tower runs batch_size times. Our collator can dedup the text
keys to the batch's U unique rows plus an inverse map (`text_index`), and
the clipseg/cris nets run the text tower U times, gathering features back to
B. These tests pin: the collate contract, forward/grad equivalence against
the dense run, the CoCoOp guard, and the sharded (replicated-prompt) step on
the 8-device CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tunevlseg_tpu.data.pipeline import collate, dedup_text, device_batch
from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.models.clipseg.model import CLIPSegForSegmentation
from tunevlseg_tpu.models.prompt.learners import CoCoOpLearner, CoOpLearner
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.training.optim import FreezeSpec
from tunevlseg_tpu.training.task import SegmentationTask


def _samples(rng, n=6, img=32, seq=12, vocab=99, n_prompts=2):
    """n samples whose input_ids repeat n_prompts distinct rows."""
    prompts = rng.integers(3, vocab - 1, size=(n_prompts, seq)).astype(np.int32)
    prompts[:, 0] = 1
    prompts[:, -1] = vocab - 1
    out = []
    for i in range(n):
        ids = prompts[i % n_prompts]
        out.append({
            "image": rng.normal(size=(3, img, img)).astype(np.float32),
            "mask": rng.random((1, img, img)).astype(np.float32) > 0.5,
            "input_ids": ids,
            "attention_mask": np.ones((seq,), np.int32),
        })
    for s in out:
        s["mask"] = s["mask"].astype(np.float32)
    return out


def _dense_batch(batch):
    """Undo dedup: rebuild the (B, L) text keys from a deduped batch."""
    dense = dict(batch)
    idx = dense.pop("text_index")
    dense["input_ids"] = batch["input_ids"][idx]
    dense["attention_mask"] = batch["attention_mask"][idx]
    return dense


def test_collate_dedup_contract(rng):
    samples = _samples(rng, n=6, n_prompts=2)
    batch = collate(list(samples), batch_size=8, text_dedup=3)
    # 8 rows (2 padding repeats of the last sample), 2 unique prompts padded
    # to capacity 3 with repeats of unique row 0
    assert batch["input_ids"].shape == (3, 12)
    assert batch["text_index"].shape == (8,)
    assert batch["text_index"].dtype == np.int32
    np.testing.assert_array_equal(batch["input_ids"][2],
                                  batch["input_ids"][0])
    # the inverse map reconstructs every row's original tokens
    dense = collate(list(samples), batch_size=8)
    np.testing.assert_array_equal(
        batch["input_ids"][batch["text_index"]], dense["input_ids"])
    np.testing.assert_array_equal(
        batch["attention_mask"][batch["text_index"]],
        dense["attention_mask"])
    # capacity overflow: hard error under the multi-host contract
    # (strict_dedup, default), DENSE fallback for single-host loaders
    with pytest.raises(ValueError, match="distinct prompts"):
        collate(list(_samples(rng, n=6, n_prompts=4)), batch_size=8,
                text_dedup=3)
    over = _samples(np.random.default_rng(7), n=6, n_prompts=4)
    fell = collate(list(over), batch_size=8, text_dedup=3,
                   strict_dedup=False)
    assert "text_index" not in fell
    assert fell["input_ids"].shape == (8, 12)
    np.testing.assert_array_equal(
        fell["input_ids"], collate(list(over), batch_size=8)["input_ids"])
    # device_batch keeps the inverse map
    assert "text_index" in device_batch(batch)


def _clipseg_task(strategy="coop"):
    cfg = CLIPSegConfig.tiny()
    learner_cls = CoCoOpLearner if strategy == "cocoop" else CoOpLearner
    model = CLIPSegForSegmentation(
        cfg, learner=learner_cls(prompt_depth=2, num_context=4,
                                 context_dim=cfg.text.hidden_size),
        additive_mode="residual")
    return SegmentationTask(model, FreezeSpec(freeze_all=True,
                                              use_new_last_layer=True),
                            learning_rate=1e-2)


def test_clipseg_dedup_matches_dense(rng):
    task = _clipseg_task()
    batch = collate(_samples(rng, n=8, n_prompts=2), batch_size=8,
                    text_dedup=2)
    dense = _dense_batch(batch)
    state, frozen = task.init(jax.random.PRNGKey(0), dense)

    def loss_and_logits(b):
        (loss, (logits, _)), grads = jax.value_and_grad(
            task._loss, has_aux=True)(state.trainable, state.model_state,
                                      frozen, b, jax.random.PRNGKey(1))
        return loss, logits, grads

    loss_d, logits_d, grads_d = loss_and_logits(dense)
    loss_u, logits_u, grads_u = loss_and_logits(batch)
    np.testing.assert_allclose(np.asarray(logits_u), np.asarray(logits_d),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(loss_u), float(loss_d), atol=1e-6)
    # gather transpose = segment-sum: grads match the dense run up to
    # reduction order
    for gu, gd in zip(jax.tree_util.tree_leaves(grads_u),
                      jax.tree_util.tree_leaves(grads_d)):
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gd),
                                   rtol=1e-4, atol=2e-5)


def test_cris_dedup_matches_dense(rng):
    from tunevlseg_tpu.models.cris.model import CRISConfig, CRISForSegmentation

    cfg = CRISConfig.tiny()
    model = CRISForSegmentation(
        cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                 context_dim=cfg.transformer_width))
    task = SegmentationTask(model, FreezeSpec(freeze_all=True, family="cris"))
    batch = collate(_samples(rng, n=4, img=cfg.img_size,
                             seq=cfg.context_length, vocab=cfg.vocab_size,
                             n_prompts=2),
                    batch_size=4, text_dedup=2)
    dense = _dense_batch(batch)
    state, frozen = task.init(jax.random.PRNGKey(0), dense)

    from tunevlseg_tpu.training.optim import merge_params
    params = merge_params(state.trainable, frozen["params"])
    extras = {k: v for k, v in frozen.items() if k != "params"}
    logits_d = task._forward(params, extras, dense)
    logits_u = task._forward(params, extras, batch)
    np.testing.assert_allclose(np.asarray(logits_u), np.asarray(logits_d),
                               rtol=0, atol=3e-5)


def test_trans_seg_dedup_matches_dense(rng):
    """TransformerSegmentor (full fine-tune: the text tower is TRAINABLE, so
    the gather transpose must also reproduce text-tower WEIGHT grads, not
    just the context-vector grads the clipseg case exercises)."""
    from tunevlseg_tpu.models.trans_segmentor.model import (
        TransformerSegmentor, TransSegmentorConfig)

    cfg = TransSegmentorConfig.tiny()
    model = TransformerSegmentor(cfg)
    task = SegmentationTask(model, FreezeSpec(freeze_all=False,
                                              family="trans_segmentor"),
                            learning_rate=1e-2)
    batch = collate(_samples(rng, n=4, img=cfg.vision.image_size,
                             seq=8, vocab=99, n_prompts=2),
                    batch_size=4, text_dedup=2)
    dense = _dense_batch(batch)
    state, frozen = task.init(jax.random.PRNGKey(0), dense)

    def loss_and_logits(b):
        (loss, (logits, _)), grads = jax.value_and_grad(
            task._loss, has_aux=True)(state.trainable, state.model_state,
                                      frozen, b, jax.random.PRNGKey(1))
        return loss, logits, grads

    loss_d, logits_d, grads_d = loss_and_logits(dense)
    loss_u, logits_u, grads_u = loss_and_logits(batch)
    np.testing.assert_allclose(np.asarray(logits_u), np.asarray(logits_d),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(loss_u), float(loss_d), atol=1e-6)
    for gu, gd in zip(jax.tree_util.tree_leaves(grads_u),
                      jax.tree_util.tree_leaves(grads_d)):
        np.testing.assert_allclose(np.asarray(gu), np.asarray(gd),
                                   rtol=1e-4, atol=2e-5)


def test_cocoop_dedup_raises(rng):
    task = _clipseg_task("cocoop")
    batch = collate(_samples(rng, n=4, n_prompts=1), batch_size=4,
                    text_dedup=1)
    with pytest.raises(ValueError, match="image-conditioned"):
        task.init(jax.random.PRNGKey(0), batch)


def test_dedup_sharded_step_matches_dense(rng):
    """Full jitted train step on the 8-device mesh: dedup keys REPLICATE
    (mesh_lib.batch_shardings) while text_index/images shard — one step's
    loss and updated params match the dense batch."""
    mesh = mesh_lib.make_mesh()
    task = _clipseg_task()
    batch = collate(_samples(rng, n=8, n_prompts=1), batch_size=8,
                    text_dedup=1)
    dense = _dense_batch(batch)

    results = {}
    for name, b in (("dense", dense), ("dedup", batch)):
        state, frozen = task.init(jax.random.PRNGKey(0), dense)
        state = mesh_lib.replicate(mesh, state)
        frozen = mesh_lib.replicate(mesh, frozen)
        train, _, _ = task.compile_steps(mesh)
        sharded = mesh_lib.shard_batch(mesh, b)
        if name == "dedup":
            assert sharded["input_ids"].sharding.is_fully_replicated
            assert not sharded["image"].sharding.is_fully_replicated
        state, m = train(state, frozen, sharded)
        results[name] = (float(m["loss"]),
                         jax.tree_util.tree_map(np.asarray, state.trainable))
    np.testing.assert_allclose(results["dedup"][0], results["dense"][0],
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(results["dedup"][1]),
                    jax.tree_util.tree_leaves(results["dense"][1])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_dedup_multistep(rng):
    """compile_train_multistep with stacked dedup batches placed via
    batch_shardings(stacked=True) — the loop.py fused-chunk path."""
    mesh = mesh_lib.make_mesh()
    task = _clipseg_task()
    b1 = collate(_samples(rng, n=8, n_prompts=1), batch_size=8, text_dedup=1)
    b2 = collate(_samples(rng, n=8, n_prompts=1), batch_size=8, text_dedup=1)
    state, frozen = task.init(jax.random.PRNGKey(0), _dense_batch(b1))
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs),
                                     *[device_batch(b) for b in (b1, b2)])
    shs = mesh_lib.batch_shardings(mesh, stacked, stacked=True)
    stacked = {k: jax.device_put(v, shs[k]) for k, v in stacked.items()}
    multi = task.compile_train_multistep(mesh, 2)
    state2, metrics = multi(state, frozen, stacked)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 2


def test_dedup_text_unit():
    ids = np.asarray([[1, 5, 2], [1, 6, 2], [1, 5, 2], [1, 6, 2]], np.int32)
    batch = {"input_ids": ids.copy(),
             "attention_mask": np.ones_like(ids)}
    dedup_text(batch, capacity=2)
    np.testing.assert_array_equal(batch["text_index"], [0, 1, 0, 1])
    np.testing.assert_array_equal(batch["input_ids"], ids[:2])
