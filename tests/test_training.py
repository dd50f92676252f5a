"""Training-step integration tests on the virtual 8-device CPU mesh —
the TPU analogue of the reference's `trainer=ddp_sim` + `debug=overfit`
configs (SURVEY §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.models.clipseg.model import CLIPSegForSegmentation
from tunevlseg_tpu.models.prompt.learners import CoOpLearner, SharedAttnLearner
from tunevlseg_tpu.ops.metrics import SegMetricState
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.training.optim import FreezeSpec, count_params
from tunevlseg_tpu.training.task import SegmentationTask


def synthetic_batch(rng, batch=8, img=32, seq=12, vocab=99):
    pixel = rng.normal(size=(batch, 3, img, img)).astype(np.float32)
    ids = rng.integers(3, vocab - 1, size=(batch, seq)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, -1] = vocab - 1
    mask = np.ones((batch, seq), np.int32)
    # a learnable blob target correlated with the image
    yy, xx = np.mgrid[:img, :img]
    blob = ((yy - img / 2) ** 2 + (xx - img / 2) ** 2 < (img / 3) ** 2)
    seg = np.repeat(blob[None, None], batch, 0).astype(np.float32)
    return {"image": pixel, "mask": seg, "input_ids": ids,
            "attention_mask": mask, "valid": np.ones((batch,), np.float32)}


@pytest.fixture(scope="module")
def cpu_mesh():
    return mesh_lib.make_mesh()


def test_coop_overfit_single_batch(cpu_mesh, rng):
    cfg = CLIPSegConfig.tiny()
    # "residual" blend gives the trainable additive head a direct path to the
    # logits (the "unused" CoOp quirk would only train through FiLM, far too
    # weak to overfit a random frozen decoder in 40 steps)
    model = CLIPSegForSegmentation(
        cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                 context_dim=cfg.text.hidden_size),
        additive_mode="residual")
    task = SegmentationTask(model, FreezeSpec(freeze_all=True,
                                              use_new_last_layer=True),
                            learning_rate=1e-2)
    batch = synthetic_batch(rng)
    # all-ones target: trivially learnable by the additive head's bias — a
    # pure machinery test (params update, loss drops, frozen stays frozen)
    batch["mask"] = np.ones_like(batch["mask"])
    state, frozen = task.init(jax.random.PRNGKey(0), batch)

    n_train = count_params(state.trainable)
    n_frozen = count_params(frozen)
    # only context vectors + additive head + residual ratio are trainable
    assert n_train < 2000, n_train
    assert n_frozen > 50_000, n_frozen

    state = mesh_lib.replicate(cpu_mesh, state)
    frozen = mesh_lib.replicate(cpu_mesh, frozen)
    train, _, _ = task.compile_steps(cpu_mesh)
    sharded = mesh_lib.shard_batch(cpu_mesh, batch)

    frozen_before = jax.tree_util.tree_map(np.asarray, frozen)
    losses = []
    for _ in range(40):
        state, m = train(state, frozen, sharded)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] - 0.05, (losses[0], losses[-1])

    # frozen params must not move
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, frozen))):
        np.testing.assert_array_equal(a, b)


def test_eval_and_metrics_accumulate(cpu_mesh, rng):
    cfg = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(
        cfg, learner=SharedAttnLearner(
            prompt_depth=1, num_context=2,
            context_dim=cfg.text.hidden_size + cfg.vision.hidden_size,
            textual_dim=cfg.text.hidden_size, visual_dim=cfg.vision.hidden_size,
            proj_num_heads=2, proj_dim_feedforward=8),
        additive_mode="residual")
    task = SegmentationTask(model)
    batch = synthetic_batch(rng)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    state = mesh_lib.replicate(cpu_mesh, state)
    frozen = mesh_lib.replicate(cpu_mesh, frozen)
    _, evals, predict = task.compile_steps(cpu_mesh)

    mstate = mesh_lib.replicate(cpu_mesh, SegMetricState.zeros())
    sharded = mesh_lib.shard_batch(cpu_mesh, batch)
    for _ in range(3):
        mstate, extra = evals(state, frozen, mstate, sharded)
    assert float(mstate.n_samples) == 24.0
    from tunevlseg_tpu.ops.metrics import compute
    res = compute(mstate)
    assert 0.0 <= float(res["dice"]) <= 1.0
    assert 0.0 <= float(res["iou"]) <= 1.0

    preds = predict(state, frozen, sharded)
    assert preds.shape == batch["mask"].shape
    assert np.all((np.asarray(preds) >= 0) & (np.asarray(preds) <= 1))


def test_padded_batch_valid_masking(cpu_mesh, rng):
    """Metrics must ignore padded samples (valid=0)."""
    cfg = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(cfg)
    task = SegmentationTask(model, FreezeSpec(freeze_all=False))
    batch = synthetic_batch(rng)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    _, evals, _ = task.compile_steps(cpu_mesh)

    full = dict(batch)
    mstate, _ = evals(state, frozen, SegMetricState.zeros(),
                      mesh_lib.shard_batch(cpu_mesh, full))
    assert float(mstate.n_samples) == 8.0

    padded = dict(batch)
    padded["valid"] = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    mstate2, _ = evals(state, frozen, SegMetricState.zeros(),
                       mesh_lib.shard_batch(cpu_mesh, padded))
    assert float(mstate2.n_samples) == 4.0


def test_cris_e2e_batch_stats_update(cpu_mesh, rng):
    """e2e CRIS: neck/decoder/proj BatchNorm running stats update during
    training (torch train-mode semantics); backbone stats stay frozen."""
    import jax.numpy as jnp

    from tunevlseg_tpu.models.cris.model import CRISConfig
    from tunevlseg_tpu.models.presets import build_cris

    cfg = CRISConfig.tiny()
    model, spec = build_cris("e2e", config=cfg)
    assert model.bn_train
    task = SegmentationTask(model, spec, learning_rate=1e-3,
                            mutable_collections=("batch_stats",))
    batch = synthetic_batch(rng, batch=2, img=64, vocab=99)
    batch["input_ids"] = np.clip(batch["input_ids"], 1, 98)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in state.model_state
    before = jax.tree_util.tree_map(np.asarray, state.model_state)

    mesh2 = mesh_lib.make_mesh(2)  # batch=2 shards over 2 devices
    train, _, _ = task.compile_steps(mesh2)
    state2, _ = train(mesh_lib.replicate(mesh2, state),
                      mesh_lib.replicate(mesh2, frozen),
                      mesh_lib.shard_batch(mesh2, batch))

    after = state2.model_state["batch_stats"]
    # neck stats moved
    neck_before = before["batch_stats"]["neck"]["f1_v_proj"]["bn"]["running_mean"]
    neck_after = np.asarray(after["neck"]["f1_v_proj"]["bn"]["running_mean"])
    assert np.abs(neck_after - neck_before).max() > 0
    # backbone (frozen CLIP) stats did not
    bb_before = before["batch_stats"]["visual"]["bn1"]["running_mean"]
    bb_after = np.asarray(after["visual"]["bn1"]["running_mean"])
    np.testing.assert_array_equal(bb_after, bb_before)

def test_tp_shard_report_warns_on_fallback():
    """Indivisible params under tp>1 must WARN + appear in the shard report
    (VERDICT r2 #4: silent replication is a perf bug). The framework logger
    caches a stdout handler at first use (so capsys cannot see it in a full
    suite run) — capture via a records-collecting handler instead."""
    import logging

    from tunevlseg_tpu.parallel import sharding_rules

    class Collect(logging.Handler):
        def __init__(self):
            super().__init__()
            self.records = []

        def emit(self, record):
            self.records.append(record)

    logger = logging.getLogger("tunevlseg_tpu.parallel.sharding_rules")
    collector = Collect()
    logger.addHandler(collector)
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    tree = {
        "layer": {"q_proj": {"kernel": np.zeros((6, 8), np.float32)},
                  # 7 not divisible by tp=2 -> fallback
                  "fc1": {"kernel": np.zeros((6, 7), np.float32)},
                  "ln": {"scale": np.zeros((6,), np.float32)}},
    }
    try:
        specs = sharding_rules.tp_param_specs(tree, mesh)
        from jax.sharding import PartitionSpec as P
        assert specs["layer"]["q_proj"]["kernel"] == P(None, "model")
        assert specs["layer"]["fc1"]["kernel"] == P()        # fell back
        assert specs["layer"]["ln"]["scale"] == P()          # by rule
        warns = [r.getMessage() for r in collector.records
                 if r.levelno == logging.WARNING]
        assert any("fc1" in m and "FALLBACK" in m for m in warns)
        assert not any("q_proj" in m for m in warns)
        report = [r.getMessage() for r in collector.records
                  if "shard report" in r.getMessage()]
        assert report
        assert "1 params sharded" in report[0] and "FALLBACK" in report[0]

        # tp=1 mesh: silent (no warnings, no report)
        collector.records.clear()
        sharding_rules.tp_param_specs(tree, mesh_lib.make_mesh(8))
        assert not collector.records
    finally:
        logger.removeHandler(collector)


def test_tensor_parallel_matches_data_parallel(rng):
    """dp=4×tp=2 (Megatron column/row rules on the frozen tower) must produce
    the same loss/metrics as pure dp=8 — GSPMD only changes layout, not math."""
    from tunevlseg_tpu.models.presets import build_clipseg
    from tunevlseg_tpu.parallel import sharding_rules

    cfg = CLIPSegConfig.tiny()
    model, spec = build_clipseg("maple", prompt_depth=2, num_context=4,
                                config=cfg)
    task = SegmentationTask(model, spec, learning_rate=1e-3)
    batch = synthetic_batch(rng)
    state0, frozen0 = task.init(jax.random.PRNGKey(0), batch)
    # donate_argnums would otherwise invalidate the shared state between runs
    state0 = jax.tree_util.tree_map(np.asarray, state0)
    frozen0 = jax.tree_util.tree_map(np.asarray, frozen0)

    results = {}
    for tp in (1, 2):
        mesh = mesh_lib.make_mesh(8, model_parallel=tp)
        state = mesh_lib.replicate(mesh, state0)
        fsh = sharding_rules.tp_shardings(frozen0, mesh)
        frozen = sharding_rules.shard_tree(frozen0, fsh)
        if tp > 1:
            # the rules must actually shard something on the model axis
            specs = jax.tree_util.tree_leaves(
                sharding_rules.tp_param_specs(frozen0, mesh),
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
            assert any(s != jax.sharding.PartitionSpec() for s in specs)
        train, _, _ = task.compile_steps(mesh, frozen_shardings=fsh)
        sharded = mesh_lib.shard_batch(mesh, batch)
        for _ in range(3):
            state, metrics = train(state, frozen, sharded)
        results[tp] = {k: float(v) for k, v in metrics.items()}

    for k in results[1]:
        np.testing.assert_allclose(results[2][k], results[1][k],
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_multistep_scan_matches_sequential(cpu_mesh, rng):
    """k fused steps (lax.scan executable) must produce exactly the same
    final state as k sequential single-step calls (same rng fold-ins)."""
    from tunevlseg_tpu.models.presets import build_clipseg

    cfg = CLIPSegConfig.tiny()
    model, spec = build_clipseg("coop", prompt_depth=2, num_context=4,
                                config=cfg)
    task = SegmentationTask(model, spec, learning_rate=1e-2,
                            donate_state=False)
    b1 = synthetic_batch(rng)
    b2 = synthetic_batch(np.random.default_rng(5))
    state0, frozen = task.init(jax.random.PRNGKey(0), b1)
    state0 = jax.tree_util.tree_map(np.asarray, state0)
    frozen = mesh_lib.replicate(cpu_mesh, frozen)

    train, _, _ = task.compile_steps(cpu_mesh)
    s = mesh_lib.replicate(cpu_mesh, state0)
    s, m1 = train(s, frozen, mesh_lib.shard_batch(cpu_mesh, b1))
    s, m2 = train(s, frozen, mesh_lib.shard_batch(cpu_mesh, b2))
    seq_tree = jax.tree_util.tree_map(np.asarray, s.trainable)

    multi = task.compile_train_multistep(cpu_mesh, 2)
    stacked = jax.tree_util.tree_map(lambda a, b: np.stack([a, b]), b1, b2)
    s2 = mesh_lib.replicate(cpu_mesh, state0)
    s2, mm = multi(s2, frozen, stacked)
    fused_tree = jax.tree_util.tree_map(np.asarray, s2.trainable)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        seq_tree, fused_tree)
    np.testing.assert_allclose(
        float(mm["loss"]),
        (float(m1["loss"]) + float(m2["loss"])) / 2, rtol=1e-6)
    assert int(s2.step) == 2


class _ListDataset:
    def __init__(self, samples):
        self.samples = samples

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[int(i)]


def _loader_pair(rng, batch_size=8, n=16):
    from tunevlseg_tpu.data.pipeline import DataLoader

    full = synthetic_batch(rng, batch=n)
    samples = [{k: full[k][i] for k in
                ("image", "mask", "input_ids", "attention_mask")}
               for i in range(n)]
    ds = _ListDataset(samples)
    return (DataLoader(ds, batch_size, shuffle=True, seed=7, num_workers=2),
            DataLoader(ds, batch_size, shuffle=False, num_workers=2))


def _make_trainer(task, mesh, out, **kw):
    from tunevlseg_tpu.training.loop import EarlyStopping, Trainer
    from tunevlseg_tpu.training.optim import ReduceLROnPlateau

    return Trainer(task=task, mesh=mesh, output_dir=out,
                   scheduler=ReduceLROnPlateau(factor=0.5, patience=1),
                   early_stopping=EarlyStopping(patience=50),
                   log_image_num=0, **kw)


def test_fit_resume_matches_uninterrupted(cpu_mesh, rng, tmp_path):
    """Train 4 epochs straight vs 2 epochs + resume-from-last for 2 more:
    final trainable params and loop state must match exactly (restored rng,
    opt_state, scheduler/early-stop counters, best_value) — VERDICT item 3
    (reference src/train.py:104 ckpt_path resume)."""
    from tunevlseg_tpu.models.presets import build_clipseg

    cfg = CLIPSegConfig.tiny()

    def make():
        model, spec = build_clipseg("coop", prompt_depth=2, num_context=4,
                                    config=cfg)
        task = SegmentationTask(model, spec, learning_rate=1e-2)
        batch = synthetic_batch(np.random.default_rng(0))
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        return task, state, frozen

    train_l, val_l = _loader_pair(rng)

    # uninterrupted 4-epoch run
    task, state, frozen = make()
    tr_a = _make_trainer(task, cpu_mesh, tmp_path / "a", max_epochs=4)
    final_a = tr_a.fit(state, frozen, train_l, val_l)

    # 2 epochs, then a FRESH trainer resuming from `last` for 2 more
    task, state, frozen = make()
    tr_b = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=2)
    tr_b.fit(state, frozen, train_l, val_l)
    saved_best = tr_b.ckpt.best_value
    assert saved_best is not None

    task, state, frozen = make()
    tr_c = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=4)
    final_c = tr_c.fit(state, frozen, train_l, val_l, resume_from="last")

    # loop state restored, not reset
    assert tr_c.ckpt.best_value is not None
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                rtol=1e-6, atol=1e-7),
        final_a.trainable, final_c.trainable)
    assert int(final_a.step) == int(final_c.step)
    np.testing.assert_array_equal(np.asarray(final_a.rng),
                                  np.asarray(final_c.rng))
    assert tr_a.scheduler.num_bad_epochs == tr_c.scheduler.num_bad_epochs
    assert tr_a.early_stopping.count == tr_c.early_stopping.count
    np.testing.assert_allclose(tr_a.ckpt.best_value, tr_c.ckpt.best_value,
                               rtol=1e-6)


def test_fit_resume_under_fsdp(cpu_mesh, rng, tmp_path):
    """Checkpoint/resume with FSDP-SHARDED state: orbax must round-trip the
    1/N-sharded params + Adam state (save from sharded arrays, restore onto
    the sharded template) and the resumed run must match an uninterrupted
    fsdp run exactly — the production crash-recovery path for the ZeRO-3
    mode, not covered by the replicated resume test above."""
    from tunevlseg_tpu.models.presets import build_clipseg

    cfg = CLIPSegConfig.tiny()

    def make():
        # full fine-tune so the trainable tree has large, shardable leaves
        model, spec = build_clipseg("coop", prompt_depth=2, num_context=4,
                                    config=cfg)
        task = SegmentationTask(model, FreezeSpec(freeze_all=False),
                                learning_rate=1e-2)
        batch = synthetic_batch(np.random.default_rng(0))
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        return task, state, frozen

    train_l, val_l = _loader_pair(rng)

    task, state, frozen = make()
    tr_a = _make_trainer(task, cpu_mesh, tmp_path / "a", max_epochs=3,
                         fsdp=True)
    final_a = tr_a.fit(state, frozen, train_l, val_l)

    task, state, frozen = make()
    tr_b = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=1,
                         fsdp=True)
    tr_b.fit(state, frozen, train_l, val_l)

    task, state, frozen = make()
    tr_c = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=3,
                         fsdp=True)
    final_c = tr_c.fit(state, frozen, train_l, val_l, resume_from="last")

    # the resumed state is REALLY sharded (not silently replicated)
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(final_c.trainable)
        if hasattr(leaf, "addressable_shards")
        and leaf.addressable_shards[0].data.size < leaf.size)
    assert n_sharded >= 1, "resumed fsdp state has no sharded leaf"

    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                rtol=1e-6, atol=1e-7),
        final_a.trainable, final_c.trainable)
    assert int(final_a.step) == int(final_c.step)
    np.testing.assert_array_equal(np.asarray(final_a.rng),
                                  np.asarray(final_c.rng))


def test_restore_keeps_historical_best(cpu_mesh, rng, tmp_path):
    """A resumed run must not demote the historical best on its first
    (worse) validation — best_value rides the checkpoint meta."""
    from tunevlseg_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", monitor="val_dice")
    cfgt = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(cfgt)
    task = SegmentationTask(model, FreezeSpec(freeze_all=False))
    batch = synthetic_batch(rng)
    state, _ = task.init(jax.random.PRNGKey(0), batch)

    mgr.best_value = 0.9
    mgr.save("last", state, {"epoch": 3})
    meta = mgr.load_meta("last")
    assert meta["best_value"] == 0.9 and meta["epoch"] == 3

    restored = mgr.restore("last", state)
    np.testing.assert_array_equal(np.asarray(restored.rng),
                                  np.asarray(state.rng))


def test_async_save_staging_preserves_old_checkpoint(rng, tmp_path):
    """An in-flight async save must not destroy the previous checkpoint:
    the write lands in a staging dir and the old tag dir + meta.json stay
    intact until the save completes (a crash in the epoch-long async
    window previously lost BOTH checkpoints while meta.json claimed one
    existed)."""
    import json as _json

    from tunevlseg_tpu.training.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", monitor="val_dice")
    cfgt = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(cfgt)
    task = SegmentationTask(model, FreezeSpec(freeze_all=False))
    batch = synthetic_batch(rng)
    state, _ = task.init(jax.random.PRNGKey(0), batch)

    mgr.save("last", state, {"epoch": 1})
    mgr.wait()
    assert (tmp_path / "ck" / "last").exists()
    assert mgr.load_meta("last")["epoch"] == 1

    # second save: before any drain point the finalized dir + meta must
    # still describe the FIRST checkpoint, with the new one in staging
    state2 = state._replace(step=state.step + 1)
    mgr.save("last", state2, {"epoch": 2})
    assert (tmp_path / "ck" / "last").exists()
    assert _json.loads(
        (tmp_path / "ck" / "last.json").read_text())["epoch"] == 1
    # the new write is queued for finalization, not yet promoted (orbax
    # itself writes under a tmp name until the async save completes)
    assert [p[0] for p in mgr._pending] == ["last"]

    mgr.wait()
    assert not mgr._pending
    assert not (tmp_path / "ck" / ".staging-last").exists()
    assert mgr.load_meta("last")["epoch"] == 2
    restored = mgr.restore("last", state)
    assert int(restored.step) == int(state.step) + 1


def test_accumulate_grad_batches_matches_full_batch(cpu_mesh, rng):
    """Lightning's trainer.accumulate_grad_batches semantics: k micro-batch
    steps (optax.MultiSteps averages the grads, then one optimizer update)
    must land on the SAME params as one step over the concatenated batch —
    CLIPSeg has no dropout, so the equivalence is exact up to f32 order."""
    cfg = CLIPSegConfig.tiny()

    def make(accum):
        model = CLIPSegForSegmentation(
            cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                     context_dim=cfg.text.hidden_size),
            additive_mode="residual")
        return SegmentationTask(
            model, FreezeSpec(freeze_all=True, use_new_last_layer=True),
            learning_rate=1e-2, accumulate_grad_batches=accum)

    full = synthetic_batch(rng, batch=16)
    micro0 = {k: v[:8] for k, v in full.items()}
    micro1 = {k: v[8:] for k, v in full.items()}

    task_acc = make(2)
    state_acc, frozen = task_acc.init(jax.random.PRNGKey(0), micro0)
    train_acc, _, _ = task_acc.compile_steps(cpu_mesh)
    state_acc = mesh_lib.replicate(cpu_mesh, state_acc)
    frozen_r = mesh_lib.replicate(cpu_mesh, frozen)
    for micro in (micro0, micro1):
        state_acc, _ = train_acc(state_acc, frozen_r,
                                 mesh_lib.shard_batch(cpu_mesh, micro))

    task_full = make(1)
    state_full, frozen2 = task_full.init(jax.random.PRNGKey(0), full)
    train_full, _, _ = task_full.compile_steps(cpu_mesh)
    state_full = mesh_lib.replicate(cpu_mesh, state_full)
    state_full, _ = train_full(state_full, mesh_lib.replicate(cpu_mesh, frozen2),
                               mesh_lib.shard_batch(cpu_mesh, full))

    for a, b in zip(jax.tree_util.tree_leaves(state_acc.trainable),
                    jax.tree_util.tree_leaves(state_full.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)

    # the injected-hyperparam LR must stay reachable through MultiSteps
    # (the plateau scheduler depends on set/get)
    from tunevlseg_tpu.training import optim as optim_lib
    assert optim_lib.get_learning_rate(state_acc.opt_state) == pytest.approx(1e-2)
    new = optim_lib.set_learning_rate(state_acc.opt_state, 5e-3)
    assert optim_lib.get_learning_rate(new) == pytest.approx(5e-3)


def test_remat_matches_plain_step(cpu_mesh, rng):
    """remat=True (PER-LAYER checkpointing via nn/remat.py — the monolithic
    loss-level jax.checkpoint was measured to save nothing, see
    PERF_r04/membench.json) must not change the numbers — it only changes
    WHEN activations are (re)computed. Also pins that the lifted nn.remat
    wrapper leaves the param tree (names/shapes) untouched, so checkpoints
    are interchangeable between remat and plain runs."""
    cfg = CLIPSegConfig.tiny()

    def make(remat):
        model = CLIPSegForSegmentation(
            cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                     context_dim=cfg.text.hidden_size),
            additive_mode="residual")
        return SegmentationTask(
            model, FreezeSpec(freeze_all=True, use_new_last_layer=True),
            learning_rate=1e-2, remat=remat)

    batch = synthetic_batch(rng)
    states = []
    for remat in (False, True):
        task = make(remat)
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        train, _, _ = task.compile_steps(cpu_mesh)
        state = mesh_lib.replicate(cpu_mesh, state)
        frozen = mesh_lib.replicate(cpu_mesh, frozen)
        sharded = mesh_lib.shard_batch(cpu_mesh, batch)
        losses = []
        for _ in range(3):
            state, m = train(state, frozen, sharded)
            losses.append(float(m["loss"]))
        states.append((state, losses))

    (s0, l0), (s1, l1) = states
    np.testing.assert_allclose(l0, l1, atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.trainable),
                    jax.tree_util.tree_leaves(s1.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
    assert (jax.tree_util.tree_structure(s0.trainable)
            == jax.tree_util.tree_structure(s1.trainable))


def test_remat_layers_env_flag_matches_plain(rng, monkeypatch):
    """The raw TUNEVLSEG_REMAT_LAYERS=1 flag (read at trace time inside the
    towers) is numerics- and param-tree-identical to the plain build —
    covers inference/forward paths that never go through task.remat."""
    cfg = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(
        cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                 context_dim=cfg.text.hidden_size),
        additive_mode="residual")
    batch = synthetic_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["image"], batch["attention_mask"])
    plain = np.asarray(model.apply(params, batch["input_ids"],
                                   batch["image"], batch["attention_mask"]))
    monkeypatch.setenv("TUNEVLSEG_REMAT_LAYERS", "1")
    params2 = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                         batch["image"], batch["attention_mask"])
    assert (jax.tree_util.tree_structure(params2)
            == jax.tree_util.tree_structure(params))
    rematted = np.asarray(model.apply(params, batch["input_ids"],
                                      batch["image"],
                                      batch["attention_mask"]))
    np.testing.assert_allclose(rematted, plain, atol=1e-6, rtol=1e-6)


def _fsdp_vs_dp_states(rng, model_parallel=1):
    """Run 3 full-finetune steps replicated vs FSDP-sharded; return both
    final states plus the fsdp sharding tree."""
    cfg = CLIPSegConfig.tiny()
    batch = synthetic_batch(rng)
    states = []
    ssh_used = None
    for fsdp in (False, True):
        mesh = mesh_lib.make_mesh(model_parallel=model_parallel)
        model = CLIPSegForSegmentation(cfg)
        task = SegmentationTask(model, FreezeSpec(freeze_all=False),
                                learning_rate=1e-3)
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        ssh = task.state_fsdp_shardings(mesh, state) if fsdp else None
        if fsdp:
            ssh_used = ssh
        train, _, _ = task.compile_steps(mesh, state_shardings=ssh)
        if fsdp:
            state = jax.tree_util.tree_map(jax.device_put, state, ssh)
        else:
            state = mesh_lib.replicate(mesh, state)
        frozen = mesh_lib.replicate(mesh, frozen)
        sharded = mesh_lib.shard_batch(mesh, batch)
        for _ in range(3):
            state, m = train(state, frozen, sharded)
        states.append((state, float(m["loss"])))
    return states, ssh_used


def test_fsdp_matches_data_parallel(rng):
    """FSDP (params + Adam state sharded over the data axis, gathered by
    GSPMD on use) must reproduce plain data-parallel numerics, while
    actually holding only 1/N of the big leaves per device."""
    (dp, fsdp), ssh = _fsdp_vs_dp_states(rng)
    (state_dp, loss_dp), (state_fs, loss_fs) = dp, fsdp
    assert abs(loss_dp - loss_fs) < 1e-5, (loss_dp, loss_fs)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.trainable),
                    jax.tree_util.tree_leaves(state_fs.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)

    # the big leaves must be genuinely sharded: one device holds 1/8
    n_sharded = 0
    for leaf in jax.tree_util.tree_leaves(state_fs.trainable):
        shard = leaf.addressable_shards[0].data
        if shard.size < leaf.size:
            assert shard.size * 8 == leaf.size, (shard.shape, leaf.shape)
            n_sharded += 1
    assert n_sharded >= 1, "no trainable leaf was actually fsdp-sharded"
    # Adam mu/nu shard alongside their params
    opt_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(state_fs.opt_state)
        if hasattr(leaf, "addressable_shards")
        and leaf.addressable_shards[0].data.size < leaf.size)
    assert opt_sharded >= 2 * n_sharded, (opt_sharded, n_sharded)


def test_fsdp_composes_with_tensor_parallel(rng):
    """dp4 x tp2 mesh with fsdp=True: tp-sharded leaves keep the model-axis
    spec; fsdp fills the replicated remainder over the data axis, and the
    numerics still match plain data parallel."""
    (dp, fsdp), _ = _fsdp_vs_dp_states(rng, model_parallel=2)
    (state_dp, loss_dp), (state_fs, loss_fs) = dp, fsdp
    assert abs(loss_dp - loss_fs) < 1e-5, (loss_dp, loss_fs)
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.trainable),
                    jax.tree_util.tree_leaves(state_fs.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_checkpoint_roundtrip_fsdp_to_dp(rng, tmp_path):
    """A checkpoint written from FSDP-sharded state must restore into a
    replicated (pure-dp) template bit-identically — switching chip counts
    or parallelism between runs cannot corrupt a resume."""
    from tunevlseg_tpu.training.checkpoint import CheckpointManager

    cfg = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(cfg)
    task = SegmentationTask(model, FreezeSpec(freeze_all=False),
                            learning_rate=1e-3)
    batch = synthetic_batch(rng)
    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    ssh = task.state_fsdp_shardings(mesh, state)
    state = jax.tree_util.tree_map(jax.device_put, state, ssh)
    frozen_r = mesh_lib.replicate(mesh, frozen)
    train, _, _ = task.compile_steps(mesh, state_shardings=ssh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    for _ in range(2):
        state, _ = train(state, frozen_r, sharded)

    mgr = CheckpointManager(tmp_path / "ck", monitor="val_dice")
    mgr.save("last", state, {"epoch": 0})
    mgr.wait()

    # fresh replicated template (as a later pure-dp run would build)
    state2, _ = task.init(jax.random.PRNGKey(0), batch)
    state2 = mesh_lib.replicate(mesh, state2)
    restored = mgr.restore("last", state2)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.trainable),
                    jax.tree_util.tree_leaves(restored.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored replicated state is usable by a dp-compiled step
    train_dp, _, _ = task.compile_steps(mesh)
    restored, m = train_dp(restored, frozen_r, sharded)
    assert np.isfinite(float(m["loss"]))


def test_sigterm_preemption_saves_resumable_last(cpu_mesh, rng, tmp_path):
    """Preemption safety: SIGTERM mid-fit must finish the in-flight step,
    write a resumable 'last' checkpoint (meta preempted=True, epoch rolled
    back to last completed), and return cleanly — and a fresh trainer must
    resume from it."""
    import os
    import signal
    import threading

    from tunevlseg_tpu.models.presets import build_clipseg

    cfg = CLIPSegConfig.tiny()

    def make():
        model, spec = build_clipseg("coop", prompt_depth=2, num_context=4,
                                    config=cfg)
        task = SegmentationTask(model, spec, learning_rate=1e-2)
        batch = synthetic_batch(np.random.default_rng(0))
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        return task, state, frozen

    train_l, val_l = _loader_pair(rng)
    task, state, frozen = make()
    tr = _make_trainer(task, cpu_mesh, tmp_path / "p", max_epochs=500)

    # deliver SIGTERM once training is underway (after first epoch's save)
    def preempt():
        while not (tr.ckpt.dir / "last").exists():
            import time
            time.sleep(0.2)
        os.kill(os.getpid(), signal.SIGTERM)

    prev_handler = signal.getsignal(signal.SIGTERM)
    t = threading.Thread(target=preempt, daemon=True)
    t.start()
    final = tr.fit(state, frozen, train_l, val_l)   # must NOT die
    t.join(timeout=30)
    # the watch was uninstalled / flag honored long before 500 epochs
    assert int(final.step) < 500 * 2

    meta = tr.ckpt.load_meta("last")
    assert meta.get("preempted") is True
    assert meta["epoch"] >= 0

    # resumable: a fresh trainer continues from the snapshot
    task, state2, frozen2 = make()
    tr2 = _make_trainer(task, cpu_mesh, tmp_path / "p",
                        max_epochs=meta["epoch"] + 2)
    final2 = tr2.fit(state2, frozen2, train_l, val_l, resume_from="last")
    assert int(final2.step) >= int(final.step)
    # the pre-fit SIGTERM disposition is restored after fit
    assert signal.getsignal(signal.SIGTERM) == prev_handler


def test_step_level_resume_matches_uninterrupted(cpu_mesh, rng, tmp_path,
                                                 monkeypatch):
    """Exact mid-epoch resume: preempt deterministically after the FIRST
    batch of epoch 1, resume from the snapshot, and the final trainable
    params must be bit-identical to an uninterrupted run — the snapshot's
    batch_offset makes the resumed epoch replay only its tail (no batch
    trains twice; deterministic per-epoch shuffle makes the tail the same
    batches an uninterrupted run would have seen)."""
    from tunevlseg_tpu.models.presets import build_clipseg
    from tunevlseg_tpu.training import loop as loop_mod

    cfg = CLIPSegConfig.tiny()

    def make():
        model, spec = build_clipseg("coop", prompt_depth=2, num_context=4,
                                    config=cfg)
        task = SegmentationTask(model, spec, learning_rate=1e-2)
        batch = synthetic_batch(np.random.default_rng(0))
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        return task, state, frozen

    train_l, val_l = _loader_pair(rng)   # 16 samples / batch 8 = 2 batches

    # uninterrupted 3-epoch run
    task, state, frozen = make()
    tr_a = _make_trainer(task, cpu_mesh, tmp_path / "a", max_epochs=3)
    final_a = tr_a.fit(state, frozen, train_l, val_l)

    # preempt after epoch 1's first batch: preempted() is called once per
    # consumed group — epoch 0 makes calls 1-2, epoch 1's first batch is
    # call 3
    class _FakeWatch:
        calls = 0

        def install(self):
            return self

        def uninstall(self):
            pass

        def preempted(self):
            _FakeWatch.calls += 1
            return _FakeWatch.calls >= 3

    monkeypatch.setattr(loop_mod, "_PreemptionWatch", _FakeWatch)
    task, state, frozen = make()
    tr_b = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=3)
    tr_b.fit(state, frozen, train_l, val_l)
    meta = tr_b.ckpt.load_meta("last")
    assert meta.get("preempted") is True
    assert meta["epoch"] == 0          # last COMPLETED epoch
    assert meta["batch_offset"] == 1   # one batch of epoch 1 consumed
    monkeypatch.undo()

    # resume: must replay only epoch 1's second batch, then epoch 2
    task, state2, frozen2 = make()
    tr_c = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=3)
    final_c = tr_c.fit(state2, frozen2, train_l, val_l, resume_from="last")

    assert int(final_a.step) == int(final_c.step)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        final_a.trainable, final_c.trainable)
    np.testing.assert_array_equal(np.asarray(final_a.rng),
                                  np.asarray(final_c.rng))


def test_interval_snapshot_hard_kill_resume(cpu_mesh, rng, tmp_path):
    """trainer.ckpt_every_n_steps writes exactly-resumable mid-epoch
    snapshots WITHOUT SIGTERM: simulate a hard kill (the train step raises)
    at epoch 1's second batch; the interval snapshot from its first batch
    must carry mid_epoch meta with the right batch_offset, and resuming
    from it must match an uninterrupted run bit-exactly."""
    import pytest

    from tunevlseg_tpu.models.presets import build_clipseg

    cfg = CLIPSegConfig.tiny()

    def make():
        model, spec = build_clipseg("coop", prompt_depth=2, num_context=4,
                                    config=cfg)
        task = SegmentationTask(model, spec, learning_rate=1e-2)
        batch = synthetic_batch(np.random.default_rng(0))
        state, frozen = task.init(jax.random.PRNGKey(0), batch)
        return task, state, frozen

    train_l, val_l = _loader_pair(rng)   # 2 batches per epoch

    task, state, frozen = make()
    tr_a = _make_trainer(task, cpu_mesh, tmp_path / "a", max_epochs=3)
    final_a = tr_a.fit(state, frozen, train_l, val_l)

    class _Boom(Exception):
        pass

    task, state, frozen = make()
    orig_compile = task.compile_steps
    calls = {"n": 0}

    def compile_steps(mesh, fsh=None, ssh=None):
        train, ev, pred = orig_compile(mesh, fsh, ssh)

        def train_killed(*a):
            calls["n"] += 1
            if calls["n"] >= 4:        # epoch 1, second batch
                raise _Boom()
            return train(*a)

        return train_killed, ev, pred

    task.compile_steps = compile_steps
    tr_b = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=3,
                         ckpt_every_n_steps=1)
    with pytest.raises(_Boom):
        tr_b.fit(state, frozen, train_l, val_l)
    # flush the staged-but-unpromoted snapshot the way a surviving process
    # at the next drain would (durability timing is inherent to async; the
    # meta/resume logic is what this test pins)
    tr_b.ckpt.wait()
    meta = tr_b.ckpt.load_meta("last")
    assert meta.get("mid_epoch") is True
    assert meta["epoch"] == 0          # last COMPLETED epoch
    assert meta["batch_offset"] == 1   # snapshot after epoch 1's 1st batch

    task, state2, frozen2 = make()
    tr_c = _make_trainer(task, cpu_mesh, tmp_path / "b", max_epochs=3)
    final_c = tr_c.fit(state2, frozen2, train_l, val_l, resume_from="last")

    assert int(final_a.step) == int(final_c.step)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        final_a.trainable, final_c.trainable)


def test_checkpoint_promotion_crash_recovery(rng, tmp_path):
    """The promote order (old->aside, staging->tag, meta, delete aside) must
    be crash-recoverable at its one gap: tag absent with .old- present is
    healed by the next drain's recovery sweep."""
    import shutil

    from tunevlseg_tpu.training.checkpoint import CheckpointManager

    cfg = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(cfg)
    task = SegmentationTask(model, FreezeSpec(freeze_all=False))
    batch = synthetic_batch(rng)
    state, _ = task.init(jax.random.PRNGKey(0), batch)

    mgr = CheckpointManager(tmp_path / "ck", monitor="val_dice")
    mgr.save("last", state, {"epoch": 0})
    mgr.wait()
    assert (tmp_path / "ck" / "last").exists()

    # simulate the crash gap: old moved aside, staging rename never happened
    (tmp_path / "ck" / "last").rename(tmp_path / "ck" / ".old-last")
    assert not (tmp_path / "ck" / "last").exists()

    mgr2 = CheckpointManager(tmp_path / "ck", monitor="val_dice")
    mgr2.wait()   # drain runs the recovery sweep
    assert (tmp_path / "ck" / "last").exists()
    assert not (tmp_path / "ck" / ".old-last").exists()
    restored = mgr2.restore("last", state)
    assert int(restored.step) == int(state.step)

    # and a later successful save cleans the aside dir
    state2 = state._replace(step=state.step + 1)
    mgr2.save("last", state2, {"epoch": 1})
    mgr2.wait()
    assert not (tmp_path / "ck" / ".old-last").exists()
    assert int(mgr2.restore("last", state).step) == int(state.step) + 1


def test_fast_dropout_rng_deterministic_and_valid(monkeypatch):
    """TUNEVLSEG_FAST_DROPOUT=1 (default): dropout keys come from the RBG
    generator — still a pure function of the incoming (seed, step) key
    (same step => same masks), valid bernoulli statistics, and distinct
    across steps. =0 restores threefry. Chip A/B: +12.0% on CRIS b64@416
    (PERF_r05/ab_cris_fastdropout.log)."""
    import jax

    from tunevlseg_tpu.training.task import SegmentationTask

    base = jax.random.fold_in(jax.random.PRNGKey(3), 7)
    monkeypatch.setenv("TUNEVLSEG_FAST_DROPOUT", "1")
    k1 = SegmentationTask._dropout_rng(base)
    k1b = SegmentationTask._dropout_rng(base)
    k2 = SegmentationTask._dropout_rng(jax.random.fold_in(
        jax.random.PRNGKey(3), 8))
    m1 = jax.random.bernoulli(k1, 0.9, (4096,))
    m1b = jax.random.bernoulli(k1b, 0.9, (4096,))
    m2 = jax.random.bernoulli(k2, 0.9, (4096,))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m1b))
    assert bool((np.asarray(m1) != np.asarray(m2)).any())
    assert 0.85 < float(m1.mean()) < 0.95

    monkeypatch.setenv("TUNEVLSEG_FAST_DROPOUT", "0")
    k_slow = SegmentationTask._dropout_rng(base)
    m_slow = jax.random.bernoulli(k_slow, 0.9, (4096,))
    assert 0.85 < float(m_slow.mean()) < 0.95
    # different generator family => different mask values
    assert bool((np.asarray(m1) != np.asarray(m_slow)).any())
