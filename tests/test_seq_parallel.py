"""Sequence-parallel activation sharding (`trainer.seq_shard`).

Megatron-SP style (parallel/activation_sharding.py): with tensor parallelism
active, the towers' residual stream is constrained to shard over the model
axis between blocks, so GSPMD splits the per-block TP all-reduce into
reduce-scatter + all-gather. Constraints change layout only — the train step
must be numerically identical to the unconstrained tp run (and, by the
existing tp==dp test, to pure dp).

The tiny config also exercises UNEVEN sharding: the vision tower's token
count on the tiny config is odd, so seq % tp != 0 goes through XLA's
internal padding path.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax

from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.parallel import activation_sharding
from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.parallel import sharding_rules
from tunevlseg_tpu.training.task import SegmentationTask

from tests.test_training import synthetic_batch


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def _tiny_setup(rng):
    from tunevlseg_tpu.models.presets import build_clipseg
    model, spec = build_clipseg("maple", prompt_depth=2, num_context=4,
                                config=CLIPSegConfig.tiny())
    task = SegmentationTask(model, spec, learning_rate=1e-3,
                            donate_state=False)
    batch = synthetic_batch(rng)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    state = jax.tree_util.tree_map(np.asarray, state)
    frozen = jax.tree_util.tree_map(np.asarray, frozen)
    return task, batch, state, frozen


def _run_steps(task, batch, state0, frozen0, mesh, n=3):
    state = mesh_lib.replicate(mesh, state0)
    fsh = sharding_rules.tp_shardings(frozen0, mesh)
    frozen = sharding_rules.shard_tree(frozen0, fsh)
    train, _, _ = task.compile_steps(mesh, frozen_shardings=fsh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    for _ in range(n):
        state, metrics = train(state, frozen, sharded)
    return (jax.tree_util.tree_map(np.asarray, state.trainable),
            {k: float(v) for k, v in metrics.items()})


def test_seq_shard_matches_plain_tp(rng):
    """tp=2 with sequence-parallel constraints == tp=2 without, exactly
    (same loss/metrics and final trainable params within accumulation
    reorder tolerance)."""
    task, batch, state0, frozen0 = _tiny_setup(rng)
    mesh = mesh_lib.make_mesh(8, model_parallel=2)

    base_params, base_metrics = _run_steps(task, batch, state0, frozen0, mesh)

    assert not activation_sharding.is_enabled()
    with activation_sharding.enabled(mesh):
        sp_params, sp_metrics = _run_steps(task, batch, state0, frozen0,
                                           mesh)
    assert not activation_sharding.is_enabled()

    for k in base_metrics:
        np.testing.assert_allclose(sp_metrics[k], base_metrics[k],
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6),
        sp_params, base_params)


def test_seq_shard_constraints_reach_the_hlo(rng):
    """The lowered train step must actually contain the extra sharding
    custom-calls when seq_shard is on (guards against the trace-time gate
    silently reading stale state — the PAD_SEQ A/B failure mode)."""
    task, batch, state0, frozen0 = _tiny_setup(rng)
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    fsh = sharding_rules.tp_shardings(frozen0, mesh)
    frozen = sharding_rules.shard_tree(frozen0, fsh)
    state = mesh_lib.replicate(mesh, state0)
    sharded = mesh_lib.shard_batch(mesh, batch)

    def lowered_text():
        train, _, _ = task.compile_steps(mesh, frozen_shardings=fsh)
        return train.lower(state, frozen, sharded).as_text()

    # shardy lowers with_sharding_constraint to sdy.sharding_constraint ops;
    # the legacy GSPMD path uses @Sharding custom-calls — count both
    def n_constraints(t):
        return t.count("sdy.sharding_constraint") + t.count("@Sharding")

    off = n_constraints(lowered_text())
    with activation_sharding.enabled(mesh):
        on = n_constraints(lowered_text())
    assert on > off, (on, off)


def test_constrain_is_noop_when_disabled_or_wrong_rank(rng):
    # eager with_sharding_constraint (unlike the in-jit use) requires the
    # batch dim divisible by the data axis — use a mesh-compatible shape
    x3 = jax.numpy.zeros((8, 6, 4))
    x2 = jax.numpy.zeros((8, 6))
    assert activation_sharding.constrain(x3) is x3
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    with activation_sharding.enabled(mesh):
        assert activation_sharding.constrain(x2) is x2
        assert activation_sharding.constrain(x3) is not x3
        # indivisible seq (5 % tp=2) and batch (6 % dp=4): left alone
        assert activation_sharding.constrain(
            jax.numpy.zeros((8, 5, 4))) is not None
        x_odd = jax.numpy.zeros((8, 5, 4))
        assert activation_sharding.constrain(x_odd) is x_odd
        x_oddb = jax.numpy.zeros((6, 4, 4))
        assert activation_sharding.constrain(x_oddb) is x_oddb


def test_trainer_wires_seq_shard(tmp_path, rng):
    """Trainer(seq_shard=True) enables the gate on a tp>1 mesh at compile
    time and leaves it off on a tp=1 mesh."""
    from tunevlseg_tpu.training.loop import Trainer

    task, batch, state0, frozen0 = _tiny_setup(rng)
    try:
        for tp, expect in ((1, False), (2, True)):
            activation_sharding.disable()
            mesh = mesh_lib.make_mesh(8, model_parallel=tp)
            trainer = Trainer(task=task, mesh=mesh,
                              output_dir=tmp_path / f"tp{tp}",
                              seq_shard=True)
            state, frozen = trainer._setup(
                jax.tree_util.tree_map(np.asarray, state0),
                jax.tree_util.tree_map(np.asarray, frozen0))
            assert activation_sharding.is_enabled() == expect
            # the compiled step must run under the gate it was traced with
            sharded = mesh_lib.shard_batch(mesh, batch)
            state, metrics = trainer._train_step(state, frozen, sharded)
            assert np.isfinite(float(metrics["loss"]))
    finally:
        activation_sharding.disable()
