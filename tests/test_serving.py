"""AOT export / serving round trips (tunevlseg_tpu/serving.py).

The reference has no serving story (eval.py re-instantiates the Python
model, SURVEY §2.1); here the inference step is exported ONCE to a
StableHLO artifact and later executed with only jax + the weights. These
tests prove the artifact is faithful (logits within 1-2 ulp — the
deserialized graph compiles as a separate XLA program, so fusion choices
may differ from the in-process jit), weight-free to produce, and
self-describing (meta.json)."""
import json

import numpy as np
import pytest

import jax

from tunevlseg_tpu import serving
from tunevlseg_tpu.models.clip.config import CLIPSegConfig
from tunevlseg_tpu.models.clipseg.model import CLIPSegForSegmentation
from tunevlseg_tpu.models.prompt.learners import CoOpLearner
from tunevlseg_tpu.training.task import SegmentationTask

from tests.test_training import synthetic_batch


@pytest.fixture(scope="module")
def tiny_task_and_batch():
    cfg = CLIPSegConfig.tiny()
    model = CLIPSegForSegmentation(
        cfg, learner=CoOpLearner(prompt_depth=2, num_context=4,
                                 context_dim=cfg.text.hidden_size),
        additive_mode="residual")
    task = SegmentationTask(model)
    batch = synthetic_batch(np.random.default_rng(7))
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    return task, state, frozen, batch


def test_export_load_roundtrip(tiny_task_and_batch, tmp_path):
    task, state, frozen, batch = tiny_task_and_batch
    direct = np.asarray(serving.task_predict_fn(task)(
        state.trainable, frozen, state.model_state, batch))

    serving.export_task_predict(task, state, frozen, batch, tmp_path)
    predict = serving.load_fn(tmp_path)            # no model code needed
    got = np.asarray(predict(state.trainable, frozen, state.model_state,
                             batch))

    assert got.shape == batch["mask"].shape
    # same StableHLO, separately compiled: allow ulp-level fusion drift
    np.testing.assert_allclose(got, direct, atol=1e-6, rtol=0)

    meta = serving.read_meta(tmp_path)
    assert "cpu" in meta["platforms"]
    assert meta["kind"] == "segmentation_task_predict"
    assert meta["out_specs"][0]["shape"] == list(batch["mask"].shape)
    # the artifact stores the graph, not the weights: it must be far
    # smaller than the f32 parameter bytes it serves
    n_weight_bytes = sum(np.asarray(l).nbytes for l in
                         jax.tree_util.tree_leaves((state.trainable, frozen)))
    assert meta["graph_bytes"] < n_weight_bytes


def test_export_is_weight_free(tiny_task_and_batch, tmp_path):
    """Export from ShapeDtypeStructs only — a converter host can produce
    the artifact without ever materializing the checkpoint."""
    task, state, frozen, batch = tiny_task_and_batch
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        (state.trainable, frozen, state.model_state, batch))
    serving.export_fn(serving.task_predict_fn(task), abstract, tmp_path,
                      name="abstract")
    predict = serving.load_fn(tmp_path, name="abstract")
    got = np.asarray(predict(state.trainable, frozen, state.model_state,
                             batch))
    assert np.isfinite(got).all()


def test_multi_platform_artifact_serves_cpu(tiny_task_and_batch, tmp_path):
    """One artifact lowered for both tpu and cpu (pod + canary) still
    executes on the cpu host."""
    task, state, frozen, batch = tiny_task_and_batch
    serving.export_task_predict(task, state, frozen, batch, tmp_path,
                                platforms=("tpu", "cpu"))
    meta = json.loads((tmp_path / "meta.json").read_text())
    assert set(meta["platforms"]) == {"tpu", "cpu"}
    predict = serving.load_fn(tmp_path)
    got = np.asarray(predict(state.trainable, frozen, state.model_state,
                             batch))
    assert np.isfinite(got).all()
