"""AOT export / serving: freeze a jitted inference function into a
versioned StableHLO artifact (`jax.export`) and run it later WITHOUT the
model's Python code.

The reference has no deployment story beyond Lightning checkpoints
(SURVEY §2.1: src/eval.py re-instantiates the full Python model); the
TPU-native path is ahead-of-time export — trace + lower ONCE, ship the
artifact, and a serving host needs only `jax` and the weights:

  * the artifact stores the StableHLO graph, NOT the weights: params ride
    as call ARGUMENTS. That keeps the file small, lets the server
    hot-swap orbax checkpoints without re-export, and sidesteps the axon
    remote-compile limit on large baked constants (CLAUDE.md perf rules).
  * cross-platform: `platforms=("tpu", "cpu")` lowers both variants into
    one artifact, so the same file serves a TPU pod and a CPU canary.
    (Pallas kernels gate themselves OFF when lowering for cpu — the
    TUNEVLSEG_FLASH/… env flags are read at trace time.)
  * layout: `<out_dir>/{name}.stablehlo` (serialized `jax.export.Exported`)
    + `<out_dir>/meta.json` (jax version, platforms, arg/result specs) for
    inspection and compatibility checks at load.

Typical round trip:

    task, state, frozen = ...                      # trained or converted
    serving.export_task_predict(task, state, frozen, example_batch, "art/")
    ...
    predict = serving.load_fn("art/")              # no model code needed
    probs = predict(trainable, frozen, model_state, batch)
"""
from __future__ import annotations

import json
import pathlib
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

GRAPH_SUFFIX = ".stablehlo"


def _specs_of(tree: Any) -> Any:
    """Pytree of ShapeDtypeStructs; accepts arrays, scalars, or specs —
    exporting never needs real weight values."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(
            a.shape if hasattr(a, "shape") else jnp.shape(a),
            a.dtype if hasattr(a, "dtype") else jnp.result_type(a)),
        tree)


def _spec_listing(tree: Any) -> list:
    leaves, treedef = jax.tree_util.tree_flatten(_specs_of(tree))
    return [{"shape": list(l.shape), "dtype": str(l.dtype)} for l in leaves] \
        + [{"treedef": str(treedef)}]


def export_fn(fn: Callable, example_args: tuple, out_dir: str,
              platforms: Optional[Sequence[str]] = None,
              name: str = "predict", extra_meta: Optional[dict] = None
              ) -> pathlib.Path:
    """Trace `fn` at `example_args`' shapes/dtypes, lower for `platforms`
    (default: the current backend), and serialize to `out_dir`.

    `example_args` may be abstract (ShapeDtypeStructs) — no device values
    or real weights are required to export.
    """
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    plats = list(platforms) if platforms else None
    exp = jax_export.export(jax.jit(fn), platforms=plats)(
        *_specs_of(example_args))
    data = exp.serialize()
    graph_path = out / f"{name}{GRAPH_SUFFIX}"
    graph_path.write_bytes(bytes(data))
    meta = {
        "name": name,
        "jax_version": jax.__version__,
        "platforms": list(exp.platforms),
        "calling_convention_version": exp.calling_convention_version,
        "in_specs": _spec_listing(example_args),
        "out_specs": [{"shape": list(s.shape), "dtype": str(s.dtype)}
                      for s in exp.out_avals],
        "graph_bytes": len(data),
    }
    if extra_meta:
        meta.update(extra_meta)
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    return graph_path


def load_fn(out_dir: str, name: str = "predict", jit: bool = True
            ) -> Callable:
    """Deserialize an exported artifact and return it as a callable.

    Runs on any platform the artifact was lowered for; raises at call time
    otherwise (jax.export's platform check)."""
    path = pathlib.Path(out_dir) / f"{name}{GRAPH_SUFFIX}"
    exp = jax_export.deserialize(bytearray(path.read_bytes()))
    call = exp.call
    return jax.jit(call) if jit else call


def read_meta(out_dir: str) -> dict:
    return json.loads((pathlib.Path(out_dir) / "meta.json").read_text())


# -- task-level convenience ---------------------------------------------------


def task_predict_fn(task) -> Callable:
    """The pure serving function of a SegmentationTask:
    (trainable, frozen, model_state, batch) -> sigmoid probabilities.

    Mirrors task.predict_step but takes the THREE weight trees explicitly —
    no TrainState, so no optimizer state enters the artifact's signature."""

    def predict(trainable, frozen, model_state, batch):
        from tunevlseg_tpu.training import optim as optim_lib

        frozen_params, extras = task._split_frozen(frozen)
        params = optim_lib.merge_params(trainable, frozen_params)
        logits = task._forward(params, {**extras, **model_state}, batch)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    return predict


def export_task_predict(task, state, frozen, example_batch: dict,
                        out_dir: str,
                        platforms: Optional[Sequence[str]] = None,
                        name: str = "predict") -> pathlib.Path:
    """Export a SegmentationTask's inference step. `state` may be a full
    TrainState (opt state is dropped) or just the trainable params tree."""
    trainable = getattr(state, "trainable", state)
    model_state = getattr(state, "model_state", {})
    return export_fn(
        task_predict_fn(task),
        (trainable, frozen, model_state, example_batch),
        out_dir, platforms=platforms, name=name,
        extra_meta={"kind": "segmentation_task_predict",
                    "model": type(task.model).__name__})
