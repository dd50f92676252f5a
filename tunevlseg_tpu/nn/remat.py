"""Per-layer activation rematerialization.

`jax.checkpoint` around the WHOLE loss (SegmentationTask.remat) was
measured on chip to save NOTHING: with one monolithic block the backward
recomputes the entire forward and then holds the same activation set alive
again (PERF_r04/membench.json: trans_seg b32@352 peak 14.88 -> 15.35 GiB,
i.e. slightly WORSE). The trade that works on TPU is per-LAYER
checkpointing: each transformer block's internals (qkv, attention, the 4x
MLP hidden) are recomputed inside that block's backward, so peak activation
memory drops from O(layers x block_internals) to
O(layers x residual + 1 x block_internals).

Enabled by TUNEVLSEG_REMAT_LAYERS=1, read at TRACE time (never at import —
the ab_env lesson, CLAUDE.md r4) so a single process can build and compare
both programs. Numerics are identical by construction (equivalence-tested
in tests/test_training.py).
"""
from __future__ import annotations

import contextlib
import os

from flax import linen as nn


def enabled() -> bool:
    return os.environ.get("TUNEVLSEG_REMAT_LAYERS", "0") == "1"


@contextlib.contextmanager
def forced(enable: bool = True):
    """Force per-layer remat on/off for the duration of a TRACE (the model
    reads the flag at trace time): SegmentationTask.remat wraps its loss
    with this so `trainer.remat=true` means the effective per-layer
    mechanism without a process-global flag flip."""
    old = os.environ.get("TUNEVLSEG_REMAT_LAYERS")
    os.environ["TUNEVLSEG_REMAT_LAYERS"] = "1" if enable else "0"
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("TUNEVLSEG_REMAT_LAYERS", None)
        else:
            os.environ["TUNEVLSEG_REMAT_LAYERS"] = old


def layer_call(layer: nn.Module, *args, **static_kwargs):
    """Invoke `layer(*args, **static_kwargs)`, recomputing its internals in
    the backward pass when TUNEVLSEG_REMAT_LAYERS=1.

    Positional args are traced values (arrays or None); keyword args are
    closed over and MUST be static python values (ints/bools like
    `kv_valid`/`deterministic` — a traced bool would poison `if` branches
    inside the layer)."""
    if not enabled():
        return layer(*args, **static_kwargs)
    fn = nn.remat(lambda mdl, *a: mdl(*a, **static_kwargs))
    return fn(layer, *args)
