"""Sequence-parallel activation sharding (Megatron-SP style) via GSPMD.

With tensor parallelism (`parallel/sharding_rules.py`) the per-block
collective pattern GSPMD derives is one all-reduce over the `model` axis per
block half (row-parallel out_proj / fc2).  Between those regions — layernorm,
residual adds, prompt-context writes — every chip holds the FULL (B, S, D)
residual stream and redundantly recomputes the same elementwise work tp
times.

Megatron-LM's "sequence parallelism" (Korthikanti et al., 2022) shards those
regions along the sequence axis instead: the all-reduce splits into a
reduce-scatter (into the LN region) + all-gather (back into the next
matmul region) — same bytes over ICI, but activation memory and LN/residual
FLOPs in between drop by tp.

On TPU we do NOT hand-write those collectives: this module just places a
`with_sharding_constraint(x, P(data, model, None))` on the residual stream at
block boundaries and lets GSPMD split the all-reduces.  Constraints require
the sharded dims to DIVIDE the mesh axes, so `constrain` checks shapes at
trace time and leaves indivisible streams replicated (the flagship vision
tower's MXU pad to 512 tokens makes the hot stream divisible for free).

The reference has no counterpart (its only parallelism is DDP,
SURVEY §2.10); this is a pure TPU-scaling lever: numerics are unchanged by
construction (constraints change layout, not math — equivalence-tested on
the 8-device CPU mesh in tests/test_seq_parallel.py).

Usage: `trainer.seq_shard=true` (CLI) — Trainer enables it when the mesh's
model axis is >1.  The state is read at TRACE time by the tower hooks, so it
must stay enabled for the life of the jitted steps (module global, like the
other trace-time gates; `TUNEVLSEG_*` env-flag rules in CLAUDE.md apply).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tunevlseg_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (batch_div, seq_div, sharding) or None; read at trace time by `constrain`.
_STATE: Optional[tuple[int, int, NamedSharding]] = None


def enable(mesh: Mesh) -> None:
    """Turn on sequence-parallel constraints for subsequent traces."""
    global _STATE
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    _STATE = (sizes.get(DATA_AXIS, 1), sizes.get(MODEL_AXIS, 1),
              NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None)))


def disable() -> None:
    global _STATE
    _STATE = None


def is_enabled() -> bool:
    return _STATE is not None


@contextmanager
def enabled(mesh: Mesh):
    """Test helper: enable for the duration of a block (must cover both the
    compile AND the first call of any jitted fn, since jit traces lazily)."""
    enable(mesh)
    try:
        yield
    finally:
        disable()


def constrain(x: jax.Array) -> jax.Array:
    """Constrain a (B, S, D) residual-stream tensor to seq-sharded layout.

    No-op when sequence parallelism is disabled, the tensor is not rank-3,
    or either sharded dim is not divisible by its mesh axis
    (with_sharding_constraint rejects uneven dims) — so tower code can call
    it unconditionally at block boundaries.  At flagship shapes the vision
    tower's MXU-padded 512 tokens divide any practical tp; an un-padded odd
    token count (TUNEVLSEG_PAD_SEQ=0) or the 77-token text stream with an
    odd ctx splice simply stays tp-replicated between blocks."""
    if _STATE is None or x.ndim != 3:
        return x
    b_div, s_div, sharding = _STATE
    if x.shape[0] % b_div or x.shape[1] % s_div:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)
