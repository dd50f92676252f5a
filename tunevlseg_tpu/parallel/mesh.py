"""Device mesh construction + sharding helpers.

The reference's only parallelism is Lightning DDP over NCCL
(configs/trainer/ddp.yaml); the TPU-native equivalent is a 1-axis `data` mesh
over ICI with params replicated and the batch sharded (SURVEY §2.10, §5.8).
A second optional `model` axis is exposed for tensor-parallel headroom —
unused by default since the largest model (ViT-B/16) fits one chip.

Everything routes through GSPMD `jax.jit` with NamedShardings: XLA inserts
the gradient all-reduce (psum over `data`) automatically, riding ICI.
Multi-host runs only need `jax.distributed.initialize()` before mesh creation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the leading axis sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
