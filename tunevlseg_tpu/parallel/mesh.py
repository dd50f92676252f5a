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


def initialize_distributed(trainer_cfg: Optional[dict] = None) -> None:
    """Multi-host entry (SURVEY §2.10): `jax.distributed.initialize()` over
    DCN before any mesh/backend use. With no explicit knobs, jax auto-
    detects the coordinator from the TPU pod environment; on plain hosts
    set `trainer.coordinator_address/num_processes/process_id`.

    Launch: run the same command on every host, e.g.
        python -m tunevlseg_tpu.train trainer.multihost=true \\
            trainer.coordinator_address=host0:8476 \\
            trainer.num_processes=4 trainer.process_id=$RANK ...
    The global mesh then spans all hosts' devices; each host loads its own
    shard of the data (DataLoader num_shards/shard_index) and GSPMD rides
    ICI within a slice and DCN across slices."""
    t = trainer_cfg or {}
    kwargs = {k: t[k] for k in ("coordinator_address", "num_processes",
                                "process_id", "local_device_ids")
              if t.get(k) is not None}
    jax.distributed.initialize(**kwargs)


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


# Batch keys that must REPLICATE (not data-shard) when the collator deduped
# the batch's prompts: input_ids/attention_mask then hold the U unique rows
# (U need not divide the mesh; every chip needs all of them to gather its
# own rows via text_index, which IS data-sharded like the images).
_DEDUP_REPLICATED = ("input_ids", "attention_mask")


def batch_shardings(mesh: Mesh, batch: dict, stacked: bool = False) -> dict:
    """Per-key shardings for a host batch dict: leading axis over `data`,
    except the prompt-dedup keys (replicated) when `text_index` is present.
    `stacked=True` is the steps-per-execution layout, (num_steps, B, ...)
    with the SECOND axis as batch."""
    row = P(None, DATA_AXIS) if stacked else P(DATA_AXIS)
    data = NamedSharding(mesh, row)
    repl = replicated(mesh)
    dedup = "text_index" in batch
    return {k: (repl if dedup and k in _DEDUP_REPLICATED else data)
            for k in batch}


def assert_dedup_keys_agree(batch: dict) -> None:
    """Multi-host guard for the prompt-dedup batch layout.

    The dedup keys assemble as a REPLICATED global array and
    `make_array_from_process_local_data` does NOT verify the hosts passed
    identical values — disagreement would silently pick one host's prompts.
    Agreement holds by construction ONLY for a dataset whose prompt
    selection is one constant scalar string (fixed prompt_index, scalar
    entry, U=1 — the gate train.py enforces): per-task prompts or
    list-valued entries sample per-index rngs, and hosts hold disjoint
    sample shards, so they can diverge on later shuffled batches. This
    check runs on the FIRST batch only (U×77 int32 allgather — bytes); it
    is belt-and-braces for the config gate, not a per-step guarantee."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    for k in _DEDUP_REPLICATED:
        if k not in batch:
            continue
        g = np.asarray(multihost_utils.process_allgather(
            np.asarray(batch[k]), tiled=False))
        if not (g == g[0]).all():
            raise ValueError(
                f"text_dedup keys differ across hosts ({k}): the "
                "replicated assembly would silently use one host's "
                "prompts — every host must select identical prompts "
                "(fixed prompt_index), or disable data.text_dedup")


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with the leading axis sharded over `data`
    (prompt-dedup keys replicated — see batch_shardings).

    Multi-host: each process passes its LOCAL slice of the global batch
    (global = local x process_count on the data axis); the pieces assemble
    into one global array without any cross-host transfer."""
    shs = batch_shardings(mesh, batch)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(
            shs[k], np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, shs[k]) for k, v in batch.items()}


def host_local_rows(mesh: Mesh, arr, local_n: int):
    """Map a data-sharded GLOBAL array back to THIS process's rows.

    `arr` is a jit output sharded over the data axis whose global batch was
    assembled from per-process local slices (shard_batch). Returns
    `(rows, idx)`: `rows[k]` is the output for row `idx[k]` of this host's
    LOCAL batch. The mapping is recovered by pushing a local row-id array
    through the very same shard_batch placement, so it is exact whatever
    process->global-row layout `make_array_from_process_local_data` chose —
    this is what lets every host write its own shard of predictions instead
    of skipping predict on multi-host runs (reference save_utils has no
    multi-host story at all)."""
    ids = shard_batch(mesh, {"i": np.arange(local_n, dtype=np.int32)})["i"]
    id_by_dev = {s.device: np.asarray(s.data).reshape(-1)
                 for s in ids.addressable_shards}
    rows, idx, seen = [], [], set()
    for s in arr.addressable_shards:
        # with model_parallel > 1 each batch row is replicated across the
        # model axis — keep one copy per distinct global row range
        key = tuple((sl.start, sl.stop) for sl in s.index[:1])
        if key in seen:
            continue
        seen.add(key)
        rows.append(np.asarray(s.data))
        idx.append(id_by_dev[s.device])
    return np.concatenate(rows, 0), np.concatenate(idx, 0)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
