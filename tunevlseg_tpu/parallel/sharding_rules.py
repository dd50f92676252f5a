"""Tensor-parallel (Megatron-style) sharding rules for the CLIP-family towers.

The reference's only parallelism is data-parallel DDP (SURVEY §2.10/§5.8);
here the second mesh axis (`model`) adds tensor parallelism on top of it for
multi-chip serving or larger towers. Rules are regex → PartitionSpec over the
flattened `/`-joined param path; the standard 1D-TP layout for a transformer
block:

  * q/k/v projections and MLP fc1: column-parallel — kernel (in, out) sharded
    on `out` (heads / hidden split across chips, no collective needed);
  * out_proj and MLP fc2: row-parallel — kernel sharded on `in`; GSPMD
    inserts ONE psum over `model` per block half, riding ICI;
  * embeddings, layernorms, biases of row-parallel layers: replicated.

Nothing in the model code changes — GSPMD propagates these param shardings
through the jitted step and places the collectives. Leaves whose dimension is
not divisible by the mesh axis are replicated as a fallback (safety for tiny
debug configs and odd head counts) — LOUDLY: `tp_param_specs` logs a shard
report and warns per fallback whenever the model axis is >1, so a user
requesting tp=N can see exactly what actually sharded (VERDICT r2 #3).
"""
from __future__ import annotations

import re
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tunevlseg_tpu.parallel import mesh as mesh_lib
from tunevlseg_tpu.parallel.mesh import MODEL_AXIS
from tunevlseg_tpu.utils.logging import get_logger

log = get_logger(__name__)

# column-parallel: shard output features; the matching bias is sharded too.
_COL = (r"(q_proj|k_proj|v_proj|fc1)")
# row-parallel: shard input features; bias stays replicated (added once after
# the psum).
_ROW = (r"(out_proj|fc2)")

DEFAULT_TP_RULES: Sequence[tuple[str, P]] = (
    (rf".*/{_COL}/kernel$", P(None, MODEL_AXIS)),
    (rf".*/{_COL}/bias$", P(MODEL_AXIS)),
    (rf".*/{_ROW}/kernel$", P(MODEL_AXIS, None)),
    (r".*", P()),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tp_param_specs(tree, mesh: Mesh,
                   rules: Sequence[tuple[str, P]] = DEFAULT_TP_RULES):
    """PartitionSpec pytree for `tree`: first matching rule wins; any spec
    whose sharded dim is not divisible by the mesh axis falls back to P().

    When the mesh's model axis is >1 every fallback is WARNED (with the
    param path and offending shape) and an aggregate shard report is logged
    — silent replication under a user-requested tp>1 is a perf bug, not a
    convenience."""
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    model_parallel = axis_sizes.get(MODEL_AXIS, 1) > 1
    sharded, replicated = [], []
    fallbacks: list[tuple[str, tuple, P]] = []

    def pick(path, leaf):
        name = _path_str(path)
        for pat, spec in compiled:
            if pat.match(name):
                wants_shard = any(ax is not None for ax in spec)
                if not hasattr(leaf, "shape") or len(spec) > getattr(
                        leaf, "ndim", 0):
                    if wants_shard:
                        fallbacks.append((name, getattr(leaf, "shape", ()),
                                          spec))
                    else:
                        replicated.append(name)
                    return P()
                for dim, axis in enumerate(spec):
                    if axis is not None and (
                            leaf.shape[dim] % axis_sizes[axis] != 0):
                        fallbacks.append((name, leaf.shape, spec))
                        return P()
                (sharded if wants_shard else replicated).append(name)
                return spec
        replicated.append(name)
        return P()

    specs = jax.tree_util.tree_map_with_path(pick, tree)
    if model_parallel:
        for name, shape, spec in fallbacks:
            log.warning(
                "tensor-parallel FALLBACK: %s %s not divisible by mesh for "
                "%s — replicated instead", name, shape, spec)
        log.info(
            "tp shard report (model axis %d): %d params sharded, %d "
            "replicated by rule, %d replicated by FALLBACK",
            axis_sizes.get(MODEL_AXIS, 1), len(sharded), len(replicated),
            len(fallbacks))
    return specs


def tp_shardings(tree, mesh: Mesh,
                 rules: Sequence[tuple[str, P]] = DEFAULT_TP_RULES):
    """NamedSharding pytree (usable directly as a jit in_sharding)."""
    specs = tp_param_specs(tree, mesh, rules)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def shard_tree(tree, shardings):
    """device_put each leaf with its sharding."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


# ---------------------------------------------------------------------------
# FSDP (ZeRO-3 style) sharding over the DATA axis
# ---------------------------------------------------------------------------

def fsdp_specs(tree, mesh: Mesh, min_elements: int = 2 ** 14,
               base_specs=None, report: str = ""):
    """Shape-based FSDP PartitionSpecs: every large array leaf is sharded
    over the DATA axis on its largest divisible dimension; small leaves
    (LayerNorm vectors, biases, scalars) stay replicated.

    This is the scaling-book "fsdp axis" recipe: params and optimizer state
    live sharded in HBM; GSPMD all-gathers each weight just before use and
    reduce-scatters its gradient — per-chip memory for params + Adam state
    drops ~Nx while the collectives ride ICI overlapped with compute. The
    reference has no counterpart (DDP replicates everything); this is what
    makes full fine-tune of bigger towers fit small chips.

    `base_specs` (e.g. from tp_param_specs) is respected: leaves already
    sharded by tensor-parallel rules keep their spec; FSDP fills only the
    replicated remainder, so dp×tp meshes compose with fsdp for free.
    """
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        mesh_lib.DATA_AXIS, 1)
    stats = {"sharded": 0, "replicated": 0, "kept": 0}

    def pick(leaf, base):
        if base is not None and any(ax is not None for ax in base):
            stats["kept"] += 1
            return base
        shape = getattr(leaf, "shape", None)
        size = getattr(leaf, "size", 0)
        if not shape or size < min_elements or n <= 1:
            stats["replicated"] += 1
            return P()
        cands = [(d, i) for i, d in enumerate(shape) if d % n == 0 and d >= n]
        if not cands:
            stats["replicated"] += 1
            return P()
        _, i = max(cands)
        spec = [None] * len(shape)
        spec[i] = mesh_lib.DATA_AXIS
        stats["sharded"] += 1
        return P(*spec)

    if base_specs is None:
        specs = jax.tree_util.tree_map(lambda l: pick(l, None), tree)
    else:
        specs = jax.tree_util.tree_map(pick, tree, base_specs)
    if n > 1 and report:
        log.info("fsdp shard report (%s, data axis %d): %d leaves sharded, "
                 "%d replicated (small/indivisible), %d kept tp spec",
                 report, n, stats["sharded"], stats["replicated"],
                 stats["kept"])
    return specs


def fsdp_shardings(tree, mesh: Mesh, min_elements: int = 2 ** 14,
                   base_specs=None, report: str = ""):
    """NamedSharding pytree for FSDP placement (see fsdp_specs)."""
    specs = fsdp_specs(tree, mesh, min_elements, base_specs, report)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
