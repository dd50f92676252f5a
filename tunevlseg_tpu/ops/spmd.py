"""GSPMD partitioning rules for the Pallas kernels.

`pallas_call` lowers to an opaque custom call that XLA's sharding
propagation cannot see through: under a multi-device mesh a sharded operand
either forces full replication (an all-gather in front of every launch) or
fails to lower. Both of this repo's kernel families are embarrassingly
parallel over batch-like dimensions — flash attention grids over
(batch, heads/hg) (ops/flash_attention.py) and the flat-space conv grids
over (batch, bands) (ops/conv_pallas.py) — so the TPU-native fix is a
`jax.experimental.custom_partitioning` wrapper that

  * declares the batch-like factors shardable (dp/fsdp shard batch, tp
    shards attention heads — exactly the shardings
    parallel/sharding_rules.py produces),
  * declares every other factor need-replication (sequence, head_dim,
    flat rows, channels), and
  * lowers to the SAME kernel body on the per-device local shapes.

The `SdyShardingRule` drives propagation on the shardy partitioner (the
default in this JAX); the infer/partition callbacks serve the legacy GSPMD
partitioner and sanitize whatever shardings reach the lowering. Validated
on the 8-device CPU mesh with interpret-mode kernels
(tests/test_spmd_kernels.py); `TUNEVLSEG_KERNELS_SPMD=0` is the kill
switch that keeps multi-device programs on the plain XLA paths
(nn/attention.py dispatch, ops/conv_pallas.py:flat_conv_mode).

The reference has no counterpart — its CUDA kernels live under torch DDP
where every rank owns a full replica (reference src/ trains single-node
Lightning DDP); sharded-operand kernel execution is a TPU/GSPMD concern.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
from jax.sharding import NamedSharding, PartitionSpec


def _axis_of(sharding, dim: int):
    """Mesh axis (or None) that shards dimension `dim`, tolerating missing
    / non-Named shardings and specs shorter than the rank."""
    spec = getattr(sharding, "spec", None)
    if spec is None or dim >= len(spec):
        return None
    return spec[dim]


def partitioned_kernel(fn: Callable,
                       in_mappings: Sequence[Sequence[str]],
                       out_mappings: Sequence[Sequence[str]],
                       shardable: Sequence[str],
                       static_argnums: Sequence[int] = ()) -> Callable:
    """Wrap `fn` (a pallas-backed op) with a partitioning rule that allows
    sharding ONLY along the `shardable` factors.

    in_mappings/out_mappings name each array dimension with a factor, in
    the order of fn's ARRAY arguments (statics excluded). A factor in
    `shardable` passes an operand's mesh axis through to the local kernel;
    every other factor is replicated (shardy inserts the all-gather /
    reshard, so arbitrary upstream shardings stay correct, just slower).
    `fn` must be called with statics at their declared positions.
    """
    from jax.experimental.custom_partitioning import (SdyShardingRule,
                                                      custom_partitioning)

    shardable = frozenset(shardable)
    # shardy requires special-factor indices sorted by the factor's FIRST
    # APPEARANCE across the mappings (operands first), not by name
    order: list = []
    for m in (*in_mappings, *out_mappings):
        for f in m:
            if f not in order:
                order.append(f)
    need_rep = tuple(f for f in order if f not in shardable)
    single_out = len(out_mappings) == 1
    static_argnums = tuple(static_argnums)

    def _merge(statics, arrays):
        """Reinsert static args at their positions among the arrays."""
        out, it_s, it_a = [], iter(statics), iter(arrays)
        n = len(statics) + len(arrays)
        for i in range(n):
            out.append(next(it_s) if i in static_argnums else next(it_a))
        return out

    def _assign(arg_shapes):
        """factor -> mesh axis, from the first operand dim that shards a
        shardable factor (GSPMD reshards any disagreeing operand)."""
        assign = {}
        for shape, mapping in zip(arg_shapes, in_mappings):
            for dim, factor in enumerate(mapping):
                ax = _axis_of(getattr(shape, "sharding", None), dim)
                if factor in shardable and ax is not None:
                    assign.setdefault(factor, ax)
        return assign

    def _shardings(mesh, mappings, assign):
        return tuple(
            NamedSharding(mesh, PartitionSpec(*[assign.get(f)
                                                for f in mapping]))
            for mapping in mappings)

    def infer(*cb_args):
        mesh, arg_shapes, _ = cb_args[-3:]
        out = _shardings(mesh, out_mappings, _assign(arg_shapes))
        return out[0] if single_out else out

    def partition(*cb_args):
        statics = cb_args[:-3]
        mesh, arg_shapes, _ = cb_args[-3:]
        assign = _assign(arg_shapes)
        arg_sh = _shardings(mesh, in_mappings, assign)
        out_sh = _shardings(mesh, out_mappings, assign)

        def lower(*arrays):
            return fn(*_merge(statics, arrays))

        return mesh, lower, (out_sh[0] if single_out else out_sh), arg_sh

    wrapped = custom_partitioning(fn, static_argnums=static_argnums)
    wrapped.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=SdyShardingRule(
            tuple(tuple(m) for m in in_mappings),
            tuple(tuple(m) for m in out_mappings),
            need_replication_factors=need_rep))
    return wrapped


def spmd_kernels_enabled() -> bool:
    """Whether Pallas kernels may run inside multi-device programs through
    their custom_partitioning rules (default ON; TUNEVLSEG_KERNELS_SPMD=0
    falls back to the plain XLA formulations on multi-device meshes)."""
    import os
    return os.environ.get("TUNEVLSEG_KERNELS_SPMD", "1") != "0"


def multi_device_kernels_blocked() -> bool:
    """THE kill-switch decision, shared by every dispatch site (attention
    gate, flash dispatch/backward, flat_conv_mode, conv dispatch): True iff
    the program spans >1 device AND TUNEVLSEG_KERNELS_SPMD=0 opted those
    programs back to the XLA formulations."""
    return jax.device_count() > 1 and not spmd_kernels_enabled()


def require_spmd_kernels(what: str) -> None:
    """Raise the standard kill-switch error (callers catch it to fall back
    to their XLA path; strict modes re-raise it loudly)."""
    if multi_device_kernels_blocked():
        raise ValueError(
            f"TUNEVLSEG_KERNELS_SPMD=0: {what} disabled on multi-device "
            "meshes")
