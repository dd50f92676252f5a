"""Communication analysis of compiled SPMD programs.

Multi-chip hardware is not available in this environment (CLAUDE.md), but
the COMPILED program is: XLA's SPMD partitioner inserts every collective a
real pod would run, with exact shapes, on the virtual CPU mesh too. This
module extracts those collectives from post-optimization HLO — the byte
volumes are ground truth for the sharded program — and layers a standard
ring-cost time model on top so scaling can be *characterized* before the
first pod slice exists (the projection, unlike the volumes, is a model and
is labeled as such; see docs/SCALING.md for assumptions).

The reference has no counterpart: its DDP comm is implicit in NCCL
(SURVEY §5.8) and never measured.

Usage:
    train, _, _ = task.compile_steps(mesh, frozen_shardings=fsh)
    compiled = train.lower(state, frozen, batch).compile()
    vols = collective_volumes(compiled.as_text())
    proj = project_step_time(vols, flops=..., n_devices=8)
"""
from __future__ import annotations

import dataclasses
import math
import re
from typing import Mapping, Optional

# bytes per element for HLO primitive types
_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}

# collective op -> canonical kind (async -start variants fold into their
# base kind; -done carries no new volume)
_COLLECTIVE_KINDS = ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-to-all")

# one shaped buffer: f32[8,128]{1,0} or bf16[64]{0} or f32[] (scalar)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
# an HLO instruction line: "%name = <type(s)> op-name(" — type may be a
# tuple "(f32[..], u32[..])"
_INSTR_RE = re.compile(
    r"=\s*(\([^)]*\)|\S+)\s+("
    + "|".join(k + r"(?:-start)?" for k in _COLLECTIVE_KINDS)
    + r")\(")


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue  # token[] / opaque[]
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


@dataclasses.dataclass
class CollectiveVolumes:
    """Per-kind collective call counts and byte volumes of ONE execution.

    Bytes are the HLO *result* buffer sizes (per participating device):
    for all-reduce that equals the reduced tensor; for all-gather the
    gathered (full) output; for reduce-scatter the scattered shard.

    `bytes_by_dtype` splits the same total by element type (settles e.g.
    "are the tp activation all-reduces bf16 or f32?" empirically) and
    `largest` records the top individual instructions (kind, type string,
    bytes) so byte totals can be attributed to specific tensors when a
    measured volume disagrees with the analytic prediction."""

    counts: dict
    bytes_by_kind: dict
    bytes_by_dtype: dict = dataclasses.field(default_factory=dict)
    largest: list = dataclasses.field(default_factory=list)

    @property
    def total_bytes(self) -> int:
        return sum(self.bytes_by_kind.values())

    @property
    def total_count(self) -> int:
        return sum(self.counts.values())

    def as_dict(self) -> dict:
        return {"counts": dict(self.counts),
                "bytes_by_kind": dict(self.bytes_by_kind),
                "bytes_by_dtype": dict(self.bytes_by_dtype),
                "largest": list(self.largest),
                "total_bytes": self.total_bytes}


def collective_volumes(hlo_text: str, top_k: int = 8) -> CollectiveVolumes:
    """Scan post-optimization HLO text for collective instructions.

    Async pairs (all-reduce-start / all-reduce-done) are counted once, at
    the -start; fusions never contain collectives, so a line scan is
    complete."""
    counts: dict = {}
    vols: dict = {}
    by_dtype: dict = {}
    instrs: list = []
    for line in hlo_text.splitlines():
        m = _INSTR_RE.search(line)
        if not m:
            continue
        type_str, op = m.groups()
        kind = op[:-len("-start")] if op.endswith("-start") else op
        counts[kind] = counts.get(kind, 0) + 1
        nbytes = _shape_bytes(type_str)
        vols[kind] = vols.get(kind, 0) + nbytes
        for dtype, dims in _SHAPE_RE.findall(type_str):
            if dtype not in _DTYPE_BYTES:
                continue
            n = _DTYPE_BYTES[dtype]
            for d in dims.split(","):
                if d:
                    n *= int(d)
            by_dtype[dtype] = by_dtype.get(dtype, 0) + n
        instrs.append((nbytes, kind, type_str))
    instrs.sort(reverse=True)
    largest = [{"kind": k, "type": t, "bytes": b}
               for b, k, t in instrs[:top_k]]
    return CollectiveVolumes(counts, vols, by_dtype, largest)


# ---------------------------------------------------------------------------
# Time projection (a MODEL, not a measurement — assumptions in docs/SCALING.md)

# Effective per-chip ICI bandwidth for ring collectives, bytes/sec.
# v5e: 4 ICI links/chip on a 2D torus; Google's published per-chip
# aggregate is 1600 Gbit/s = 200 GB/s. A 1D ring collective rides one
# axis (2 links, both directions) => 100 GB/s effective per chip is the
# planning number; override per topology via the argument.
DEFAULT_ICI_BYTES_PER_S = 100e9
# DCN (between hosts): planning number for one v5e host NIC
DEFAULT_DCN_BYTES_PER_S = 25e9
# fixed launch/sync latency per collective call (ICI hop + dispatch)
DEFAULT_LATENCY_S = 5e-6


def ring_time_s(kind: str, nbytes: int, n_devices: int,
                bw: float = DEFAULT_ICI_BYTES_PER_S,
                latency: float = DEFAULT_LATENCY_S) -> float:
    """Standard ring-algorithm cost for one collective of `nbytes`
    (result-buffer bytes, matching CollectiveVolumes' convention)."""
    if n_devices <= 1:
        return 0.0
    f = (n_devices - 1) / n_devices
    if kind == "all-reduce":
        t = 2 * nbytes * f / bw          # reduce-scatter + all-gather
    elif kind in ("all-gather", "reduce-scatter", "all-to-all"):
        t = nbytes * f / bw
    elif kind == "collective-permute":
        t = nbytes / bw                  # one hop
    else:
        t = nbytes / bw
    return t + latency


def project_step_time(vols: CollectiveVolumes, flops: float,
                      n_devices: int,
                      peak_flops: float = 197e12,
                      mfu: float = 0.5,
                      bw: float = DEFAULT_ICI_BYTES_PER_S,
                      overlap: float = 0.0) -> dict:
    """Project one sharded step: compute time from (flops, achievable MFU)
    + comm time from the measured volumes. `flops` is the FULL-program
    FLOPs (all devices); `vols` comes from the n_devices-sharded HLO, so
    its shapes are already per-device. `overlap` in [0,1] discounts comm
    hidden under compute (0 = worst case, fully serialized)."""
    compute_s = flops / n_devices / (peak_flops * mfu)
    comm_s = 0.0
    for kind, nbytes in vols.bytes_by_kind.items():
        count = max(1, vols.counts.get(kind, 1))
        per_call = nbytes / count
        comm_s += count * ring_time_s(kind, per_call, n_devices, bw=bw)
    visible_comm_s = comm_s * (1.0 - overlap)
    step_s = compute_s + visible_comm_s
    return {
        "n_devices": n_devices,
        "compute_s": compute_s,
        "comm_s": comm_s,
        "visible_comm_s": visible_comm_s,
        "step_s": step_s,
        "comm_fraction": visible_comm_s / step_s if step_s else 0.0,
        "scaling_efficiency": compute_s / step_s if step_s else 0.0,
        "collectives": vols.as_dict(),
    }


def format_report(name: str, proj: Mapping, flops: Optional[float] = None
                  ) -> str:
    v = proj["collectives"]
    lines = [f"{name}: {proj['n_devices']} devices"]
    if flops:
        lines.append(f"  flops/step (full program): {flops:.3e}")
    for kind in sorted(v["bytes_by_kind"]):
        mb = v["bytes_by_kind"][kind] / 2**20
        lines.append(f"  {kind:20s} x{v['counts'][kind]:<4d} "
                     f"{mb:10.2f} MiB/step")
    lines.append(
        f"  compute {proj['compute_s'] * 1e3:.2f} ms + comm "
        f"{proj['visible_comm_s'] * 1e3:.3f} ms visible "
        f"=> step {proj['step_s'] * 1e3:.2f} ms, "
        f"comm {100 * proj['comm_fraction']:.2f}%, "
        f"scaling eff {100 * proj['scaling_efficiency']:.1f}%")
    return "\n".join(lines)


def weak_scaling_table(vols_by_n: Mapping[int, CollectiveVolumes],
                       flops_per_device: float, **kw) -> list[dict]:
    """Weak-scaling projection: per-device batch held constant, so
    full-program flops grow with n. Returns one row per mesh size."""
    rows = []
    for n, vols in sorted(vols_by_n.items()):
        rows.append(project_step_time(vols, flops_per_device * n, n, **kw))
    return rows


def _bytes_of_tree(tree) -> int:
    import jax
    import numpy as np
    return int(sum(np.asarray(l).nbytes
                   for l in jax.tree_util.tree_leaves(tree)))


def expected_dp_gradient_bytes(trainable_tree) -> int:
    """The data-parallel lower bound: one all-reduce over every trainable
    gradient per step. Useful to sanity-check extraction (test oracle) and
    to see how much XLA added beyond the unavoidable grad sync."""
    return _bytes_of_tree(trainable_tree)


def expected_tp_activation_bytes(batch_local: int, tokens: int, hidden: int,
                                 blocks_fwd: int, blocks_bwd: int = 0,
                                 dtype_bytes: int = 2) -> int:
    """Megatron accounting for one tensor-parallel tower: each transformer
    block's forward emits 2 all-reduces of the (batch_local, tokens,
    hidden) activation (after the row-parallel out_proj and fc2); each
    block the BACKWARD traverses emits 2 more for the column-parallel
    input cotangents. `blocks_bwd` counts only blocks with a trainable
    ancestor (frozen towers with no prompts are forward-only). Result-
    buffer convention matches CollectiveVolumes (full activation bytes
    per all-reduce)."""
    per_ar = batch_local * tokens * hidden * dtype_bytes
    return (2 * blocks_fwd + 2 * blocks_bwd) * per_ar


def expected_fsdp_gather_bytes(tree, shardings_tree,
                               data_axis: str = "data") -> int:
    """ZeRO-3 lower bound: every leaf sharded over the data axis is
    all-gathered (full buffer, once) before its forward use; XLA decides
    whether the backward re-gathers (counts ×2) or reuses — compare both
    against the measured volume."""
    import jax
    import numpy as np
    total = 0
    for leaf, sh in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(shardings_tree)):
        spec = getattr(sh, "spec", None)
        if spec is not None and any(
                ax == data_axis or (isinstance(ax, tuple) and data_axis in ax)
                for ax in spec if ax is not None):
            total += int(np.asarray(leaf).nbytes)
    return total
