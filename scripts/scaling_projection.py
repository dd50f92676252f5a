#!/usr/bin/env python
"""Multi-chip scaling characterization WITHOUT multi-chip hardware.

Compiles the real sharded train step over a virtual N-device mesh (the
same XLA SPMD partitioning a pod runs), extracts every collective's byte
volume from the optimized HLO (ground truth — parallel/comm_analysis.py),
and projects step time with a ring-cost ICI model (a MODEL, labeled as
such; assumptions printed in the JSON).

Key physics this makes visible: prompt tuning's gradient sync is tiny
(only context vectors + head train), so data-parallel scaling is
essentially free; full fine-tuning (trans_seg) all-reduces ~150M params
of grads per step and the projection shows where that bites vs batch.

Run (CPU host, no chip needed):
  python scripts/scaling_projection.py --model coop_clipseg --devices 8
  python scripts/scaling_projection.py --model coop_clipseg --devices 8 --tp 2
  python scripts/scaling_projection.py --model trans_seg --devices 8

Emits one JSON line per configuration.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="coop_clipseg",
                    choices=["coop_clipseg", "coop_cris", "trans_seg"])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--fsdp", action="store_true",
                    help="shard params/opt state/frozen over the data axis "
                    "(ZeRO-3) — the full-fine-tune comm regime")
    ap.add_argument("--batch", type=int, default=None,
                    help="GLOBAL batch (default: recipe batch — i.e. "
                    "strong scaling of the canonical recipe)")
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--measured-steps-per-sec", type=float, default=None,
                    help="single-chip steps/s at the same PER-DEVICE batch; "
                    "when given, compute time comes from the measurement "
                    "instead of the peak*mfu model")
    ap.add_argument("--mfu", type=float, default=0.5)
    ap.add_argument("--ici-gbps", type=float, default=100.0,
                    help="effective per-chip ring bandwidth, GB/s")
    ap.add_argument("--overlap", type=float, default=0.0)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{max(8, args.devices)}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    import bench
    from tunevlseg_tpu.parallel import comm_analysis
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.parallel import sharding_rules

    barg = argparse.Namespace(img=args.img, batch=args.batch,
                              strategy="coop")
    task, metric, batch_size, img = bench.build(args.model, barg)
    global_batch = args.batch or batch_size
    if global_batch % args.devices:
        raise SystemExit(f"global batch {global_batch} not divisible by "
                         f"{args.devices} devices")
    batch = bench.example_batch(global_batch, img)

    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(args.devices, model_parallel=args.tp)
    if args.fsdp:
        base = (sharding_rules.tp_param_specs(frozen, mesh)
                if args.tp > 1 else None)
        fsh = sharding_rules.fsdp_shardings(frozen, mesh, base_specs=base)
        ssh = task.state_fsdp_shardings(mesh, state)
        fr = jax.tree_util.tree_map(jax.device_put, frozen, fsh)
        st = jax.tree_util.tree_map(jax.device_put, state, ssh)
        train, _, _ = task.compile_steps(mesh, frozen_shardings=fsh,
                                         state_shardings=ssh)
    else:
        fsh = sharding_rules.tp_shardings(frozen, mesh)
        fr = sharding_rules.shard_tree(frozen, fsh)
        st = mesh_lib.replicate(mesh, state)
        train, _, _ = task.compile_steps(mesh, frozen_shardings=fsh)
    sharded = mesh_lib.shard_batch(mesh, batch)
    print(f"# lowering+compiling {args.model} global_b{global_batch}@{img} "
          f"dp{args.devices // args.tp}xtp{args.tp} on the virtual CPU "
          "mesh...", file=sys.stderr, flush=True)
    lowered = train.lower(st, fr, sharded)
    flops = None
    try:
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca["flops"]) if ca and "flops" in ca else None
    except Exception:
        pass
    hlo = lowered.compile().as_text()
    vols = comm_analysis.collective_volumes(hlo)

    bw = args.ici_gbps * 1e9
    if args.measured_steps_per_sec:
        compute_s = 1.0 / args.measured_steps_per_sec
        proj = comm_analysis.project_step_time(
            vols, flops=0.0, n_devices=args.devices, bw=bw,
            overlap=args.overlap)
        comm = proj["visible_comm_s"]
        step = compute_s + comm
        proj.update(compute_s=compute_s, step_s=step,
                    comm_fraction=comm / step,
                    scaling_efficiency=compute_s / step,
                    compute_source="measured_single_chip")
    else:
        proj = comm_analysis.project_step_time(
            vols, flops=flops or 0.0, n_devices=args.devices,
            mfu=args.mfu, bw=bw, overlap=args.overlap)
        proj["compute_source"] = f"flops/(peak*mfu={args.mfu})"

    grad_floor = comm_analysis.expected_dp_gradient_bytes(state.trainable)

    # Analytic predictions to cross-check the measured HLO volumes against
    # (VERDICT r4 #9) — each a closed-form count of the collectives the
    # sharding REQUIRES; the measured-vs-predicted ratio in docs/SCALING.md
    # says how much XLA added or saved beyond the physics.
    predictions = {"dp_grad_allreduce_bytes": grad_floor}
    if args.tp > 1 and args.model == "coop_clipseg":
        b_local = global_batch // (args.devices // args.tp)
        # CLIPSeg ViT-B/16 @352: vision tower 12 blocks, 485 tokens (the
        # HLO shows the UNPADDED stream here — TUNEVLSEG_PAD_SEQ applies
        # only to the attention K/V, not the residual), hidden 768 —
        # FORWARD-only under CoOp (no trainable ancestor: prompts live in
        # the text tower; the r5 HLO confirms: 24 vision ARs, no bwd).
        # Text tower 12 blocks, 77 tokens, hidden 512 — forward + backward
        # (context-vector grads). The rd64 decoder's d=64 blocks add ~1%
        # and are left to the residual. Measured dtype is f32 (the
        # bytes_by_dtype split): the towers keep the residual stream f32
        # even under bf16 compute, so the f32 prediction is the binding
        # one — r5 measured 662.1 MiB vs 661 MiB predicted (ratio 1.00,
        # PERF_r05/scaling_check.json).
        predictions["tp_activation_allreduce_bytes"] = {
            dt: comm_analysis.expected_tp_activation_bytes(
                b_local, 485, 768, blocks_fwd=12, blocks_bwd=0,
                dtype_bytes=nb)
            + comm_analysis.expected_tp_activation_bytes(
                b_local, 77, 512, blocks_fwd=12, blocks_bwd=12,
                dtype_bytes=nb)
            for dt, nb in (("bf16", 2), ("f32", 4))}
    if args.fsdp:
        merged = {"frozen": frozen, "trainable": state.trainable}
        msh = {"frozen": fsh, "trainable":
               jax.tree_util.tree_map(lambda _: None, state.trainable)}
        # trainable shardings live inside ssh (TrainState); reuse its
        # trainable subtree
        msh["trainable"] = ssh.trainable
        gather_once = comm_analysis.expected_fsdp_gather_bytes(merged, msh)
        predictions["fsdp_gather_bytes"] = {
            "gather_once": gather_once, "gather_fwd_and_bwd": 2 * gather_once}
    out = {
        "metric": f"scaling_{args.model}_dp{args.devices // args.tp}"
                  f"xtp{args.tp}{'_fsdp' if args.fsdp else ''}"
                  f"_b{global_batch}_{img}",
        "flops_full_program": flops,
        "trainable_grad_bytes_floor": grad_floor,
        "predicted": predictions,
        "assumptions": {"ici_gbps_effective": args.ici_gbps,
                        "overlap": args.overlap,
                        "latency_us_per_collective":
                            comm_analysis.DEFAULT_LATENCY_S * 1e6},
        **proj,
    }
    print(comm_analysis.format_report(out["metric"], proj, flops),
          file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
