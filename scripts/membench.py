#!/usr/bin/env python
"""HBM footprint of the compiled train steps (XLA memory analysis).

For each canonical recipe, lowers + compiles ONE train step on the current
backend and reports the compiler's own memory accounting — the numbers
that decide whether a recipe fits a chip and how much batch headroom is
left (v5e: 16 GB HBM/chip):

  * args  = resident program inputs (params + optimizer state + batch)
  * temp  = transient activation/workspace memory at peak
  * total = args + output + temp  (≈ peak HBM while the step runs)

`--remat` A/Bs jax.checkpoint on the loss for the same recipe: remat
trades temp memory for recompute FLOPs — this prints the actual trade.

Emits one JSON line per configuration. Chip-backend compiles (the layout/
fusion decisions ARE the footprint), so run on the TPU session.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def analyze(model_name: str, args, remat: bool) -> dict:
    import jax

    import bench
    from tunevlseg_tpu.parallel import mesh as mesh_lib

    barg = argparse.Namespace(img=args.img, batch=args.batch,
                              strategy="coop")
    task, metric, batch_size, img = bench.build(model_name, barg)
    if remat:
        import dataclasses
        task = dataclasses.replace(task, remat=True)
    batch = bench.example_batch(batch_size, img)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    mesh = mesh_lib.make_mesh(1)
    train, _, _ = task.compile_steps(mesh)
    compiled = train.lower(state, frozen, batch).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("memory_analysis unavailable on this backend")
    gib = float(2**30)
    row = {
        "metric": f"hbm_{model_name}_b{batch_size}_{img}"
                  + ("_remat" if remat else ""),
        "argument_gib": round(ma.argument_size_in_bytes / gib, 3),
        "output_gib": round(ma.output_size_in_bytes / gib, 3),
        "temp_gib": round(ma.temp_size_in_bytes / gib, 3),
        "peak_gib": round((ma.argument_size_in_bytes
                           + ma.output_size_in_bytes
                           + ma.temp_size_in_bytes) / gib, 3),
        "code_mib": round(ma.generated_code_size_in_bytes / 2**20, 1),
    }
    return row


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", default="coop_clipseg,coop_cris,trans_seg")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--remat-models", default="trans_seg",
                    help="models to additionally compile with remat")
    args = ap.parse_args()
    remat_set = set(filter(None, args.remat_models.split(",")))
    for name in filter(None, args.models.split(",")):
        print(json.dumps(analyze(name, args, remat=False)), flush=True)
        if name in remat_set:
            print(json.dumps(analyze(name, args, remat=True)), flush=True)


if __name__ == "__main__":
    main()
