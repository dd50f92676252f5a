#!/usr/bin/env python
"""Serving benchmark: AOT-exported inference latency/throughput on chip.

Measures the DEPLOYMENT path (serving.py: StableHLO artifact, weights as
call args) at serving batch sizes, on the flagship CLIPSeg CoOp recipe by
default. Emits one JSON line per (batch, mode):

  {"metric": "serve_clipseg_b{B}_latency", "value": ms, ...}
  {"metric": "serve_clipseg_b{B}_throughput", "value": imgs/s, ...}

Latency  = median wall per single dispatch, output synced each call (a
           scalar device->host read — jax.block_until_ready is unreliable
           on axon, CLAUDE.md).
Throughput = N async dispatches, ONE sync at the end (the runtime pipeline
           a serving host actually runs).

Inputs are device-resident before timing (a real server's request tensors
arrive over its own NIC, not the axon tunnel). The exported artifact is
also A/B'd against the in-process jit at one batch to prove AOT costs
nothing (same StableHLO, separately compiled).
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def sync(x) -> float:
    """Scalar device->host read as the barrier (axon-safe)."""
    import jax.numpy as jnp
    return float(jnp.sum(x[(0,) * x.ndim]))


def measure(call, args_dev, warmup: int, iters: int, windows: int):
    lat = []
    for _ in range(warmup):
        sync(call(*args_dev))
    for _ in range(windows):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sync(call(*args_dev))
            ts.append(time.perf_counter() - t0)
        lat.append(float(np.median(ts)) * 1e3)
    thr = []
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = call(*args_dev)
        sync(out)
        thr.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(lat)), float(np.median(thr))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="1,4,16")
    ap.add_argument("--img", type=int, default=352)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    import jax

    import bench
    from tunevlseg_tpu import serving

    barg = argparse.Namespace(img=args.img, batch=1, strategy="coop")
    task, _, _, img = bench.build("coop_clipseg", barg)

    init_batch = bench.example_batch(1, img)
    state, frozen = task.init(jax.random.PRNGKey(0), init_batch)
    weights = jax.tree_util.tree_map(
        jax.device_put, (state.trainable, frozen, state.model_state))
    trainable, frozen, model_state = weights

    live = jax.jit(serving.task_predict_fn(task))
    dev = jax.devices()[0]
    print(f"# servebench device={dev.device_kind} img={img}", flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        batch = bench.example_batch(b, img)
        batch = {k: jax.device_put(v) for k, v in batch.items()}

        with tempfile.TemporaryDirectory() as td:
            serving.export_task_predict(task, state, frozen, batch, td)
            aot = serving.load_fn(td)
            lat, thr_ms = measure(
                aot, (trainable, frozen, model_state, batch),
                args.warmup, args.iters, args.windows)
        live_lat, _ = measure(
            live, (trainable, frozen, model_state, batch),
            args.warmup, max(5, args.iters // 2), 3)

        print(json.dumps({
            "metric": f"serve_clipseg_coop_b{b}_{img}_latency",
            "value": round(lat, 4), "unit": "ms",
            "aot_vs_livejit": round(lat / live_lat, 4)}), flush=True)
        print(json.dumps({
            "metric": f"serve_clipseg_coop_b{b}_{img}_throughput",
            "value": round(b / (thr_ms * 1e-3), 2), "unit": "imgs/s",
            "ms_per_dispatch": round(thr_ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
