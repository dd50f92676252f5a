#!/usr/bin/env python
"""Hyperparameter sweep driver — the TPU-native stand-in for the reference's
Optuna TPE sweeps (configs/hparams_search/*_optuna.yaml).

Optuna is not available in this image, so this driver implements random
search over the same spaces (log-uniform lr/weight_decay, integer
prompt_depth), runs `tunevlseg_tpu.train` per trial, and tracks the
optimized metric. The per-trial config surface is identical to the manual
schedule_*.sh drivers (one train.py invocation per setting).

Usage:
    python scripts/sweep.py --trials 20 --metric test_loss --mode min \
        -- experiment=coop/clipseg ds_name=kvasir_polyp ...
"""
from __future__ import annotations

import argparse
import json
import math
import random
from pathlib import Path


SPACES = {
    "model.optimizer.lr": ("log", 1e-5, 5e-3),
    "model.weight_decay": ("log", 1e-5, 1e-2),
    "model.prompt_depth": ("int", 1, 10),
}


def sample(rng: random.Random) -> dict[str, float | int]:
    out: dict[str, float | int] = {}
    for key, (kind, lo, hi) in SPACES.items():
        if kind == "log":
            out[key] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        else:
            out[key] = rng.randint(int(lo), int(hi))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--metric", default="test_loss")
    ap.add_argument("--mode", choices=("min", "max"), default="min")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--results", type=Path, default=Path("sweep_results.json"))
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from tunevlseg_tpu.train import main as train_main

    rng = random.Random(args.seed)
    results = []
    best = None
    for trial in range(args.trials):
        params = sample(rng)
        trial_overrides = list(args.overrides) + [
            f"{k}={v}" for k, v in params.items()
        ] + [f"exp_name=sweep_trial{trial}"]
        try:
            metrics = train_main(trial_overrides)
            value = metrics.get(args.metric)
        except Exception as e:  # a failing trial must not kill the sweep
            print(f"trial {trial} failed: {e}")
            metrics, value = {"error": str(e)}, None
        results.append({"trial": trial, "params": params,
                        "metrics": {k: v for k, v in metrics.items()
                                    if isinstance(v, (int, float))},
                        "value": value})
        if value is not None and (
                best is None
                or (args.mode == "min" and value < best["value"])
                or (args.mode == "max" and value > best["value"])):
            best = results[-1]
        args.results.write_text(json.dumps(
            {"best": best, "trials": results}, indent=2))
        print(f"trial {trial}: {args.metric}={value} params={params}")
    print(f"best: {best}")


if __name__ == "__main__":
    main()
