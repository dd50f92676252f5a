#!/usr/bin/env python
"""Hyperparameter sweep driver — the TPU-native stand-in for the reference's
Optuna TPE sweeps (configs/hparams_search/*_optuna.yaml).

Optuna is not available in this image; this driver uses a self-contained TPE
sampler (tunevlseg_tpu/utils/tpe.py) over the same spaces (log-uniform
lr/weight_decay, integer prompt_depth) — or pure random search with
--sampler random — running `tunevlseg_tpu.train` per trial.

Search spaces come from the `configs/hparams_search/` group (one file per
strategy, mirroring the reference's 7 *_optuna.yaml files) via `--space`;
without it the builtin CoOp space is used. CLI flags override the file's
metric/mode/trials/seed.

Usage:
    python scripts/sweep.py --space coop --trials 20 \
        -- experiment=coop/clipseg ds_name=kvasir_polyp ...
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--space", default=None,
                    help="hparams_search config name (e.g. coop, shared_attn)"
                         " or a path to a yaml file")
    ap.add_argument("--trials", type=int, default=None)
    ap.add_argument("--metric", default=None)
    ap.add_argument("--mode", choices=("min", "max"), default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--sampler", choices=("tpe", "random"), default="tpe")
    ap.add_argument("--results", type=Path, default=Path("sweep_results.json"))
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from tunevlseg_tpu.train import CONFIG_DIR, main as train_main
    from tunevlseg_tpu.utils.tpe import (REFERENCE_SPACES, TPESampler,
                                         load_search_config)

    if args.space:
        path = Path(args.space)
        if not path.exists():
            path = CONFIG_DIR / "hparams_search" / f"{args.space}.yaml"
        sc = load_search_config(path)
    else:
        sc = {"metric": "test_loss", "mode": "min", "n_trials": 20,
              "seed": 0, "n_startup": 8, "spaces": REFERENCE_SPACES}
    if args.metric is None:
        args.metric = sc["metric"]
    if args.mode is None:
        args.mode = sc["mode"]
    if args.trials is None:
        args.trials = sc["n_trials"]
    if args.seed is None:
        args.seed = sc["seed"]

    sampler = TPESampler(sc["spaces"], seed=args.seed, mode=args.mode,
                         n_startup=0 if args.sampler == "random"
                         else sc["n_startup"])
    if args.sampler == "random":
        sampler.n_startup = 10 ** 9  # never leave the random phase

    results = []
    best = None
    for trial in range(args.trials):
        params = sampler.ask()
        trial_overrides = list(args.overrides) + [
            f"{k}={v}" for k, v in params.items()
        ] + [f"exp_name=sweep_trial{trial}"]
        try:
            metrics = train_main(trial_overrides)
            value = metrics.get(args.metric)
        except Exception as e:  # a failing trial must not kill the sweep
            print(f"trial {trial} failed: {e}")
            metrics, value = {"error": str(e)}, None
        sampler.tell(params, value)
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
