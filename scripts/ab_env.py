"""r4 chip A/B harness: one family's e2e train step under two env settings.

Builds BOTH variants in one process (the env var is read at model setup)
and interleaves timed windows A/B/B/A..., per the repo's measurement rules
(axon run-to-run variance is ±15%; paired windows cancel the drift).

Usage (nohup for anything CRIS-sized — compiles can exceed 10 min):
  python scripts/ab_env.py --family coop_cris --env TUNEVLSEG_CRIS_NHWC \
      --a 0 --b 1
  python scripts/ab_env.py --family trans_seg --env TUNEVLSEG_TRANSSEG_NHWC \
      --a 0 --b 1
  python scripts/ab_env.py --family coop_cris --env TUNEVLSEG_PAD_SEQ \
      --a 0 --b auto          # the r3-pending 676->704 decoder-pad A/B
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def build_variant(env: str, value: str, args, mesh, batch_override=None,
                  text_dedup: int = 0):
    import argparse as _ap

    import jax

    from tunevlseg_tpu.parallel import mesh as mesh_lib

    os.environ[env] = value
    if batch_override is not None:
        args = _ap.Namespace(**{**vars(args), "batch": batch_override})
    task, _, batch_size, img = bench.build(args.family, args)
    batch = bench.example_batch(batch_size, img, text_dedup=text_dedup)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    K = max(1, args.scan)
    train = task.compile_train_multistep(mesh, K)
    stacked = {k: np.stack([v] * K) for k, v in batch.items()}
    shs = mesh_lib.batch_shardings(mesh, stacked, stacked=True)
    sharded = {k: jax.device_put(v, shs[k]) for k, v in stacked.items()}
    return dict(value=value, train=train, state=state, frozen=frozen,
                batch=sharded, K=K, batch_size=batch_size)


def warm(v, n=3):
    import jax

    for _ in range(n):
        v["state"], metrics = v["train"](v["state"], v["frozen"], v["batch"])
        float(metrics["loss"])
    float(np.sum(np.asarray(jax.tree_util.tree_leaves(
        v["state"].trainable)[0], np.float32)))


def window(v, iters):
    t0 = time.perf_counter()
    for _ in range(iters):
        v["state"], metrics = v["train"](v["state"], v["frozen"], v["batch"])
    loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return iters * v["K"] / dt, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="coop_cris",
                    choices=("coop_clipseg", "coop_cris", "trans_seg"))
    ap.add_argument("--env", required=True)
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--scan", type=int, default=5)
    ap.add_argument("--windows", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--batch-a", type=int, default=None,
                    help="per-variant batch override (e.g. remat buys a "
                         "bigger batch — compare imgs/s, not steps/s)")
    ap.add_argument("--batch-b", type=int, default=None)
    ap.add_argument("--img", type=int, default=None)
    ap.add_argument("--strategy", default=None)
    ap.add_argument("--text-dedup-a", type=int, default=0,
                    help="variant A uses the prompt-dedup batch layout with "
                         "this many unique prompts (0 = dense). For a pure "
                         "batch-layout A/B pass a no-op env var, e.g. "
                         "--env TUNEVLSEG_AB_NOOP --a dense --b dedup "
                         "--text-dedup-b 1")
    ap.add_argument("--text-dedup-b", type=int, default=0)
    args = ap.parse_args()

    from tunevlseg_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh(1)
    variants = []
    for value, b_ovr, td in ((args.a, args.batch_a, args.text_dedup_a),
                             (args.b, args.batch_b, args.text_dedup_b)):
        t0 = time.perf_counter()
        v = build_variant(args.env, value, args, mesh, batch_override=b_ovr,
                          text_dedup=td)
        warm(v)
        print(f"# {args.env}={value}: built+compiled+warm in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        variants.append(v)

    results = {v["value"]: [] for v in variants}
    for w in range(args.windows):
        order = variants if w % 2 == 0 else variants[::-1]
        for v in order:
            sps, loss = window(v, args.iters)
            results[v["value"]].append(sps)
            print(f"# w{w} {args.env}={v['value']}: {sps:.3f} steps/s "
                  f"(loss {loss:.4f})", flush=True)

    med = {k: float(np.median(v)) for k, v in results.items()}
    ba, bb = variants[0]["batch_size"], variants[1]["batch_size"]
    ratios = [b * bb / (a * ba) for a, b in zip(results[args.a],
                                                results[args.b])]
    print(json.dumps({
        "ab": f"{args.family}:{args.env}",
        "a": args.a, "b": args.b,
        "a_steps_per_sec": round(med[args.a], 4),
        "b_steps_per_sec": round(med[args.b], 4),
        "a_imgs_per_sec": round(med[args.a] * ba, 2),
        "b_imgs_per_sec": round(med[args.b] * bb, 2),
        "b_over_a_median_paired": round(float(np.median(ratios)), 4),
        "paired_ratios": [round(r, 4) for r in ratios],
        "samples": {k: [round(s, 4) for s in v] for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
