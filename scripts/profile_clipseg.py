"""Component-level CLIPSeg step timing on the real chip (axon-safe sync)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.presets import build_clipseg
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.task import SegmentationTask

    BATCH, IMG = 64, 352
    model, spec = build_clipseg("coop", prompt_depth=3, num_context=4,
                                dtype=jnp.bfloat16)
    task = SegmentationTask(model, spec, learning_rate=2e-4,
                            donate_state=False)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(BATCH, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 9:] = 49407
    batch = {
        "image": rng.integers(0, 255, (BATCH, 3, IMG, IMG), dtype=np.uint8),
        "mask": (rng.random((BATCH, 1, IMG, IMG)) > 0.7).astype(np.float32),
        "input_ids": ids,
        "attention_mask": (ids != 49407).astype(np.int32),
        "valid": np.ones((BATCH,), np.float32),
    }
    mesh = mesh_lib.make_mesh()
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    state = mesh_lib.replicate(mesh, state)
    frozen = mesh_lib.replicate(mesh, frozen)
    sharded = mesh_lib.shard_batch(mesh, batch)
    img_f = jnp.asarray(
        (batch["image"].astype(np.float32) / 255.0 - 0.45) / 0.22,
        jnp.bfloat16)

    from tunevlseg_tpu.training import optim as optim_lib
    params = optim_lib.merge_params(state.trainable, frozen["params"])
    variables = {"params": params}

    def _sum(t):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree_util.tree_leaves(t))

    noop = jax.jit(lambda x: x + 1.0)
    print(f"dispatch+sync overhead: {timed(noop, (jnp.zeros(()),)):.1f} ms",
          flush=True)

    # vision tower (frozen CoOp path: no visual prompts, extract 3 layers)
    vis = jax.jit(lambda v, x: _sum(model.apply(
        v, x, method=lambda m, xx: m.vision_model(
        xx, extract_layers=(3, 6, 9), early_exit=True))))
    try:
        print(f"vision tower fwd: {timed(vis, (variables, img_f)):.1f} ms",
              flush=True)
    except Exception as e:
        print("vision-only probe failed:", type(e).__name__, str(e)[:300],
              flush=True)

    fwd = jax.jit(lambda v, i, x, m: _sum(model.apply(v, i, x, m)))
    print(f"full forward: {timed(fwd, (variables, jnp.asarray(ids), img_f, jnp.asarray(batch['attention_mask']))):.1f} ms",
          flush=True)

    train, _, _ = task.compile_steps(mesh)
    t = timed(lambda s, f, b: train(s, f, b)[1]["loss"],
              (state, frozen, sharded))
    print(f"full train step: {t:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
