"""Component-level CRIS step timing on the real chip (axon-safe sync)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed(fn, args, iters=10, warmup=2):
    """fn must return a SCALAR (sum-reduce inside the jit): fetching full
    feature maps over the axon tunnel costs tens of seconds and would swamp
    the measurement."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.presets import build_cris, cris_rn50_config
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training.task import SegmentationTask

    BATCH, IMG = 64, 416
    cfg = cris_rn50_config(IMG)
    model, spec = build_cris("coop", prompt_depth=3, num_context=4,
                             config=cfg, dtype=jnp.bfloat16)
    task = SegmentationTask(model, spec, learning_rate=2e-4, donate_state=False)

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
    variables = {"params": params, **{k: v for k, v in frozen.items()
                                      if k != "params"}}

    # 1. vision tower alone (fwd)
    def _sum(t):
        import jax as _j
        return sum(jnp.sum(x.astype(jnp.float32)) for x in _j.tree_util.tree_leaves(t))

    vis = jax.jit(lambda v, x: _sum(model.apply(
        v, x, method=lambda m, xx: m.backbone_visual(xx))))
    try:
        t_vis = timed(vis, (variables, img_f))
        print(f"vision tower fwd: {t_vis:.1f} ms", flush=True)
    except Exception as e:
        print("vision-only probe failed:", type(e).__name__, str(e)[:200])

    # 1b. text tower alone (fwd)
    txt = jax.jit(lambda v, i, m: _sum(model.apply(
        v, i, m, method=lambda mm, ii, ma: mm.backbone_text(
            ii, pad_mask=(ma == 0)))))
    try:
        t_txt = timed(txt, (variables, jnp.asarray(batch["input_ids"]),
                            jnp.asarray(batch["attention_mask"])))
        print(f"text tower fwd: {t_txt:.1f} ms", flush=True)
    except Exception as e:
        print("text-only probe failed:", type(e).__name__, str(e)[:200],
              flush=True)

    # 1c. per-call dispatch overhead (axon round trip)
    noop = jax.jit(lambda x: x + 1.0)
    t_noop = timed(noop, (jnp.zeros(()),))
    print(f"dispatch+sync overhead: {t_noop:.1f} ms", flush=True)

    # 1d. head components: neck -> decoder -> proj on captured activations
    def head_fn(v, x, i, ma):
        def run(mm, xx, ii, mam):
            vis = mm.backbone_visual(xx)
            pad_mask = (mam == 0)
            tokens, state = mm.backbone_text(ii, pad_mask=pad_mask)
            fq = mm.neck(vis, state)
            fq2 = mm.decoder(fq, tokens, pad_mask, deterministic=True)
            pred = mm.proj(fq2, state)
            return vis, tokens, state, fq, fq2, pred
        return model.apply(v, x, i, ma, method=run)
    acts = jax.jit(head_fn)(variables, img_f, jnp.asarray(batch["input_ids"]),
                            jnp.asarray(batch["attention_mask"]))
    vis_a, tokens_a, state_a, fq_a, fq2_a, pred_a = acts
    pad = jnp.asarray(batch["attention_mask"]) == 0

    neck = jax.jit(lambda v, vis, st: _sum(model.apply(
        v, vis, st, method=lambda mm, a, b: mm.neck(a, b))))
    print(f"neck fwd: {timed(neck, (variables, vis_a, state_a)):.1f} ms",
          flush=True)
    dec = jax.jit(lambda v, fq, tok: _sum(model.apply(
        v, fq, tok, pad, method=lambda mm, a, b, c: mm.decoder(
            a, b, c, deterministic=True))))
    print(f"decoder fwd: {timed(dec, (variables, fq_a, tokens_a)):.1f} ms",
          flush=True)
    proj = jax.jit(lambda v, fq2, st: _sum(model.apply(
        v, fq2, st, method=lambda mm, a, b: mm.proj(a, b))))
    print(f"proj fwd: {timed(proj, (variables, fq2_a, state_a)):.1f} ms",
          flush=True)

    # 2. full forward
    fwd = jax.jit(lambda v, i, x, m: _sum(model.apply(v, i, x, m)))
    t_fwd = timed(fwd, (variables, jnp.asarray(batch["input_ids"]), img_f,
                        jnp.asarray(batch["attention_mask"])))
    print(f"full forward: {t_fwd:.1f} ms", flush=True)

    # 3. full train step
    train, _, _ = task.compile_steps(mesh)
    t_step = timed(lambda s, f, b: train(s, f, b)[1]["loss"],
                   (state, frozen, sharded))
    print(f"full train step: {t_step:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
