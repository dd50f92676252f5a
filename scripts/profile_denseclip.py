"""Decompose the DenseCLIP RN50@512 train step on the chip (axon-safe sync).

dcbench --train measured 3.89 steps/s (257 ms/step, 12.4% MFU) at b16@512
(PERF_r04/dcbench_train.log); this times the step's constituents to locate
the deficit (mirrors scripts/profile_cris.py / profile_trans_seg.py):

  * fwd          model forward (logits + score map), bf16, bn_train
  * fwd+bwd      value_and_grad of the full loss (no optimizer)
  * loss-only    value_and_grad of denseclip_losses at FIXED model outputs
                 (CE + resize at the 512^2 label grid: measures the
                 loss-side HBM traffic in isolation)
  * step         the full jitted train step (dcbench --train's number)

Each jit loops ITERS times in-program via lax.scan where stateless, else
python-loops with ONE scalar sync at the end (CLAUDE.md measurement rules).
Writes one JSON line per row.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, IMG, ITERS, WINDOWS = 16, 512, 10, 5


def timed_scan(make_body, init, *consts, iters=ITERS, windows=WINDOWS):
    """Median ms of one body application, body scanned in-jit.

    `consts` (weights etc.) are jit ARGUMENTS, never closure constants —
    the axon remote-compile chokes on programs with params baked in
    (CLAUDE.md perf-measurement rules)."""
    import jax
    import jax.numpy as jnp

    def scanned(c, *consts):
        def body(c, _):
            return make_body(c, *consts), ()
        out, _ = jax.lax.scan(body, c, None, length=iters)
        return out

    j = jax.jit(scanned)
    out = j(init, *consts)
    float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        out = j(init, *consts)
        float(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum())
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.denseclip.loss import denseclip_losses
    from tunevlseg_tpu.models.denseclip.model import (DenseCLIP,
                                                      DenseCLIPConfig)
    from tunevlseg_tpu.training.denseclip_task import DenseCLIPTask

    cfg = DenseCLIPConfig()
    rng = np.random.default_rng(0)
    class_ids = rng.integers(1, cfg.vocab_size - 1,
                             (cfg.num_classes, cfg.text_context_length)
                             ).astype(np.int32)
    class_ids[:, -1] = cfg.vocab_size - 1
    model = DenseCLIP(cfg, class_token_ids=class_ids, dtype=jnp.bfloat16,
                      bn_train=True)
    task = DenseCLIPTask(model, remat=False, donate_state=False)

    labels = rng.integers(0, cfg.num_classes, (B, IMG, IMG)).astype(np.int32)
    labels[:, :24] = 255
    batch = {"image": jnp.asarray(rng.normal(size=(B, 3, IMG, IMG)),
                                  jnp.float32),
             "label": jnp.asarray(labels)}
    state, frozen = task.init(jax.random.PRNGKey(0), batch)

    rows = {}

    # 1) forward only (logits + score map)
    params, extras = task._merged(state.trainable, frozen)
    variables = {"params": params, **extras, **state.model_state}

    def fwd(img, variables):
        logits, score = model.apply(variables, img, with_score_map=True)
        # keep both outputs live; fold into a same-shape carry
        return img + (jnp.sum(logits) * 0 + jnp.sum(score) * 0
                      ).astype(img.dtype)

    rows["fwd_ms"] = timed_scan(fwd, batch["image"], variables)

    # 2) fwd + bwd of the full loss (no optimizer update)
    def fwdbwd(tr, frozen, model_state, batch):
        def loss_of(trainable):
            return task._loss(trainable, model_state, frozen, batch,
                              jax.random.PRNGKey(0))[0]
        grads = jax.grad(loss_of)(tr)
        return jax.tree_util.tree_map(lambda a, b: a + 0 * b, tr, grads)

    rows["fwd_bwd_ms"] = timed_scan(fwdbwd, state.trainable, frozen,
                                    state.model_state, batch)

    # 3) loss-side only: CE + score-map resize at fixed model outputs
    logits, score = jax.jit(
        lambda v, x: model.apply(v, x, with_score_map=True))(
            variables, batch["image"])

    def loss_only(lg, labels):
        l, s = lg
        val, grads = jax.value_and_grad(
            lambda l, s: denseclip_losses(l, s, labels, tau=cfg.tau,
                                          identity_weight=cfg.identity_weight
                                          )["loss"], argnums=(0, 1))(l, s)
        return (l + grads[0] * 0, s + grads[1] * 0)

    rows["loss_only_ms"] = timed_scan(loss_only, (logits, score),
                                      batch["label"])

    # 4) the full train step (compile via the task's own jit path)
    import tunevlseg_tpu.parallel.mesh as mesh_lib
    mesh = mesh_lib.make_mesh()
    train, _ = task.compile_steps(mesh)
    st = state
    st, m = train(st, frozen, batch)
    float(m["loss"])
    ts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, m = train(st, frozen, batch)
        float(m["loss"])
        ts.append((time.perf_counter() - t0) / ITERS * 1e3)
    rows["step_ms"] = float(np.median(ts))

    rows["opt_residual_ms"] = round(rows["step_ms"] - rows["fwd_bwd_ms"], 2)
    rows = {k: round(v, 2) for k, v in rows.items()}
    rows.update(batch=B, img=IMG)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
