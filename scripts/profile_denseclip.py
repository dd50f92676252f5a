"""Decompose the DenseCLIP RN50@512 train step on the chip (axon-safe sync).

dcbench --train measures ~3.9 steps/s (253-257 ms/step, 12.4% MFU) at
b16@512 with launch overhead already amortized (scan=5 vs single-launch
differ by only ~4 ms), so the cost is the program itself. This times the
step's constituents (mirrors scripts/profile_cris.py):

  * fwd          model forward (logits + score map), bf16, bn_train
  * fwd+bwd      value_and_grad of the full loss (no optimizer)
  * +opt         fwd+bwd plus tx.update/apply_updates (the real carry)
  * loss-only    value_and_grad of denseclip_losses at FIXED model outputs
  * metrics      pixel_accuracy at fixed logits (argmax over 150ch @512^2)
  * step         the full jitted train step via compile_train_multistep

Every row keeps its results live through scalar/tree sums folded into the
scan carry — never `x + 0*grad` tricks, which XLA's algebraic simplifier
can fold away and silently DCE the very computation being timed (the
first version of this script under-measured fwd+bwd that way). Params
ride as jit ARGUMENTS (CLAUDE.md: baked-constant closures choke the axon
remote-compile). Writes one JSON line.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, IMG, ITERS, WINDOWS = 16, 512, 10, 5


def tree_sum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(l.dtype, jnp.floating))


def vary(x, c):
    """Loop-variant no-op (see profile_trans_seg2.vary): defeats XLA LICM,
    which hoisted this script's r4 constant-input fwd/fwd_bwd bodies out of
    the scan (the 171-vs-79ms fwd_bwd run split)."""
    import jax.numpy as jnp

    pred = jnp.asarray(c, jnp.float32) < jnp.inf
    return jnp.where(pred, x, x + jnp.ones((), x.dtype))


def timed_scan(body, init, *consts, iters=ITERS, windows=WINDOWS, tag=""):
    """Median ms of one body application; body(carry, *consts) -> carry,
    scanned in-jit so each launch runs `iters` applications."""
    import jax
    import jax.numpy as jnp

    def scanned(c, *consts):
        def step(c, _):
            return body(c, *consts), ()
        out, _ = jax.lax.scan(step, c, None, length=iters)
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
    ms = float(np.median(ts))
    if tag:
        print(f"# {tag}: {ms:.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.denseclip.loss import denseclip_losses
    from tunevlseg_tpu.models.denseclip.model import (DenseCLIP,
                                                      DenseCLIPConfig)
    from tunevlseg_tpu.training.denseclip_task import (DenseCLIPTask,
                                                       pixel_accuracy)

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
    params, extras = task._merged(state.trainable, frozen)
    variables = {"params": params, **extras, **state.model_state}

    # 1) forward only — scalar carry accumulates both outputs
    def fwd(c, variables, img):
        logits, score = model.apply(variables, vary(img, c),
                                    with_score_map=True)
        return c + jnp.sum(logits.astype(jnp.float32)) \
            + jnp.sum(score.astype(jnp.float32))

    rows["fwd_ms"] = timed_scan(fwd, jnp.zeros(()), variables,
                                batch["image"], tag="fwd")

    # 2) fwd + bwd — scalar carry accumulates the full grad-tree sum
    def loss_of(tr, model_state, frozen, batch):
        return task._loss(tr, model_state, frozen, batch,
                          jax.random.PRNGKey(0))[0]

    def fwdbwd(c, tr, model_state, frozen, batch):
        batch = dict(batch, image=vary(batch["image"], c))
        loss, grads = jax.value_and_grad(loss_of)(tr, model_state, frozen,
                                                  batch)
        return c + loss + tree_sum(grads)

    rows["fwd_bwd_ms"] = timed_scan(fwdbwd, jnp.zeros(()), state.trainable,
                                    state.model_state, frozen, batch,
                                    tag="fwd_bwd")

    # 3) fwd + bwd + optimizer — carry the REAL (params, opt_state)
    def fwdbwd_opt(carry, model_state, frozen, batch):
        import optax
        tr, opt = carry
        _, grads = jax.value_and_grad(loss_of)(tr, model_state, frozen,
                                               batch)
        updates, opt = task.tx.update(grads, opt, tr)
        return optax.apply_updates(tr, updates), opt

    rows["fwd_bwd_opt_ms"] = timed_scan(
        fwdbwd_opt, (state.trainable, state.opt_state), state.model_state,
        frozen, batch, tag="fwd_bwd_opt")

    # 4) loss-side only at fixed model outputs
    logits, score = jax.jit(
        lambda v, x: model.apply(v, x, with_score_map=True))(
            variables, batch["image"])

    def loss_only(c, logits, score, labels):
        val, grads = jax.value_and_grad(
            lambda l, s: denseclip_losses(l, s, labels, tau=cfg.tau,
                                          identity_weight=cfg.identity_weight
                                          )["loss"], argnums=(0, 1))(
            logits + c.astype(logits.dtype), score)
        return c + val + jnp.sum(grads[0].astype(jnp.float32)) \
            + jnp.sum(grads[1].astype(jnp.float32))

    rows["loss_only_ms"] = timed_scan(loss_only, jnp.zeros(()), logits,
                                      score, batch["label"],
                                      tag="loss_only")

    # 5) metrics at fixed logits
    def metr(c, logits, labels):
        return c + pixel_accuracy(logits + c.astype(logits.dtype), labels)

    rows["metrics_ms"] = timed_scan(metr, jnp.zeros(()), logits,
                                    batch["label"], tag="metrics")

    # the full step (launch-amortized) is measured by
    # `dcbench.py --train` (scan=5): PERF_r04/dcbench_train_scan.log
    rows = {k: round(v, 2) for k, v in rows.items()}
    rows.update(batch=B, img=IMG)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
