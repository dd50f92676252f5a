"""CRIS budget part 2 — STEP-SEMANTICS buckets (profile_cris2 measured
eval-mode pieces; the production step runs the RN50 BN in TRAINING mode
with batch_stats updates and the decoder dropout active, so its buckets
cost more). Rows:

  vision fwd (bn-train)     backbone_visual with mutable batch_stats
  head fwd+bwd (dropout)    neck+decoder+proj, deterministic=False
  loss fwd (task._loss)     the exact production forward+loss, value only
  loss-side at fixed logits dice_ce + valid masking alone

Budget closure: step(288ms) vs vision_bn + text_fwdbwd + head_fwdbwd_drop
+ loss_side + optimizer. vary() LICM guard + ITERS=25 (launch share
~1.2ms/row; noop row printed for subtraction).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, IMG, ITERS, WINDOWS = 64, 416, 25, 5


def tree_sum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(l.dtype, jnp.floating))


def vary(x, c):
    import jax.numpy as jnp

    pred = jnp.asarray(c, jnp.float32) < jnp.inf
    return jnp.where(pred, x, x + jnp.ones((), x.dtype))


def timed_scan(body, init, *consts, iters=ITERS, windows=WINDOWS, tag=""):
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
    print(f"# {tag}: {ms:.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.presets import build_cris, cris_rn50_config
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    from tunevlseg_tpu.training import optim as optim_lib
    from tunevlseg_tpu.training.task import SegmentationTask

    cfg = cris_rn50_config(IMG)
    model, spec = build_cris("coop", prompt_depth=3, num_context=4,
                             config=cfg, dtype=jnp.bfloat16)
    task = SegmentationTask(model, spec, learning_rate=2e-4,
                            donate_state=False)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(B, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 9:] = 49407
    batch = {
        "image": rng.integers(0, 255, (B, 3, IMG, IMG), dtype=np.uint8),
        "mask": (rng.random((B, 1, IMG, IMG)) > 0.7).astype(np.float32),
        "input_ids": ids,
        "attention_mask": (ids != 49407).astype(np.int32),
        "valid": np.ones((B,), np.float32),
    }
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    img_f = jnp.asarray(
        (batch["image"].astype(np.float32) / 255.0 - 0.45) / 0.22,
        jnp.bfloat16)
    idsj = jnp.asarray(ids)
    amaskj = jnp.asarray(batch["attention_mask"])
    pad = amaskj == 0
    key = jax.random.PRNGKey(1)

    params = optim_lib.merge_params(state.trainable, frozen["params"])
    variables = {"params": params, **{k: v for k, v in frozen.items()
                                      if k != "params"}, **state.model_state}
    rows = {"mutable": sorted(task.mutable_collections)}
    print(f"# mutable collections: {rows['mutable']}", flush=True)

    def noop(c, x):
        return c + jnp.sum(vary(x, c)[0, :2].astype(jnp.float32))

    rows["noop_ms"] = timed_scan(noop, jnp.zeros(()),
                                 jnp.zeros((4, 4), jnp.bfloat16),
                                 tag="noop (launch share)")

    # vision in TRAIN-BN semantics (stats computed + collection returned)
    def vis_bn(c, v, x):
        out, upd = model.apply(
            v, vary(x, c), method=lambda m, xx: m.backbone_visual(xx),
            mutable=list(task.mutable_collections) or ["batch_stats"])
        return c + tree_sum(out) + tree_sum(upd)

    rows["vision_fwd_bntrain_ms"] = timed_scan(
        vis_bn, jnp.zeros(()), variables, img_f,
        tag="vision fwd (bn-train)")

    # head with dropout active
    def head(m, vis, tokens, st, p, key):
        fq = m.neck(vis, st)
        fq2 = m.decoder(fq, tokens, p, deterministic=False)
        return m.proj(fq2, st)

    def acts_fn(m, x, i, p):
        vis = m.backbone_visual(x)
        tokens, st = m.backbone_text(i, pad_mask=p)
        return vis, tokens, st

    vis_a, tokens_a, state_a = jax.jit(
        lambda v, x, i, p: model.apply(v, x, i, p, method=acts_fn))(
            variables, img_f, idsj, pad)

    def head_loss(v, vis, tokens, st, p, key):
        out = model.apply(v, vis, tokens, st, p, key, method=head,
                          rngs={"dropout": key})
        return jnp.sum(out.astype(jnp.float32))

    def head_fwdbwd_drop(c, v, vis, tokens, st, p, key):
        vis = tuple(vary(x, c) for x in vis) if isinstance(vis, tuple) \
            else vary(vis, c)
        loss, g = jax.value_and_grad(head_loss)(v, vis, tokens, st, p, key)
        return c + loss + tree_sum(g)

    rows["head_fwdbwd_dropout_ms"] = timed_scan(
        head_fwdbwd_drop, jnp.zeros(()), variables, vis_a, tokens_a,
        state_a, pad, key, tag="head fwd+bwd (dropout)")

    # exact production forward+loss, VALUE only (no grad)
    def loss_fwd(c, tr, ms, fr, b, key):
        b = dict(b, image=vary(b["image"], c))
        out = task._loss(tr, ms, fr, b, key)
        return c + out[0]

    rows["loss_fwd_ms"] = timed_scan(
        loss_fwd, jnp.zeros(()), state.trainable, state.model_state,
        frozen, batch, key, tag="task._loss fwd (production semantics)")

    # loss-side alone at fixed logits
    logits = jax.jit(lambda v, i, x, a: model.apply(v, i, x, a))(
        variables, idsj, img_f, amaskj)
    mask = jnp.asarray(batch["mask"])
    valid = jnp.asarray(batch["valid"])

    def loss_side(c, lg, mk, vd):
        lg = vary(lg, c)
        v = vd.reshape(-1, 1, 1, 1).astype(lg.dtype)
        lg = lg * v
        from tunevlseg_tpu.ops.losses import dice_ce_loss
        from tunevlseg_tpu.ops.image import resize_2d
        if lg.shape[-1] != mk.shape[-1]:
            mk2 = resize_2d(mk, lg.shape[-2:], "nearest")
        else:
            mk2 = mk
        return c + dice_ce_loss(lg, mk2 * v)

    try:
        rows["loss_side_ms"] = timed_scan(
            loss_side, jnp.zeros(()), logits, mask, valid,
            tag="loss side at fixed logits")
    except Exception as e:
        print(f"# loss-side probe failed ({type(e).__name__}: {e}) — "
              "see task._loss for the real resize/loss composition",
              flush=True)

    print(json.dumps({"metric": f"profile_cris3_b{B}_{IMG}", **rows}),
          flush=True)


if __name__ == "__main__":
    main()
