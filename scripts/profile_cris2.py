"""Whole-step budget of the CRIS b64@416 CoOp train step (VERDICT r4 #3).

Consolidates the micro evidence (micro_rn50.py, micro_conv_early.py,
docs/ROOFLINE.md) into ONE chip-measured accounting whose buckets must sum
to within ~10% of the measured 288 ms step:

  vision fwd      frozen RN50+attnpool (no trainable ancestor under CoOp,
                  so the real step never runs its backward)
  text fwd/bwd    CLIP text tower with CoOp context (context grads)
  head fwd/bwd    neck -> decoder -> projector at captured activations
                  (the trainable head)
  tails           AdamW at fixed grads, dice-ce loss at fixed logits
  whole           full fwd, full fwd+bwd, production train step

Timing discipline: in-jit lax.scan loops (host-contention tolerant), ONE
scalar read as the axon sync barrier, params as jit args (CLAUDE.md).
Reference call stack: SURVEY §3.3 (src/models/core_models/cris.py).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, IMG, ITERS, WINDOWS = 64, 416, 10, 5


def tree_sum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(l.dtype, jnp.floating))


def vary(x, c):
    """Loop-variant no-op: ties `x` to the scan carry `c` so XLA cannot
    hoist a constant-input body out of the timing loop (LICM — see
    profile_trans_seg2.vary). `c < inf` is dynamically true but not
    provably so; `where` with a dynamic predicate survives the algebraic
    simplifier."""
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
    if tag:
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
    mesh = mesh_lib.make_mesh(1)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    img_f = jnp.asarray(
        (batch["image"].astype(np.float32) / 255.0 - 0.45) / 0.22,
        jnp.bfloat16)
    idsj = jnp.asarray(ids)
    amaskj = jnp.asarray(batch["attention_mask"])
    pad = amaskj == 0

    params = optim_lib.merge_params(state.trainable, frozen["params"])
    variables = {"params": params, **{k: v for k, v in frozen.items()
                                      if k != "params"}}
    rows = {}

    # ---- forward buckets -------------------------------------------------
    def vis_fwd(c, v, x):
        out = model.apply(v, vary(x, c),
                          method=lambda m, xx: m.backbone_visual(xx))
        return c + tree_sum(out)

    rows["vision_fwd_ms"] = timed_scan(vis_fwd, jnp.zeros(()), variables,
                                       img_f, tag="vision (RN50) fwd")

    def txt_fwd(c, v, i, p):
        i = vary(i, c)
        tok, st = model.apply(v, i, p, method=lambda m, ii, pp:
                              m.backbone_text(ii, pad_mask=pp))
        return c + jnp.sum(tok.astype(jnp.float32)) \
            + jnp.sum(st.astype(jnp.float32))

    rows["text_fwd_ms"] = timed_scan(txt_fwd, jnp.zeros(()), variables,
                                     idsj, pad, tag="text fwd")

    # captured activations for the head buckets
    def acts_fn(m, x, i, p):
        vis = m.backbone_visual(x)
        tokens, st = m.backbone_text(i, pad_mask=p)
        return vis, tokens, st

    vis_a, tokens_a, state_a = jax.jit(
        lambda v, x, i, p: model.apply(v, x, i, p, method=acts_fn))(
            variables, img_f, idsj, pad)

    def head(m, vis, tokens, st, p):
        fq = m.neck(vis, st)
        fq2 = m.decoder(fq, tokens, p, deterministic=True)
        return m.proj(fq2, st)

    def head_fwd(c, v, vis, tokens, st, p):
        vis = tuple(vary(x, c) for x in vis) if isinstance(vis, tuple) \
            else vary(vis, c)
        out = model.apply(v, vis, tokens, st, p, method=head)
        return c + jnp.sum(out.astype(jnp.float32))

    rows["head_fwd_ms"] = timed_scan(head_fwd, jnp.zeros(()), variables,
                                     vis_a, tokens_a, state_a, pad,
                                     tag="head (neck+decoder+proj) fwd")

    def full_fwd(c, v, i, x, a):
        out = model.apply(v, i, vary(x, c), a)
        return c + jnp.sum(out.astype(jnp.float32))

    rows["full_fwd_ms"] = timed_scan(full_fwd, jnp.zeros(()), variables,
                                     idsj, img_f, amaskj, tag="full fwd")

    # ---- backward buckets ------------------------------------------------
    def txt_loss(v, i, p):
        tok, st = model.apply(v, i, p, method=lambda m, ii, pp:
                              m.backbone_text(ii, pad_mask=pp))
        return jnp.sum(tok.astype(jnp.float32)) \
            + jnp.sum(st.astype(jnp.float32))

    def txt_fwdbwd(c, v, i, p):
        loss, g = jax.value_and_grad(txt_loss)(v, vary(i, c), p)
        return c + loss + tree_sum(g)

    rows["text_fwdbwd_ms"] = timed_scan(txt_fwdbwd, jnp.zeros(()), variables,
                                        idsj, pad, tag="text fwd+bwd")

    def head_loss(v, vis, tokens, st, p):
        out = model.apply(v, vis, tokens, st, p, method=head)
        return jnp.sum(out.astype(jnp.float32))

    def head_fwdbwd(c, v, vis, tokens, st, p):
        vis = tuple(vary(x, c) for x in vis) if isinstance(vis, tuple) \
            else vary(vis, c)
        loss, g = jax.value_and_grad(head_loss)(v, vis, tokens, st, p)
        return c + loss + tree_sum(g)

    rows["head_fwdbwd_ms"] = timed_scan(head_fwdbwd, jnp.zeros(()),
                                        variables, vis_a, tokens_a, state_a,
                                        pad, tag="head fwd+bwd")

    # vision fwd+bwd too — NOT part of the CoOp step (frozen, no trainable
    # ancestor); measured to show what full fine-tune would add
    def vis_loss(v, x):
        return tree_sum(model.apply(
            v, x, method=lambda m, xx: m.backbone_visual(xx)))

    def vis_fwdbwd(c, v, x):
        loss, g = jax.value_and_grad(vis_loss)(v, vary(x, c))
        return c + loss + tree_sum(g)

    rows["vision_fwdbwd_ms_not_in_step"] = timed_scan(
        vis_fwdbwd, jnp.zeros(()), variables, img_f,
        tag="vision fwd+bwd (not in CoOp step)")

    # ---- tails + whole ---------------------------------------------------
    def loss_of(tr, model_state, frozen, batch):
        return task._loss(tr, model_state, frozen, batch,
                          jax.random.PRNGKey(0))[0]

    def fwdbwd(c, tr, ms, fr, b):
        b = dict(b, image=vary(b["image"], c))
        loss, grads = jax.value_and_grad(loss_of)(tr, ms, fr, b)
        return c + loss + tree_sum(grads)

    rows["full_fwdbwd_ms"] = timed_scan(fwdbwd, jnp.zeros(()),
                                        state.trainable, state.model_state,
                                        frozen, batch, tag="full fwd+bwd")

    grads = jax.jit(jax.grad(loss_of))(state.trainable, state.model_state,
                                       frozen, batch)

    def opt_only(carry, grads):
        import optax
        tr, opt = carry
        updates, opt = task.tx.update(grads, opt, tr)
        return optax.apply_updates(tr, updates), opt

    rows["optimizer_ms"] = timed_scan(opt_only,
                                      (state.trainable, state.opt_state),
                                      grads, tag="optimizer only")

    train, _, _ = task.compile_steps(mesh)
    st = state
    train(st, frozen, batch)
    float(jax.tree_util.tree_leaves(st.trainable)[0].astype(
        jnp.float32).sum())
    ts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st, m = train(st, frozen, batch)
        float(m["loss"])
        float(jax.tree_util.tree_leaves(st.trainable)[0].astype(
            jnp.float32).sum())
        ts.append((time.perf_counter() - t0) / ITERS * 1e3)
    rows["train_step_ms"] = float(np.median(ts))
    print(f"# train step: {rows['train_step_ms']:.2f} ms", flush=True)

    rows["derived"] = {
        "text_bwd_ms": rows["text_fwdbwd_ms"] - rows["text_fwd_ms"],
        "head_bwd_ms": rows["head_fwdbwd_ms"] - rows["head_fwd_ms"],
        "bucket_sum_ms": (rows["vision_fwd_ms"] + rows["text_fwdbwd_ms"]
                          + rows["head_fwdbwd_ms"] + rows["optimizer_ms"]),
    }
    print(json.dumps({"metric": f"profile_cris_b{B}_{IMG}", **rows}),
          flush=True)


if __name__ == "__main__":
    main()
