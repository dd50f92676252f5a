"""Whole-step decomposition of the trans_seg b32@352 full-FT train step
(VERDICT r4 #2 — the DenseCLIP-style bucket accounting that bought 2.2x
there: PERF_r04/profile_denseclip2.log).

Buckets (each timed with an IN-JIT lax.scan loop — contention-tolerant,
one scalar read as the axon-safe barrier; params ride as jit args):

  fwd side     vision tower / text tower / decoder+upsampler (at fixed
               embeddings) / upsampler alone / full forward
  bwd side     same splits via value_and_grad (bwd-only = fwdbwd - fwd)
  tails        AdamW update at fixed grads (210M params), dice-ce loss +
               metrics at fixed logits
  whole        full fwd+bwd, fwd+bwd+opt, and the production train step

The closing table must sum to within ~10% of the measured step; any bucket
above its component floor becomes a measured A/B (docs/ROOFLINE.md).
Reference recipe: configs/experiment/phrasecut.yaml surface (full
fine-tune, reference src/models/core_models/trans_segmentor).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, IMG, ITERS, WINDOWS = 32, 352, 10, 5


def tree_sum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(l.dtype, jnp.floating))


def vary(x, c):
    """Loop-variant no-op: ties `x` to the scan carry `c` so XLA cannot
    hoist a constant-input body out of the timing loop (LICM would turn a
    10-iteration scan into one tower execution + 9 scalar adds — the r4
    DenseCLIP profile's unstable fwd_bwd row, 171 vs 79 ms across runs, is
    this failure mode). `c < inf` is dynamically true but not provably so,
    and `where` with a dynamic predicate survives the algebraic
    simplifier (unlike `x + 0*c`)."""
    import jax.numpy as jnp

    pred = jnp.asarray(c, jnp.float32) < jnp.inf
    return jnp.where(pred, x, x + jnp.ones((), x.dtype))


def timed_scan(body, init, *consts, iters=ITERS, windows=WINDOWS, tag=""):
    """Median ms of one body application; body(carry, *consts) -> carry,
    scanned in-jit so each launch runs `iters` applications. Bodies MUST
    route at least one input through `vary(x, carry)`."""
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
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.trans_segmentor.model import (
        TransformerSegmentor, TransSegmentorConfig)
    from tunevlseg_tpu.training.optim import FreezeSpec
    from tunevlseg_tpu.training.task import SegmentationTask

    cfg = dataclasses.replace(TransSegmentorConfig(), image_size=IMG,
                              decoder_dropout=0.0)
    model = TransformerSegmentor(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(B, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 9:] = 49407
    amask = (ids != 49407).astype(np.int32)
    pix = jnp.asarray(rng.normal(size=(B, 3, IMG, IMG)), jnp.bfloat16)
    idsj, amaskj = jnp.asarray(ids), jnp.asarray(amask)
    variables = model.init(jax.random.PRNGKey(0), idsj, pix, amaskj)

    task = SegmentationTask(model, FreezeSpec(freeze_all=False,
                                              family="trans_segmentor"),
                            learning_rate=1e-4, donate_state=False)
    batch = {
        "image": rng.integers(0, 255, (B, 3, IMG, IMG), dtype=np.uint8),
        "mask": (rng.random((B, 1, IMG, IMG)) > 0.7).astype(np.float32),
        "input_ids": ids, "attention_mask": amask,
        "valid": np.ones((B,), np.float32),
    }
    state, frozen = task.init(jax.random.PRNGKey(0), batch)

    rows = {}

    # ---- forward buckets -------------------------------------------------
    def vis_fwd(c, v, x):
        x = vary(x, c)
        _, hidden, _ = model.apply(v, x,
                                   method=lambda m, xx: m.vision_model(xx))
        return c + jnp.sum(hidden.astype(jnp.float32))

    rows["vision_fwd_ms"] = timed_scan(vis_fwd, jnp.zeros(()), variables,
                                       pix, tag="vision fwd")

    def txt_fwd(c, v, i, a):
        i = vary(i, c)
        hidden, _ = model.apply(v, i, a,
                                method=lambda m, ii, aa: m.text_model(ii, aa))
        return c + jnp.sum(hidden.astype(jnp.float32))

    rows["text_fwd_ms"] = timed_scan(txt_fwd, jnp.zeros(()), variables,
                                     idsj, amaskj, tag="text fwd")

    # fixed embeddings for the decoder-side buckets (pos enc + projections
    # + memory bias applied once, outside the timed region — the model has
    # no projections at CLIP dims, but keep the same code path)
    def embeds(m, i, x, a):
        text_hidden, _ = m.text_model(i, attention_mask=a)
        te = (m.text_projection(text_hidden)
              if m.text_projection is not None else text_hidden)
        _, image_hidden, _ = m.vision_model(x)
        ie = (m.visual_projection(image_hidden)
              if m.visual_projection is not None else image_hidden)
        return te, ie

    te, ie = jax.jit(lambda v, i, x, a: model.apply(
        v, i, x, a, method=embeds))(variables, idsj, pix, amaskj)
    neg = jnp.finfo(jnp.float32).min
    mem_bias = jnp.where(amaskj[:, None, None, :] == 0, neg, 0.0)

    def dec_up(m, ie, te, bias):
        import math as _m
        x = ie
        for layer in m.decoder_layers:
            x = layer(x, te, bias, deterministic=True)
        x = m.decoder_norm(x)
        seq = x.shape[1]
        side = _m.isqrt(seq)
        if side * side != seq:
            x = x[:, 1:]
            side = _m.isqrt(x.shape[1])
        x = x.transpose(0, 2, 1).reshape(x.shape[0], -1, side, side)
        return m.upsampler(x)

    def decup_fwd(c, v, ie, te, bias):
        out = model.apply(v, vary(ie, c), te, bias, method=dec_up)
        return c + jnp.sum(out.astype(jnp.float32))

    rows["decoder_upsampler_fwd_ms"] = timed_scan(
        decup_fwd, jnp.zeros(()), variables, ie, te, mem_bias,
        tag="decoder+upsampler fwd")

    # upsampler input = decoder output: (B, proj_dim, side, side) after the
    # CLS strip (522 tokens -> 484 -> 22x22 at 352/16)
    side = int(np.sqrt(ie.shape[1] - 1))
    xs = jnp.asarray(rng.normal(size=(B, ie.shape[-1], side, side)),
                     jnp.bfloat16)

    def up_fwd(c, v, x):
        out = model.apply(v, vary(x, c),
                          method=lambda m, xx: m.upsampler(xx))
        return c + jnp.sum(out.astype(jnp.float32))

    rows["upsampler_fwd_ms"] = timed_scan(up_fwd, jnp.zeros(()), variables,
                                          xs, tag="upsampler fwd")

    def full_fwd(c, v, i, x, a):
        out = model.apply(v, i, vary(x, c), a)
        return c + jnp.sum(out.astype(jnp.float32))

    rows["full_fwd_ms"] = timed_scan(full_fwd, jnp.zeros(()), variables,
                                     idsj, pix, amaskj, tag="full fwd")

    # ---- backward buckets ------------------------------------------------
    def vis_loss(v, x):
        _, hidden, _ = model.apply(v, x,
                                   method=lambda m, xx: m.vision_model(xx))
        return jnp.sum(hidden.astype(jnp.float32))

    def vis_fwdbwd(c, v, x):
        loss, g = jax.value_and_grad(vis_loss)(v, vary(x, c))
        return c + loss + tree_sum(g)

    rows["vision_fwdbwd_ms"] = timed_scan(vis_fwdbwd, jnp.zeros(()),
                                          variables, pix, tag="vision fwd+bwd")

    def txt_loss(v, i, a):
        hidden, _ = model.apply(v, i, a,
                                method=lambda m, ii, aa: m.text_model(ii, aa))
        return jnp.sum(hidden.astype(jnp.float32))

    def txt_fwdbwd(c, v, i, a):
        loss, g = jax.value_and_grad(txt_loss)(v, vary(i, c), a)
        return c + loss + tree_sum(g)

    rows["text_fwdbwd_ms"] = timed_scan(txt_fwdbwd, jnp.zeros(()), variables,
                                        idsj, amaskj, tag="text fwd+bwd")

    def decup_loss(v, ie, te, bias):
        out = model.apply(v, ie, te, bias, method=dec_up)
        return jnp.sum(out.astype(jnp.float32))

    def decup_fwdbwd(c, v, ie, te, bias):
        loss, g = jax.value_and_grad(decup_loss)(v, vary(ie, c), te, bias)
        return c + loss + tree_sum(g)

    rows["decoder_upsampler_fwdbwd_ms"] = timed_scan(
        decup_fwdbwd, jnp.zeros(()), variables, ie, te, mem_bias,
        tag="decoder+upsampler fwd+bwd")

    # ---- tails -----------------------------------------------------------
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

    def fwdbwd_opt(carry, ms, fr, b):
        import optax
        tr, opt = carry
        _, grads = jax.value_and_grad(loss_of)(tr, ms, fr, b)
        updates, opt = task.tx.update(grads, opt, tr)
        return optax.apply_updates(tr, updates), opt

    rows["fwdbwd_opt_ms"] = timed_scan(fwdbwd_opt,
                                       (state.trainable, state.opt_state),
                                       state.model_state, frozen, batch,
                                       tag="fwd+bwd+opt")

    # production step (compile_steps path: loss + metrics + opt + counters)
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(1)
    train, _, _ = task.compile_steps(mesh)
    st = state
    train(st, frozen, batch)  # compile
    float(jax.tree_util.tree_leaves(st.trainable)[0].sum())
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
        "vision_bwd_ms": rows["vision_fwdbwd_ms"] - rows["vision_fwd_ms"],
        "text_bwd_ms": rows["text_fwdbwd_ms"] - rows["text_fwd_ms"],
        "decup_bwd_ms": (rows["decoder_upsampler_fwdbwd_ms"]
                         - rows["decoder_upsampler_fwd_ms"]),
        "towers_plus_decup_fwdbwd_ms": (
            rows["vision_fwdbwd_ms"] + rows["text_fwdbwd_ms"]
            + rows["decoder_upsampler_fwdbwd_ms"]),
        "bucket_sum_vs_step_ms": (
            rows["vision_fwdbwd_ms"] + rows["text_fwdbwd_ms"]
            + rows["decoder_upsampler_fwdbwd_ms"] + rows["optimizer_ms"]),
    }
    print(json.dumps({"metric": f"profile_trans_seg_b{B}_{IMG}", **rows}),
          flush=True)


if __name__ == "__main__":
    main()
