"""CRIS head decomposition — neck / decoder / proj, fwd and fwd+bwd,
hardened (vary() + ITERS=25). The r4 per-component numbers came from
host-loop probes whose ~30 ms/call dispatch dominated; the r5 budget
(profile_cris2/3) measured the WHOLE head at 53.9 ms fwd / 157.7 eval
fwd+bwd but never split it. b64@416, bf16, eval semantics (the CoOp step's:
BN eval; dropout measured separately in profile_cris3).
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


def vary_t(t, c):
    return tuple(vary(x, c) for x in t) if isinstance(t, tuple) else vary(t, c)


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
    pad = jnp.asarray(batch["attention_mask"]) == 0

    params = optim_lib.merge_params(state.trainable, frozen["params"])
    variables = {"params": params, **{k: v for k, v in frozen.items()
                                      if k != "params"}}
    rows = {}

    def acts_fn(m, x, i, p):
        vis = m.backbone_visual(x)
        tokens, st = m.backbone_text(i, pad_mask=p)
        fq = m.neck(vis, st)
        fq2 = m.decoder(fq, tokens, p, deterministic=True)
        return vis, tokens, st, fq, fq2

    vis_a, tokens_a, state_a, fq_a, fq2_a = jax.jit(
        lambda v, x, i, p: model.apply(v, x, i, p, method=acts_fn))(
            variables, img_f, idsj, pad)
    print(f"# shapes: fq {fq_a.shape} fq2 {fq2_a.shape} "
          f"vis {[tuple(x.shape) for x in vis_a]}", flush=True)

    def neck_fwd(c, v, vis, st):
        out = model.apply(v, vary_t(vis, c), st,
                          method=lambda m, a, b: m.neck(a, b))
        return c + jnp.sum(out.astype(jnp.float32))

    rows["neck_fwd_ms"] = timed_scan(neck_fwd, jnp.zeros(()), variables,
                                     vis_a, state_a, tag="neck fwd")

    def dec_fwd(c, v, fq, tok, p):
        out = model.apply(v, vary(fq, c), tok, p,
                          method=lambda m, a, b, pp: m.decoder(
                              a, b, pp, deterministic=True))
        return c + jnp.sum(out.astype(jnp.float32))

    rows["decoder_fwd_ms"] = timed_scan(dec_fwd, jnp.zeros(()), variables,
                                        fq_a, tokens_a, pad, tag="decoder fwd")

    def proj_fwd(c, v, fq2, st):
        out = model.apply(v, vary(fq2, c), st,
                          method=lambda m, a, b: m.proj(a, b))
        return c + jnp.sum(out.astype(jnp.float32))

    rows["proj_fwd_ms"] = timed_scan(proj_fwd, jnp.zeros(()), variables,
                                     fq2_a, state_a, tag="proj fwd")

    def neck_loss(v, vis, st):
        return jnp.sum(model.apply(
            v, vis, st, method=lambda m, a, b: m.neck(a, b)
        ).astype(jnp.float32))

    def neck_fwdbwd(c, v, vis, st):
        loss, g = jax.value_and_grad(neck_loss)(v, vary_t(vis, c), st)
        return c + loss + tree_sum(g)

    rows["neck_fwdbwd_ms"] = timed_scan(neck_fwdbwd, jnp.zeros(()),
                                        variables, vis_a, state_a,
                                        tag="neck fwd+bwd")

    def dec_loss(v, fq, tok, p):
        return jnp.sum(model.apply(
            v, fq, tok, p, method=lambda m, a, b, pp: m.decoder(
                a, b, pp, deterministic=True)).astype(jnp.float32))

    def dec_fwdbwd(c, v, fq, tok, p):
        loss, g = jax.value_and_grad(dec_loss)(v, vary(fq, c), tok, p)
        return c + loss + tree_sum(g)

    rows["decoder_fwdbwd_ms"] = timed_scan(dec_fwdbwd, jnp.zeros(()),
                                           variables, fq_a, tokens_a, pad,
                                           tag="decoder fwd+bwd")

    def proj_loss(v, fq2, st):
        return jnp.sum(model.apply(
            v, fq2, st, method=lambda m, a, b: m.proj(a, b)
        ).astype(jnp.float32))

    def proj_fwdbwd(c, v, fq2, st):
        loss, g = jax.value_and_grad(proj_loss)(v, vary(fq2, c), st)
        return c + loss + tree_sum(g)

    rows["proj_fwdbwd_ms"] = timed_scan(proj_fwdbwd, jnp.zeros(()),
                                        variables, fq2_a, state_a,
                                        tag="proj fwd+bwd")

    rows["sum_fwdbwd_ms"] = (rows["neck_fwdbwd_ms"]
                             + rows["decoder_fwdbwd_ms"]
                             + rows["proj_fwdbwd_ms"])
    print(f"# head fwd+bwd bucket sum: {rows['sum_fwdbwd_ms']:.1f} "
          "(whole-head probe measured 157.7)", flush=True)
    print(json.dumps({"metric": f"profile_cris4_head_b{B}_{IMG}", **rows}),
          flush=True)


if __name__ == "__main__":
    main()
