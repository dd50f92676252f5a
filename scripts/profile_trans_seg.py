"""Component-level TransformerSegmentor timing on the chip (axon-safe sync).

b32@352 full fine-tune runs at 4.20 steps/s (238 ms/step, 36.9% MFU);
this breaks the forward into towers / decoder / upsampler to locate the
deficit (mirrors scripts/profile_cris.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.models.trans_segmentor.model import (
        TransformerSegmentor, TransSegmentorConfig)
    from tunevlseg_tpu.training.optim import FreezeSpec
    from tunevlseg_tpu.training.task import SegmentationTask

    B, IMG = 32, 352
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
    params = model.init(jax.random.PRNGKey(0), idsj, pix, amaskj)

    def s(x):
        return jnp.sum(x.astype(jnp.float32))

    noop = jax.jit(lambda p: s(p["params"]["text_projection"]["kernel"])
                   if "text_projection" in p["params"] else 0.0)
    print(f"dispatch+sync overhead: {timed(noop, (params,)):.1f} ms")

    vis = jax.jit(lambda p, x: s(model.apply(
        p, x, method=lambda m, xx: m.vision_model(xx)[1])))
    print(f"vision tower fwd: {timed(vis, (params, pix)):.1f} ms")

    txt = jax.jit(lambda p, i, a: s(model.apply(
        p, i, a, method=lambda m, ii, aa: m.text_model(ii, aa)[0])))
    print(f"text tower fwd: {timed(txt, (params, idsj, amaskj)):.1f} ms")

    full = jax.jit(lambda p, i, x, a: s(model.apply(p, i, x, a)))
    print(f"full forward: {timed(full, (params, idsj, pix, amaskj)):.1f} ms")

    # donate_state=False: the probe calls train() repeatedly with the SAME
    # state arrays; donation would invalidate them after the first call
    task = SegmentationTask(model, FreezeSpec(freeze_all=False,
                                              family="trans_segmentor"),
                            learning_rate=1e-4, donate_state=False)
    batch = {
        "image": rng.integers(0, 255, (B, 3, IMG, IMG), dtype=np.uint8),
        "mask": (rng.random((B, 1, IMG, IMG)) > 0.7).astype(np.float32),
        "input_ids": ids, "attention_mask": amask,
        "valid": np.ones((B,), np.float32),
    }
    from tunevlseg_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(1)
    state, frozen = task.init(jax.random.PRNGKey(0), batch)
    train, _, _ = task.compile_steps(mesh)

    def step(st, fr, b):
        st2, m = train(st, fr, b)
        return m["loss"]

    print(f"full train step: {timed(step, (state, frozen, batch)):.1f} ms")


if __name__ == "__main__":
    main()
