"""Measure the CoOp text tower's share of the flagship step (chip probe).

Motivates text-dedup: with prompt_index=0 on a single-class dataset every
batch row carries the SAME prompt (reference ImageTextMaskDataset prompt
selection, src/data/core_datasets/image_text_mask_dataset.py:101-128), yet
the text tower runs batch_size times. Dedup (compute U unique rows, gather)
is numerically exact; this probe bounds the e2e win before building it.

Timings loop in-jit (lax.scan) per the repo measurement rules; one scalar
read as the sync barrier.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

ITERS = 30


def timed_scan(fn, args, iters=ITERS, warmup=1):
    """fn must be a jitted callable returning a scalar."""
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tunevlseg_tpu.models.presets import build_clipseg

    BATCH = 64
    model, spec = build_clipseg("coop", prompt_depth=3, num_context=4,
                                dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 1000, size=(BATCH, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, 9:] = 49407
    mask = (ids != 49407).astype(np.int32)

    img = jnp.asarray(rng.standard_normal((BATCH, 3, 352, 352)), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), img,
                           jnp.asarray(mask))

    def text_only(m, i, am):
        stacks = m.learner()
        _, pooled = m.text_model(i, attention_mask=am, text_ctx=stacks.text,
                                 prompt_depth=m.learner.prompt_depth)
        return m.text_projection(pooled)

    def scan_text(v, i, am):
        def body(c, _):
            out = model.apply(v, i, am, method=text_only)
            return c + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return acc

    def scan_text_grad(v, i, am):
        def loss(vv):
            out = model.apply(vv, i, am, method=text_only)
            return jnp.sum(out.astype(jnp.float32))

        def body(c, _):
            l, g = jax.value_and_grad(loss)(v)
            return c + l + jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0), None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=ITERS)
        return acc

    jt = jax.jit(scan_text)
    jg = jax.jit(scan_text_grad)

    for b in (BATCH, 1):
        i = jnp.asarray(ids[:b])
        am = jnp.asarray(mask[:b])
        t_f = timed_scan(jt, (variables, i, am))
        t_g = timed_scan(jg, (variables, i, am))
        print(f"text tower B={b}: fwd {t_f:.2f} ms  fwd+bwd(all-params) "
              f"{t_g:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
