"""In-jit scanned A/B of the FULL CLIPSeg vision tower fwd (CoOp path:
extract layers 3/6/9, early exit) with MXU seq padding on/off — isolates
how much of the micro-layer win (scripts/micro_layer_scan.py: 6.40 -> 5.45
ms/layer) survives in the composed tower."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

LOOPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tunevlseg_tpu.models.clip import vision as vision_mod
    from tunevlseg_tpu.models.presets import build_clipseg

    model, _ = build_clipseg("coop", prompt_depth=3, num_context=4,
                             dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(64, 3, 352, 352)) * 0.5, jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 12), jnp.int32),
                           jnp.zeros((1, 3, 352, 352), jnp.bfloat16),
                           jnp.ones((1, 12), jnp.int32))

    def tower(v, x):
        hs, _, _ = model.apply(v, x, method=lambda m, xx: m.vision_model(
            xx, extract_layers=(3, 6, 9), early_exit=True))
        return sum(jnp.sum(hs[i].astype(jnp.float32)) for i in (4, 7, 10))

    def scanned(v, x):
        def body(c, _):
            # data dependency: feed the carry back into the input so XLA
            # cannot hoist the tower out of the loop
            xi = x + (c * 1e-20).astype(x.dtype)
            return tower(v, xi) * 1e-9, ()
        y, _ = lax.scan(body, jnp.zeros(()), None, length=LOOPS)
        return y

    results = {}
    fns = {}
    for mode in ("auto", "0"):
        vision_mod._PAD_SEQ = mode
        fns[mode] = jax.jit(lambda v, x, m=mode: scanned(v, x))
        float(fns[mode](variables, img))  # compile
        results[mode] = []
    for _ in range(5):
        for mode, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(variables, img))
            results[mode].append((time.perf_counter() - t0) / LOOPS * 1000)
    for mode, ts in results.items():
        print(f"pad={mode}: {np.median(ts):.2f} ms/tower-fwd "
              f"(samples {[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
