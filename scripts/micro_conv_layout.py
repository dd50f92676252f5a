"""In-jit scanned A/B: NCHW vs NHWC conv layout for a CRIS RN50-ish
bottleneck chain (the framework keeps torch's NCHW at the API; XLA:TPU
re-lays out internally — this measures whether an explicit NHWC path would
buy anything, CLAUDE.md TODO 'NHWC layout study for the RN50 conv stack').

Chain: 1x1 C->C/4, 3x3 C/4->C/4, 1x1 C/4->C (+residual, relu) at the RN50
stage-3 shape for CRIS b64@416 (C=1024, 26x26) and stage-2 (C=512, 52x52).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

LOOPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def bottleneck(layout):
        # dimension_numbers per layout; weights stay OIHW-equivalent
        if layout == "NCHW":
            dn = ("NCHW", "OIHW", "NCHW")
        else:
            dn = ("NHWC", "HWIO", "NHWC")

        def fn(x, w1, w2, w3):
            def conv(x, w, pad):
                return lax.conv_general_dilated(
                    x, w, (1, 1), pad, dimension_numbers=dn)
            h = jax.nn.relu(conv(x, w1, "VALID"))
            h = jax.nn.relu(conv(h, w2, "SAME"))
            h = conv(h, w3, "VALID")
            return jax.nn.relu(x + h)
        return fn

    for C, HW in ((1024, 26), (512, 52)):
        B, Cm = 64, C // 4
        x_nchw = jnp.asarray(rng.normal(size=(B, C, HW, HW)) * 0.1,
                             jnp.bfloat16)
        x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
        w1 = jnp.asarray(rng.normal(size=(Cm, C, 1, 1)) * 0.02, jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(Cm, Cm, 3, 3)) * 0.02, jnp.bfloat16)
        w3 = jnp.asarray(rng.normal(size=(C, Cm, 1, 1)) * 0.02, jnp.bfloat16)
        # OIHW -> HWIO
        hwio = lambda w: jnp.transpose(w, (2, 3, 1, 0))

        cases = {
            "NCHW": (bottleneck("NCHW"), (x_nchw, w1, w2, w3)),
            "NHWC": (bottleneck("NHWC"),
                     (x_nhwc, hwio(w1), hwio(w2), hwio(w3))),
        }

        fns = {}
        for name, (fn, args) in cases.items():
            def run(x, a, b, c, fn=fn):
                def body(carry, _):
                    return (fn(carry, a, b, c) * 0.5).astype(jnp.bfloat16), ()
                y, _ = lax.scan(body, x, None, length=LOOPS)
                return jnp.sum(y.astype(jnp.float32))
            fns[name] = (jax.jit(run), args)
            float(fns[name][0](*args))  # compile

        times = {k: [] for k in fns}
        for _ in range(5):
            for name, (fn, args) in fns.items():
                t0 = time.perf_counter()
                float(fn(*args))
                times[name].append((time.perf_counter() - t0) / LOOPS * 1000)
        for name, ts in times.items():
            print(f"C={C} {HW}x{HW} {name}: {np.median(ts):.3f} ms/block "
                  f"(samples {[round(t, 3) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
