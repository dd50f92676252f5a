"""Variant A/Bs for the two worst upsampler ops (micro_upsampler_stages:
conv3x3 @208 206->104 = 11.4 ms, conv3x3 @352 104->1 = 11.9 ms — both
~10x their HBM-traffic floor) plus the samplenorm. ITERS=50 and a noop
calibration row: at ITERS=10 the ~30 ms axon launch+readback round trip
inflates every row by ~3 ms (the flat floor visible in the stage micro).

Variants per conv:
  repl_nchw   production path (jnp.pad replicate + conv, NCHW)
  zero_nchw   native zero-pad conv (NOT parity — bound only)
  repl_nhwc   replicate pad + NHWC conv
  zero_nhwc   zero-pad NHWC conv
  border      zero-pad conv + exact border correction (parity-preserving:
              replicate pad only differs from zero pad on the 1-px ring,
              so fix the ring outputs with 4 thin edge convs)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, ITERS, WINDOWS = 32, 50, 5


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
    print(f"# {tag}: {ms:.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.nn.conv import conv2d, conv2d_nhwc

    rng = np.random.default_rng(0)
    rows = {}

    def noop(c, x):
        return c + jnp.sum(vary(x, c)[0, 0, :2].astype(jnp.float32))

    rows["noop_ms"] = timed_scan(
        noop, jnp.zeros(()), jnp.zeros((4, 4, 4), jnp.bfloat16),
        tag="noop (per-iteration overhead)")

    for (s, ci, co) in ((208, 206, 104), (352, 104, 1)):
        x = jnp.asarray(rng.normal(size=(B, ci, s, s)), jnp.bfloat16)
        xh = jnp.transpose(x, (0, 2, 3, 1))
        w = jnp.asarray(rng.normal(size=(co, ci, 3, 3)) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.normal(size=(co,)), jnp.bfloat16)
        name = f"conv{s}_{ci}to{co}"

        def repl_nchw(c, x, w, b):
            y = conv2d(vary(x, c), w, b, (1, 1), "same",
                       pad_mode="replicate")
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"{name}_repl_nchw_ms"] = timed_scan(
            repl_nchw, jnp.zeros(()), x, w, bias,
            tag=f"{name} replicate nchw (production)")

        def zero_nchw(c, x, w, b):
            y = conv2d(vary(x, c), w, b, (1, 1), "same", pad_mode="zeros")
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"{name}_zero_nchw_ms"] = timed_scan(
            zero_nchw, jnp.zeros(()), x, w, bias, tag=f"{name} zeros nchw")

        def repl_nhwc(c, x, w, b):
            y = conv2d_nhwc(vary(x, c), w, b, (1, 1), "same",
                            pad_mode="replicate")
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"{name}_repl_nhwc_ms"] = timed_scan(
            repl_nhwc, jnp.zeros(()), xh, w, bias,
            tag=f"{name} replicate nhwc")

        def zero_nhwc(c, x, w, b):
            y = conv2d_nhwc(vary(x, c), w, b, (1, 1), "same",
                            pad_mode="zeros")
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"{name}_zero_nhwc_ms"] = timed_scan(
            zero_nhwc, jnp.zeros(()), xh, w, bias, tag=f"{name} zeros nhwc")

        # border-corrected: zero-pad conv everywhere + replicate-exact
        # recomputation of the 1-px output ring (y differs from the
        # zero-pad result only there)
        def border(c, x, w, b):
            x = vary(x, c)
            y = conv2d(x, w, b, (1, 1), "same", pad_mode="zeros")
            # recompute the four edge rows/cols with replicate semantics:
            # take the 2-row/col input strips, replicate-pad, VALID conv
            top = conv2d(jnp.pad(x[:, :, :2, :],
                                 ((0, 0), (0, 0), (1, 0), (1, 1)),
                                 mode="edge"), w, b, (1, 1), 0)[:, :, :1]
            bot = conv2d(jnp.pad(x[:, :, -2:, :],
                                 ((0, 0), (0, 0), (0, 1), (1, 1)),
                                 mode="edge"), w, b, (1, 1), 0)[:, :, -1:]
            lef = conv2d(jnp.pad(x[:, :, :, :2],
                                 ((0, 0), (0, 0), (1, 1), (1, 0)),
                                 mode="edge"), w, b, (1, 1), 0)[:, :, :, :1]
            rig = conv2d(jnp.pad(x[:, :, :, -2:],
                                 ((0, 0), (0, 0), (1, 1), (0, 1)),
                                 mode="edge"), w, b, (1, 1), 0)[:, :, :, -1:]
            y = y.at[:, :, :1, :].set(top)
            y = y.at[:, :, -1:, :].set(bot)
            y = y.at[:, :, :, :1].set(lef)
            y = y.at[:, :, :, -1:].set(rig)
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"{name}_border_ms"] = timed_scan(
            border, jnp.zeros(()), x, w, bias,
            tag=f"{name} zero+border-corrected")

        # correctness of the border trick vs production (once, small tol)
        ref = conv2d(x, w, bias, (1, 1), "same", pad_mode="replicate")
        yz = conv2d(x, w, bias, (1, 1), "same", pad_mode="zeros")
        top = conv2d(jnp.pad(x[:, :, :2, :],
                             ((0, 0), (0, 0), (1, 0), (1, 1)),
                             mode="edge"), w, bias, (1, 1), 0)[:, :, :1]
        bot = conv2d(jnp.pad(x[:, :, -2:, :],
                             ((0, 0), (0, 0), (0, 1), (1, 1)),
                             mode="edge"), w, bias, (1, 1), 0)[:, :, -1:]
        lef = conv2d(jnp.pad(x[:, :, :, :2],
                             ((0, 0), (0, 0), (1, 1), (1, 0)),
                             mode="edge"), w, bias, (1, 1), 0)[:, :, :, :1]
        rig = conv2d(jnp.pad(x[:, :, :, -2:],
                             ((0, 0), (0, 0), (1, 1), (0, 1)),
                             mode="edge"), w, bias, (1, 1), 0)[:, :, :, -1:]
        yz = yz.at[:, :, :1, :].set(top)
        yz = yz.at[:, :, -1:, :].set(bot)
        yz = yz.at[:, :, :, :1].set(lef)
        yz = yz.at[:, :, :, -1:].set(rig)
        err = float(jnp.max(jnp.abs((yz - ref).astype(jnp.float32))))
        print(f"# {name} border-corrected max|err| vs replicate: {err:.2e}",
              flush=True)
        rows[f"{name}_border_err"] = err

    # samplenorm variants at the 208 c104 shape
    xn = jnp.asarray(rng.normal(size=(B, 104, 208, 208)), jnp.bfloat16)

    def ln_f32(c, x):
        x = vary(x, c)
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        v = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        return c + jnp.sum((xf - m) * jax.lax.rsqrt(v + 1e-5))

    rows["samplenorm208_f32_ms"] = timed_scan(
        ln_f32, jnp.zeros(()), xn, tag="samplenorm @208 c104 (f32 math)")

    print(json.dumps({"metric": f"micro_upsampler_variants_b{B}", **rows}),
          flush=True)


if __name__ == "__main__":
    main()
