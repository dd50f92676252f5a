"""r4: NCHW vs NHWC for the trans_seg upsampler stages (VERDICT r3 #4).

The flagship upsampler (b32@352, proj 512, n=5) runs 4 staged blocks of
[bilinear resize -> conv k3 replicate-pad -> per-sample LN -> relu] with
channels 512->410->308->206->104 and spatial 22->39->68->119->208, then a
final resize-to-352 + conv 104->1. The late stages are the same small-
channel/large-spatial class where the CRIS backbone measured -16..-44%
going channels-last (scripts/micro_conv_nhwc.py). This times each FULL
block (resize+pad+conv+LN+relu) in both layouts at the exact flagship
shapes, per repo measurement rules (in-jit scan chains, interleaved order,
median of windows).

Usage: nohup python scripts/micro_upsampler_nhwc.py > /tmp/micro_ups.log 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B = 32
ITERS = 20
WINDOWS = 5


def timed(fn, x0, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def scanned(x0):
        def body(c, _):
            y = fn(c)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return c + s.astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(scanned)
    float(j(x0))
    ts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        float(j(x0))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(ts))


def main():
    import jax.numpy as jnp
    from jax import lax

    from tunevlseg_tpu.ops.image import _resize_matrix

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # (in_ch, out_ch, in_size, out_size) for the 4 staged blocks + final
    stages = [(512, 410, 22, 39), (410, 308, 39, 68), (308, 206, 68, 119),
              (206, 104, 119, 208), (104, 1, 208, 352)]

    def block(x, wr, wc, w, g, b, layout):
        # bilinear resize (two matmuls) in the native layout
        if layout == "nchw":
            x = jnp.einsum("oh,bchw->bcow", wr, x,
                           preferred_element_type=jnp.float32)
            x = jnp.einsum("ow,bchw->bcho", wc, x,
                           preferred_element_type=jnp.float32).astype(dt)
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
            dn = ("NCHW", "OIHW", "NCHW")
            kern = w
        else:
            x = jnp.einsum("oh,bhwc->bowc", wr, x,
                           preferred_element_type=jnp.float32)
            x = jnp.einsum("ow,bhwc->bhoc", wc, x,
                           preferred_element_type=jnp.float32).astype(dt)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            dn = ("NHWC", "HWIO", "NHWC")
            kern = jnp.transpose(w, (2, 3, 1, 0))
        x = lax.conv_general_dilated(x, kern, (1, 1), "VALID",
                                     dimension_numbers=dn)
        if g is not None:  # per-sample LN over all non-batch axes + relu
            ax = tuple(range(1, 4))
            x32 = x.astype(jnp.float32)
            m = jnp.mean(x32, ax, keepdims=True)
            v = jnp.var(x32, ax, keepdims=True)
            x = ((x32 - m) * lax.rsqrt(v + 1e-5)).astype(dt) * g + b
            x = jnp.maximum(x, 0)
        return x

    jobs = []
    for ci, co, si, so in stages:
        wr = jnp.asarray(_resize_matrix(si, so, "bilinear"), jnp.float32)
        wc = wr
        w = jnp.asarray(rng.normal(0, 0.02, (co, ci, 3, 3)), dt)
        is_final = co == 1
        g = None if is_final else dt(1.0)
        b = None if is_final else dt(0.0)
        xo_nchw = jnp.asarray(rng.normal(size=(B, ci, si, si)), dt)
        name = f"{ci}->{co}@{si}->{so}"
        jobs.append((name, "nchw",
                     lambda x, w=w, wr=wr, wc=wc, g=g, b=b:
                     block(x, wr, wc, w, g, b, "nchw"), xo_nchw))
        jobs.append((name, "nhwc",
                     lambda x, w=w, wr=wr, wc=wc, g=g, b=b:
                     block(x, wr, wc, w, g, b, "nhwc"),
                     xo_nchw.transpose(0, 2, 3, 1)))

    for name, layout, fn, x0 in jobs:
        ms = timed(fn, x0)
        print(f"{name:22s} {layout:5s} {ms:8.3f} ms", flush=True)
    # re-run the first pair to expose drift
    for name, layout, fn, x0 in jobs[:2]:
        ms = timed(fn, x0)
        print(f"{name:22s} {layout:5s} {ms:8.3f} ms  (recheck)", flush=True)


if __name__ == "__main__":
    main()
