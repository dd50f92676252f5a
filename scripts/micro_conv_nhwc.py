"""r4: can NHWC einsum formulations crack the early-stage conv floor?

r3 found (docs/ROOFLINE.md): 1x1-as-einsum is -37% in NHWC, 3x3 shift-
einsums 2.3x WORSE **in NCHW** — but the NHWC variant of the shift trick
was never tried, and each of its 9 taps is exactly the GEMM shape that won
the 1x1 case ((B*H*W, C) @ (C, D) with C contiguous-minor). This times, at
the exact CRIS b64@416 early shapes:

  * 3x3 stride-1 conv: NCHW conv | NHWC conv | NHWC 9-shift-einsum
  * stem conv1 (3->32 k3 s2 @416): NCHW | NHWC | space-to-depth 2x2 +
    4-tap shift-einsum over 12 channels (9 taps regrouped into 2x2 blocks)
  * 1x1: NCHW conv | NHWC einsum (r3's -37% reproduction)

Measurement per repo rules: in-jit lax.scan chains, interleaved A/B order,
one end-of-loop scalar read as the sync barrier, median of windows.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B = 64
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
    float(j(x0))  # compile + warm
    ts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        float(j(x0))
        ts.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(ts))


def main():
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def conv(x, w, stride, layout, pad="SAME"):
        dn = (("NCHW", "OIHW", "NCHW") if layout == "nchw"
              else ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, w.shape, dn)).astype(x.dtype)

    def shift9(x, w):  # x NHWC, w HWIO (3,3,C,D), stride 1 SAME
        b, h, ww, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                xs = lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, ww, c))
                t = jnp.einsum("bhwc,cd->bhwd", xs, w[dy, dx],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        return out.astype(x.dtype)

    def bench_case(name, cin, cout, k, stride, hw, variants):
        x_nchw = jnp.asarray(rng.normal(size=(B, cin, hw, hw)), jnp.bfloat16)
        x_nhwc = jnp.asarray(np.moveaxis(np.asarray(x_nchw, np.float32),
                                         1, -1), jnp.bfloat16)
        w_oihw = jnp.asarray(rng.normal(size=(cout, cin, k, k)) * 0.05,
                             jnp.bfloat16)
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))
        flops = 2 * B * (hw // stride) ** 2 * cin * cout * k * k
        res = {}
        for v in variants:
            if v == "nchw":
                fn, x0 = (lambda c: conv(c, w_oihw, stride, "nchw")), x_nchw
            elif v == "nhwc":
                fn, x0 = (lambda c: conv(c, w_hwio, stride, "nhwc")), x_nhwc
            elif v == "nhwc_einsum1x1":
                wm = w_hwio[0, 0]
                fn, x0 = (lambda c: jnp.einsum(
                    "bhwc,cd->bhwd", c, wm,
                    preferred_element_type=jnp.float32
                ).astype(c.dtype)), x_nhwc
            elif v == "nhwc_shift9":
                fn, x0 = (lambda c: shift9(c, w_hwio)), x_nhwc
            else:
                raise ValueError(v)
            # keep chain shape-stable: project back to cin if cout differs
            if cout != cin or stride != 1:
                back = jnp.asarray(
                    rng.normal(size=(cout, cin)) * 0.05, jnp.bfloat16)
                inner = fn

                def fn(c, inner=inner, back=back, stride=stride):
                    y = inner(c)
                    ch_last = y.shape[-1] == cout
                    y = jnp.einsum("...c,cd->...d" if ch_last
                                   else "bchw,cd->bdhw",
                                   y, back if ch_last else back,
                                   preferred_element_type=jnp.float32
                                   ).astype(y.dtype)
                    if stride != 1:
                        y = (jnp.repeat(jnp.repeat(
                            y, stride, axis=1 if ch_last else 2),
                            stride, axis=2 if ch_last else 3))
                    return y
            ms = timed(fn, x0)
            res[v] = ms
            print(f"{name:16s} {v:16s} {ms:7.3f} ms  "
                  f"(conv-only ideal {flops / 197e12 * 1e3:5.2f} ms)",
                  flush=True)
        return res

    # layer1 3x3 (the biggest single deficit: 2.6-2.8 ms vs 0.7 ideal each)
    bench_case("layer1-3x3", 64, 64, 3, 1, 104,
               ("nchw", "nhwc", "nhwc_shift9", "nchw", "nhwc_shift9"))
    # layer2 first-block 3x3 at 104^2 (128 ch)
    bench_case("layer2-3x3", 128, 128, 3, 1, 104,
               ("nchw", "nhwc_shift9"))
    # stem conv2 (32->32 @208^2)
    bench_case("stem-conv2", 32, 32, 3, 1, 208,
               ("nchw", "nhwc", "nhwc_shift9"))
    # stem conv3 (32->64 @208^2)
    bench_case("stem-conv3", 32, 64, 3, 1, 208,
               ("nchw", "nhwc_shift9"))
    # 1x1 reproduction
    bench_case("layer1-1x1", 64, 64, 1, 1, 104,
               ("nchw", "nhwc", "nhwc_einsum1x1"))
    bench_case("layer1-expand", 64, 256, 1, 1, 104,
               ("nchw", "nhwc_einsum1x1"))
    bench_case("layer1-reduce", 256, 64, 1, 1, 104,
               ("nchw", "nhwc_einsum1x1"))

    # stem conv1: 3->32 k3 s2 @416 — space-to-depth variant
    import jax
    x416 = jnp.asarray(rng.normal(size=(B, 416, 416, 3)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 32)) * 0.1, jnp.bfloat16)

    def conv1_nhwc(c):
        return conv(c, w1, 2, "nhwc")

    def conv1_s2d(c):
        # pad SAME for k3 s2 on even H: pad (0,1) each side -> use (1,1) and
        # window offsets; implement as explicit pad + 2x2-block gather of
        # the 9 taps regrouped per parity
        b = c.shape[0]
        xp = jnp.pad(c, ((0, 0), (1, 1), (1, 1), (0, 0)))  # 418^2
        # output pixel (i,j) reads rows 2i..2i+2, cols 2j..2j+2 of xp
        taps = []
        for dy in range(3):
            for dx in range(3):
                taps.append(lax.slice(
                    xp, (0, dy, dx, 0),
                    (b, dy + 415, dx + 415, 3), (1, 2, 2, 1)))
        stack = jnp.concatenate(taps, axis=-1)       # (B,208,208,27)
        wm = jnp.transpose(w1, (0, 1, 2, 3)).reshape(9 * 3, 32)
        return jnp.einsum("bhwc,cd->bhwd", stack, wm,
                          preferred_element_type=jnp.float32
                          ).astype(c.dtype)

    back32 = jnp.asarray(rng.normal(size=(32, 3)) * 0.1, jnp.bfloat16)

    def wrap(fn):
        def g(c):
            y = fn(c)
            y = jnp.einsum("bhwc,cd->bhwd", y, back32,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            return jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        return g

    for nm, fn in (("conv1-nhwc", conv1_nhwc), ("conv1-s2d", conv1_s2d),
                   ("conv1-nhwc", conv1_nhwc)):
        ms = timed(wrap(fn), x416)
        print(f"{'stem-conv1':16s} {nm:16s} {ms:7.3f} ms  "
              f"(conv-only ideal "
              f"{2 * B * 208 * 208 * 3 * 32 * 9 / 197e12 * 1e3:5.2f} ms)",
              flush=True)

    # numeric check: shift9 == conv (NHWC) on small input
    xs = jnp.asarray(rng.normal(size=(2, 64, 16, 16)), jnp.float32)
    xh = jnp.moveaxis(xs, 1, -1)
    wh = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32)
    a = conv(xh, wh, 1, "nhwc")
    bb = shift9(xh, wh)
    print("shift9 max err:", float(jnp.abs(a - bb).max()), flush=True)


if __name__ == "__main__":
    main()
