"""Early-stage RN50 conv layout A/B (stem + layer1 shapes) — the r2 layout
study (micro_conv_layout.py) sampled MID-network shapes and found NCHW==NHWC;
micro_rn50.py r3 shows the stem/layer1 at 13-16% MFU. Is it layout?

Times raw lax.conv_general_dilated chains at the exact early shapes in
NCHW vs NHWC (weights OIHW vs HWIO), bf16, in-jit chained scan.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed_chain(fn, x0, iters=20):
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
    t0 = time.perf_counter()
    float(j(x0))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B = 64
    rng = np.random.default_rng(0)

    def conv(x, w, stride, layout):
        if layout == "nchw":
            dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NCHW", "OIHW", "NCHW"))
        else:
            dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, (stride, stride), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(x.dtype)

    # (name, in_shape NCHW, convs [(cin, cout, k, stride), ...])
    cases = [
        ("stem", (B, 3, 416, 416),
         [(3, 32, 3, 2), (32, 32, 3, 1), (32, 64, 3, 1)]),
        ("layer1-1x1", (B, 64, 104, 104), [(64, 64, 1, 1)] * 3),
        ("layer1-3x3", (B, 64, 104, 104), [(64, 64, 3, 1)] * 3),
        ("layer1-expand", (B, 64, 104, 104), [(64, 256, 1, 1)]),
        ("layer2-3x3", (B, 128, 104, 104), [(128, 128, 3, 1)]),
    ]

    for name, shape_nchw, convs in cases:
        for layout in ("nchw", "nhwc"):
            if layout == "nchw":
                x = jnp.asarray(rng.normal(size=shape_nchw), jnp.bfloat16)
                ws = [jnp.asarray(rng.normal(size=(co, ci, k, k)) * 0.05,
                                  jnp.bfloat16) for ci, co, k, _ in convs]
            else:
                b, c, h, w_ = shape_nchw
                x = jnp.asarray(rng.normal(size=(b, h, w_, c)), jnp.bfloat16)
                ws = [jnp.asarray(rng.normal(size=(k, k, ci, co)) * 0.05,
                                  jnp.bfloat16) for ci, co, k, _ in convs]

            def chain(c0, ws=ws, convs=convs, layout=layout):
                y = c0
                for w_arr, (_, _, _, s) in zip(ws, convs):
                    y = conv(y, w_arr, s, layout)
                return y

            # chain output shape != input; wrap with projection back is
            # unfair — instead time the one-shot with scan dependency on x
            ms = timed_chain(chain, x)
            b, c, h, w_ = shape_nchw
            flops = 0
            hh = h
            for ci, co, k, s in convs:
                hh = hh // s
                flops += 2 * B * hh * hh * ci * co * k * k
            print(f"{name:14s} {layout}: {ms:7.2f} ms  "
                  f"(ideal {flops / 197e12 * 1e3:5.2f}, "
                  f"MFU {flops / 197e9 / ms:5.1f}%)")


if __name__ == "__main__":
    main()


def einsum_variants():
    """1x1 conv as dot_general vs the conv emitter; 3x3 as 9 shift-einsums."""
    import jax
    import jax.numpy as jnp

    B = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 64, 104, 104)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(64, 64)) * 0.05, jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(64, 64, 3, 3)) * 0.05, jnp.bfloat16)

    def one_by_one(c):
        y = c
        for _ in range(3):
            y = jnp.einsum("bchw,cd->bdhw", y, w1,
                           preferred_element_type=jnp.float32
                           ).astype(c.dtype)
        return y

    def three_shifts(c):
        h, w_ = c.shape[-2:]
        xp = jnp.pad(c, ((0, 0), (0, 0), (1, 1), (1, 1)))
        out = None
        for dy in range(3):
            for dx in range(3):
                tap = jnp.einsum("bchw,cd->bdhw",
                                 xp[:, :, dy:dy + h, dx:dx + w_],
                                 w3[:, :, dy, dx],
                                 preferred_element_type=jnp.float32)
                out = tap if out is None else out + tap
        return out.astype(c.dtype)

    # NHWC GEMM form: (B*H*W, C) @ (C, D)
    xh = jnp.asarray(rng.normal(size=(B, 104, 104, 64)), jnp.bfloat16)

    def one_by_one_nhwc(c):
        y = c
        for _ in range(3):
            y = jnp.einsum("bhwc,cd->bhwd", y, w1,
                           preferred_element_type=jnp.float32
                           ).astype(c.dtype)
        return y

    for name, fn, arr in [("1x1-einsum-nchw", one_by_one, x),
                          ("1x1-einsum-nhwc", one_by_one_nhwc, xh),
                          ("3x3-shift-einsum", three_shifts, x)]:
        ms = timed_chain(fn, arr)
        print(f"{name:18s} {ms:7.2f} ms")


if __name__ == "__main__":
    einsum_variants()
