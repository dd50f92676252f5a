"""Per-op decomposition of the trans_seg Upsampler (62 ms of the 238 ms
b32@352 step — profile_trans_seg2). Times every resize / conv / norm / act
in isolation at the production shapes (bf16, NCHW) plus variant
formulations, to locate the slack that the whole-pyramid NHWC A/B (1.003x,
docs/ROOFLINE.md) could not see.

Stages (n=5, proj 512, up_factor 16^(1/5)):
  22² ->39² conv512->410 | 39->68 conv410->308 | 68->119 conv308->206 |
  119->208 conv206->104 | resize 208->352 + conv104->1

Timing: in-jit lax.scan with the vary() LICM guard (profile_trans_seg2).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, ITERS, WINDOWS = 32, 10, 5


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

    from tunevlseg_tpu.nn.conv import conv2d
    from tunevlseg_tpu.ops.image import resize_2d

    rng = np.random.default_rng(0)
    rows = {}

    stages = [  # (size_in, size_out, cin, cout)
        (22, 39, 512, 410),
        (39, 68, 410, 308),
        (68, 119, 308, 206),
        (119, 208, 206, 104),
    ]

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

    for si, so, ci, co in stages:
        x_in = mk((B, ci, si, si))
        x_up = mk((B, ci, so, so))
        w = mk((co, ci, 3, 3))
        bias = mk((co,))

        def res_body(c, x):
            y = resize_2d(vary(x, c), (so, so), "bilinear")
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"resize_{si}to{so}_c{ci}_ms"] = timed_scan(
            res_body, jnp.zeros(()), x_in, tag=f"resize {si}->{so} c{ci}")

        def conv_body(c, x, w, bias):
            y = conv2d(vary(x, c), w, bias, (1, 1), "same",
                       pad_mode="replicate")
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"conv_{so}_{ci}to{co}_ms"] = timed_scan(
            conv_body, jnp.zeros(()), x_up, w, bias,
            tag=f"conv3x3 @{so} {ci}->{co}")

        x_out = mk((B, co, so, so))

        def ln_body(c, x):
            x = vary(x, c)
            m = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3),
                         keepdims=True)
            v = jnp.var(x.astype(jnp.float32), axis=(1, 2, 3),
                        keepdims=True)
            y = (x - m) * jax.lax.rsqrt(v + 1e-5)
            return c + jnp.sum(y)

        rows[f"layernorm_{so}_c{co}_ms"] = timed_scan(
            ln_body, jnp.zeros(()), x_out, tag=f"samplenorm @{so} c{co}")

    # final stage: resize 208->352 c104 + conv 104->1
    xf = mk((B, 104, 208, 208))
    xf2 = mk((B, 104, 352, 352))
    wf = mk((1, 104, 3, 3))
    bf = mk((1,))

    def resf(c, x):
        y = resize_2d(vary(x, c), (352, 352), "bilinear")
        return c + jnp.sum(y.astype(jnp.float32))

    rows["resize_208to352_c104_ms"] = timed_scan(
        resf, jnp.zeros(()), xf, tag="resize 208->352 c104")

    def convf(c, x, w, b):
        y = conv2d(vary(x, c), w, b, (1, 1), "same", pad_mode="replicate")
        return c + jnp.sum(y.astype(jnp.float32))

    rows["conv_352_104to1_ms"] = timed_scan(
        convf, jnp.zeros(()), xf2, wf, bf, tag="conv3x3 @352 104->1")

    total = sum(v for v in rows.values())
    print(f"# per-op sum: {total:.1f} ms (whole upsampler measured ~62)",
          flush=True)
    print(json.dumps({"metric": f"micro_upsampler_stages_b{B}", **rows,
                      "sum_ms": total}), flush=True)


if __name__ == "__main__":
    main()
