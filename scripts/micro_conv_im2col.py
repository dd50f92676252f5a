"""im2col + single deep-K GEMM vs the XLA conv emitter at the RN50
early-stage shapes (13-16% MFU, docs/ROOFLINE.md r3 — shift-einsums and
layout changes already measured and rejected; explicit im2col was NOT).

Formulation: patches = conv_general_dilated_patches(x) materializes the
(B, 9C, H, W) im2col tensor once (HBM write+read ~0.8 GB at layer1), then
ONE (B*HW, 9C) @ (9C, O) GEMM with K=576 — a deep MXU-friendly
contraction instead of the emitter's small-channel schedule.

Hardened timing (vary() + ITERS=25 + noop row).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

B, ITERS, WINDOWS = 64, 25, 5


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

    rng = np.random.default_rng(0)
    rows = {}

    def noop(c, x):
        return c + jnp.sum(vary(x, c)[0, :2].astype(jnp.float32))

    rows["noop_ms"] = timed_scan(noop, jnp.zeros(()),
                                 jnp.zeros((4, 4), jnp.bfloat16),
                                 tag="noop")

    # (name, Cin, Cout, H, k): RN50@416 early shapes (ROOFLINE r3 table)
    shapes = [
        ("stem2_64to64_208", 64, 64, 208, 3),     # stem 3x3 @208^2
        ("l1_64to64_104", 64, 64, 104, 3),        # layer1 bottleneck 3x3
        ("l2_128to128_52", 128, 128, 52, 3),      # layer2 3x3
    ]
    for name, ci, co, h, k in shapes:
        x = jnp.asarray(rng.normal(size=(B, ci, h, h)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(co, ci, k, k)) * 0.05, jnp.bfloat16)

        def conv_ref(c, x, w):
            y = jax.lax.conv_general_dilated(
                vary(x, c), w, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return c + jnp.sum(y.astype(jnp.float32))

        rows[f"{name}_emitter_ms"] = timed_scan(
            conv_ref, jnp.zeros(()), x, w, tag=f"{name} conv emitter")

        def conv_im2col(c, x, w):
            xv = vary(x, c)
            # (B, Cin*k*k, H, W) patches, then one big GEMM over K=Cin*k*k
            pat = jax.lax.conv_general_dilated_patches(
                xv, (k, k), (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            wf = w.reshape(co, ci * k * k)
            y = jnp.einsum("bphw,op->bohw", pat, wf,
                           preferred_element_type=jnp.float32)
            return c + jnp.sum(y)

        rows[f"{name}_im2col_ms"] = timed_scan(
            conv_im2col, jnp.zeros(()), x, w, tag=f"{name} im2col+GEMM")

        # correctness
        y_ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        pat = jax.lax.conv_general_dilated_patches(
            x, (k, k), (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y_alt = jnp.einsum("bphw,op->bohw", pat,
                           w.reshape(co, ci * k * k),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        err = float(jnp.max(jnp.abs(
            (y_alt - y_ref).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))
        print(f"# {name} max|err| {err:.2e} (scale {scale:.1f})",
              flush=True)

    print(json.dumps({"metric": f"micro_conv_im2col_b{B}", **rows}),
          flush=True)


if __name__ == "__main__":
    main()
