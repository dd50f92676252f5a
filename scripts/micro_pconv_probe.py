"""r4: diagnose WHY the flat-space Pallas conv runs ~3-16x behind its
MXU-waste-adjusted floor (PERF_r04/micro_conv_pallas.json).

The k=1 `layer1-expand` case is the discriminator: the kernel body is ONE
(mb, 64) @ (64, 256) dot per grid step — no halo streams, no im2col
copies, no window concatenate — yet measures ~10.7us/step vs ~0.7us of
half-depth MXU time. The cost is therefore per-grid-step structural.
Hypotheses probed here, one knob each:

  * sem=par      dimension_semantics ("parallel", "arbitrary") — both grid
                 dims are dependency-free; "arbitrary" may pessimize the
                 Mosaic pipeline.
  * mb x2 / x4   doubled band height => half/quarter the grid steps. If
                 ms stays ~flat, the cost is per-step overhead; if it
                 scales with total rows, it's compute/BW.
  * nomask       skip the validity-mask epilogue (iota/compare/where) —
                 measures whether the per-band VPU epilogue dominates.
                 (Wrong numerics at the ring rows; timing probe only.)

Usage: python scripts/micro_pconv_probe.py [case ...]
Writes PERF_r04/micro_pconv_probe.json.
"""
import json
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

    import tunevlseg_tpu.ops.conv_pallas as cp

    rng = np.random.default_rng(0)
    results = {}
    only = set(sys.argv[1:])

    def bench_case(name, cin, cout, k, hw, mode="im2col"):
        if only and name not in only:
            return
        x = jnp.asarray(rng.normal(size=(B, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cout, cin, k, k)) * 0.05,
                        jnp.bfloat16)
        base = cp.make_flat_spec(hw, hw, max(k // 2, 1),
                                 max_k2c=k * k * cin, itemsize=2)
        flops = 2 * B * hw * hw * cin * cout * k * k
        ideal = flops / 197e12 * 1e3

        def run(tag, spec, sem, mask=True):
            x_flat = cp.flat_begin(x, spec)

            def f(c):
                cp._FORCE_MODE = mode if k > 1 else None
                cp._DIM_SEMANTICS = sem
                cp._SKIP_MASK = not mask
                try:
                    return cp.conv_flat(c, spec, w)
                finally:
                    cp._FORCE_MODE = None
                    cp._DIM_SEMANTICS = ("arbitrary", "arbitrary")
                    cp._SKIP_MASK = False
            try:
                ms = timed(f, x_flat)
            except Exception as e:  # compile-time VMEM OOM etc.
                print(f"{name:14s} {tag:12s} FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                return
            steps = B * (spec.nb_pix + 2)
            print(f"{name:14s} {tag:12s} {ms:7.3f} ms  ideal {ideal:5.2f}"
                  f"  mfu {ideal / ms * 100:4.1f}%  mb={spec.mb}"
                  f" us/step={ms * 1e3 / steps:5.2f}", flush=True)
            results.setdefault(name, {"ideal_ms": ideal})[tag] = ms

        arb = ("arbitrary", "arbitrary")
        par = ("parallel", "arbitrary")
        run("base", base, arb)
        run("par", base, par)
        run("nomask", base, arb, mask=False)
        for scale, tag in ((2, "mbx2"), (4, "mbx4")):
            try:
                spec = cp.make_flat_spec(hw, hw, base.r, mb=base.mb * scale)
            except ValueError:
                continue
            if cp._kernel_vmem_bytes(spec, cin, k * k * cin, cout, 2,
                                     False) > cp._VMEM_BUDGET:
                print(f"{name:14s} {tag:12s} skipped (VMEM)", flush=True)
                continue
            run(tag, spec, arb)
            run(tag + "+par", spec, par)

    bench_case("l1-expand-1x1", 64, 256, 1, 104)
    bench_case("stem-conv3", 32, 64, 3, 208)
    bench_case("layer1-3x3", 64, 64, 3, 104)

    with open("/root/repo/PERF_r04/micro_pconv_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PERF_r04/micro_pconv_probe.json", flush=True)


if __name__ == "__main__":
    main()
