"""r4: flat-space Pallas im2col conv vs the XLA conv emitter at the CRIS
conv-floor shapes (docs/ROOFLINE.md: stem/layer1/layer2 run at 13-25% MFU;
every XLA-level reformulation cancels at the graph level).

The kernel (ops/conv_pallas.py) keeps activations row-flattened so each
3x3 tap is a constant sublane shift; the conv is ONE (MB, 9C) @ (9C, Cout)
GEMM with full 128-deep MXU contraction instead of the emitter's K=C
regime. This measures, per shape, in FLAT space (chain-realistic: the
begin/end boundary is paid once per stage, timed separately):

  * XLA NCHW conv (production default today)
  * XLA NHWC conv (r4 A/B'd alternative)
  * pallas im2col          (patch scratch + single GEMM)
  * pallas taps            (k*k accumulated K=C GEMMs, no copies)

Measurement per repo rules: in-jit lax.scan chains, one end-of-loop scalar
read as the barrier, median of interleaved windows.
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
    from jax import lax

    import tunevlseg_tpu.ops.conv_pallas as cp

    rng = np.random.default_rng(0)
    results = {}

    def conv(x, w, layout):
        dn = (("NCHW", "OIHW", "NCHW") if layout == "nchw"
              else ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, w.shape, dn)).astype(x.dtype)

    only = set(sys.argv[1:])  # optional case-name filter for re-runs

    def bench_case(name, cin, cout, k, hw):
        if only and name not in only:
            return
        x_nchw = jnp.asarray(rng.normal(size=(B, cin, hw, hw)), jnp.bfloat16)
        x_nhwc = jnp.asarray(np.moveaxis(np.asarray(x_nchw, np.float32),
                                         1, -1), jnp.bfloat16)
        w_oihw = jnp.asarray(rng.normal(size=(cout, cin, k, k)) * 0.05,
                             jnp.bfloat16)
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))
        # channel-restoring 1x1 (cout -> cin) so the two-conv chain composes
        back = jnp.asarray(rng.normal(size=(cin, cout, 1, 1)) * 0.05,
                           jnp.bfloat16)
        spec = cp.make_flat_spec(hw, hw, max(k // 2, 1),
                                 max_k2c=k * k * cin, itemsize=2)
        x_flat = cp.flat_begin(x_nhwc, spec)
        flops = 2 * B * hw * hw * cin * cout * k * k
        ideal = flops / 197e12 * 1e3
        need_back = cout != cin

        def fn_xla(layout):
            w = w_oihw if layout == "nchw" else w_hwio
            wb = (back if layout == "nchw"
                  else jnp.transpose(back, (2, 3, 1, 0)))

            def f(c):
                y = conv(c, w, layout)
                if need_back:
                    y = conv(y, wb, layout)
                return y
            return f

        def fn_pallas(mode):
            def f(c):
                cp._FORCE_MODE = mode
                try:
                    y = cp.conv_flat(c, spec, w_oihw)
                    if need_back:
                        y = cp.conv_flat(y, spec, back)
                finally:
                    cp._FORCE_MODE = None
                return y
            return f

        variants = [("xla_nchw", fn_xla("nchw"), x_nchw),
                    ("xla_nhwc", fn_xla("nhwc"), x_nhwc),
                    ("pl_im2col", fn_pallas("im2col"), x_flat),
                    ("pl_taps", fn_pallas("taps"), x_flat)]
        if k == 1:
            variants = variants[:3]
        res = {}
        # interleave: measure each variant in alternating order twice
        for v, fn, x0 in variants + variants[::-1]:
            ms = timed(fn, x0)
            res.setdefault(v, []).append(ms)
        out = {}
        for v, samples in res.items():
            ms = float(np.median(samples))
            out[v] = ms
            extra = ""
            if need_back:
                extra = " (+1x1-back in the chain)"
            print(f"{name:16s} {v:10s} {ms:7.3f} ms  ideal {ideal:5.2f}"
                  f"  mfu {ideal / ms * 100:4.1f}%{extra}", flush=True)
        results[name] = {"ideal_ms": ideal, **out}

    bench_case("layer1-3x3", 64, 64, 3, 104)
    bench_case("layer2b0-3x3", 128, 128, 3, 104)
    bench_case("layer2-3x3", 128, 128, 3, 52)
    bench_case("layer3-3x3", 256, 256, 3, 26)
    bench_case("stem-conv2", 32, 32, 3, 208)
    bench_case("stem-conv3", 32, 64, 3, 208)
    bench_case("layer1-expand", 64, 256, 1, 104)
    bench_case("layer1-reduce", 256, 64, 1, 104)

    # boundary cost: flat_begin + flat_end roundtrip at layer1 geometry
    import jax
    x = jnp.asarray(rng.normal(size=(B, 104, 104, 64)), jnp.bfloat16)
    spec = cp.make_flat_spec(104, 104, 1, max_k2c=576)

    def roundtrip(c):
        return cp.flat_end(cp.flat_begin(c, spec), spec)

    ms = timed(roundtrip, x)
    print(f"{'boundary':16s} {'begin+end':10s} {ms:7.3f} ms", flush=True)
    results["boundary-104-c64"] = {"roundtrip_ms": ms}

    # on-chip numeric check vs XLA conv (bf16, f32 accumulation both)
    xs = jnp.asarray(rng.normal(size=(2, 32, 32, 64)), jnp.bfloat16)
    wt = jnp.asarray(rng.normal(size=(64, 64, 3, 3)) * 0.05, jnp.bfloat16)
    spec_s = cp.make_flat_spec(32, 32, 1, mb=256)
    a = cp.flat_end(cp.conv_flat(cp.flat_begin(xs, spec_s), spec_s, wt),
                    spec_s)
    bref = conv(xs, jnp.transpose(wt, (2, 3, 1, 0)), "nhwc")
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - bref.astype(jnp.float32))))
    print("pallas vs xla conv max err (bf16):", err, flush=True)
    results["max_err_bf16"] = err

    with open("/root/repo/PERF_r04/micro_conv_pallas.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PERF_r04/micro_conv_pallas.json", flush=True)


if __name__ == "__main__":
    main()
