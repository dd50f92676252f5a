"""r4: is int8 on the MXU a real serving lever at our GEMM shapes?

v5e peak: 197 bf16 TFLOP/s vs 394 int8 TOP/s — 2x compute, and int8
weights are half the HBM bytes, which is what batch-1 latency actually
pays for. This times the flagship serving GEMMs (ViT-B/16: 485 vision
tokens per image, d=768, MLP 768->3072->768) in three formulations:

  * bf16       — the production path today
  * w8         — weight-only int8: kernel stored int8 + per-col scale,
                 dequantized to bf16 at use (wins ONLY if XLA fuses the
                 convert into the dot's weight tiles; if it materializes
                 the bf16 buffer it LOSES: int8-read + bf16-write + read)
  * dyn8       — dynamic full int8: per-row activation absmax quant,
                 int8 x int8 -> int32 MXU dot, rescale epilogue

Measurement per repo rules: in-jit lax.scan chains (output folded back
into the carry), interleaved variant order, one scalar read as barrier,
median of windows. Error check vs f32 at the end.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

ITERS = 30
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
    D, H = 768, 3072

    def quant_cols(w):  # (K,N) f32 -> int8 kernel + (1,N) f32 scale
        s = np.abs(w).max(axis=0, keepdims=True) / 127.0
        wi = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return wi, s.astype(np.float32)

    w1 = rng.normal(size=(D, H)).astype(np.float32) * 0.03
    w2 = rng.normal(size=(H, D)).astype(np.float32) * 0.03
    wq = rng.normal(size=(D, D)).astype(np.float32) * 0.03
    w1i, s1 = quant_cols(w1)
    w2i, s2 = quant_cols(w2)
    wqi, sq = quant_cols(wq)

    w1b, w2b, wqb = (jnp.asarray(w, jnp.bfloat16) for w in (w1, w2, wq))
    w1i, w2i, wqi = (jnp.asarray(w) for w in (w1i, w2i, wqi))
    s1, s2, sq = (jnp.asarray(s) for s in (s1, s2, sq))

    def q_rows(x):  # bf16 (M,K) -> int8 + per-row scale
        a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(a, 1e-8) / 127.0
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        return xi, s

    def i8dot(xi, wi):
        return lax.dot_general(xi, wi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    import jax  # noqa: E402  (for nn.relu)

    def mlp_bf16(x):
        h = jax.nn.relu(jnp.dot(x, w1b,
                                preferred_element_type=jnp.float32))
        return jnp.dot(h.astype(jnp.bfloat16), w2b,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def mlp_w8(x):
        w1d = (w1i.astype(jnp.bfloat16)
               * s1.astype(jnp.bfloat16))
        h = jax.nn.relu(jnp.dot(x, w1d,
                                preferred_element_type=jnp.float32))
        w2d = (w2i.astype(jnp.bfloat16)
               * s2.astype(jnp.bfloat16))
        return jnp.dot(h.astype(jnp.bfloat16), w2d,
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def mlp_dyn8(x):
        xi, sx = q_rows(x)
        h = jax.nn.relu(i8dot(xi, w1i).astype(jnp.float32) * sx * s1)
        hi, sh = q_rows(h.astype(jnp.bfloat16))
        y = i8dot(hi, w2i).astype(jnp.float32) * sh * s2
        return y.astype(jnp.bfloat16)

    def sq_bf16(x):
        return jnp.dot(x, wqb, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def sq_w8(x):
        wd = wqi.astype(jnp.bfloat16) * sq.astype(jnp.bfloat16)
        return jnp.dot(x, wd, preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def sq_dyn8(x):
        xi, sx = q_rows(x)
        return (i8dot(xi, wqi).astype(jnp.float32) * sx * sq
                ).astype(jnp.bfloat16)

    for batch in (1, 8, 32):
        M = 485 * batch
        x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
        mlp_flops = 2 * M * D * H * 2
        sq_flops = 2 * M * D * D
        order = [("mlp", "bf16", mlp_bf16, mlp_flops),
                 ("mlp", "dyn8", mlp_dyn8, mlp_flops),
                 ("mlp", "w8", mlp_w8, mlp_flops),
                 ("mlp", "bf16", mlp_bf16, mlp_flops),
                 ("mlp", "dyn8", mlp_dyn8, mlp_flops),
                 ("sq", "bf16", sq_bf16, sq_flops),
                 ("sq", "dyn8", sq_dyn8, sq_flops),
                 ("sq", "w8", sq_w8, sq_flops),
                 ("sq", "bf16", sq_bf16, sq_flops),
                 ("sq", "dyn8", sq_dyn8, sq_flops)]
        for kind, name, fn, flops in order:
            ms = timed(fn, x)
            print(f"b{batch:<3d} M={M:<6d} {kind:4s} {name:5s} "
                  f"{ms:7.4f} ms  {flops / (ms * 1e-3) / 1e12:6.1f} "
                  "TFLOP/s-equiv", flush=True)

    # numeric error vs f32 reference (batch-8 shapes)
    x = jnp.asarray(rng.normal(size=(485 * 8, D)), jnp.float32)
    ref = np.maximum(np.asarray(x, np.float32) @ w1, 0.0) @ w2
    scale = np.abs(ref).max()
    for name, fn in (("bf16", mlp_bf16), ("w8", mlp_w8),
                     ("dyn8", mlp_dyn8)):
        y = np.asarray(fn(x.astype(jnp.bfloat16)), np.float32)
        err = np.abs(y - ref).max() / scale
        print(f"mlp {name:5s} max rel err vs f32: {err:.5f}", flush=True)


if __name__ == "__main__":
    main()
