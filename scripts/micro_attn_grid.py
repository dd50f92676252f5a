"""Grid-shape sweep for the batched-heads flash kernel at the CLIPSeg
vision shape (b64 s485 h12 d64 bf16): the current kernel (hg heads per
cell, grid b×h/hg = 256 cells) measures ~2.5-2.9 ms vs a ~0.5 ms
compute+DMA roofline, suggesting per-cell overhead dominates.  Sweep
(batch-group, head-group, dimension_semantics) in-jit (lax.scan)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

LOOPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl

    from tunevlseg_tpu.nn.attention import xla_attention
    from tunevlseg_tpu.ops import flash_attention as fam

    B, S, H, D = 64, 485, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)) * 0.05, jnp.bfloat16)

    def make(bg, hg, semantics):
        def fwd(q, k, v):
            b, s, h, d = q.shape
            t = k.shape[1]
            scale = d ** -0.5
            s_pad = fam._ceil_to(s, 128)
            t_pad = fam._ceil_to(t, 128)
            prep = lambda x, to: jnp.pad(
                x, ((0, 0), (0, to - x.shape[1]), (0, 0), (0, 0))
            ).transpose(0, 2, 1, 3)
            qf, kf, vf = prep(q, s_pad), prep(k, t_pad), prep(v, t_pad)

            def kernel(q_ref, k_ref, v_ref, o_ref):
                for bi in range(bg):
                    for head in range(hg):
                        qh = q_ref[bi, head]
                        kh = k_ref[bi, head]
                        vh = v_ref[bi, head]
                        scores = jax.lax.dot_general(
                            qh, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
                        col = jax.lax.broadcasted_iota(
                            jnp.int32, scores.shape, 1)
                        scores = jnp.where(col < t, scores, -jnp.inf)
                        m = jnp.max(scores, axis=-1, keepdims=True)
                        p = jnp.exp(scores - m)
                        denom = jnp.sum(p, axis=-1, keepdims=True)
                        out = jax.lax.dot_general(
                            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / denom
                        o_ref[bi, head] = out.astype(o_ref.dtype)

            kw = {}
            if semantics:
                from jax.experimental.pallas import tpu as pltpu
                try:
                    kw["compiler_params"] = pltpu.CompilerParams(
                        dimension_semantics=semantics)
                except Exception:
                    kw["compiler_params"] = dict(mosaic=dict(
                        dimension_semantics=semantics))
            out = pl.pallas_call(
                kernel,
                grid=(b // bg, h // hg),
                in_specs=[pl.BlockSpec((bg, hg, s_pad, d),
                                       lambda i, j: (i, j, 0, 0)),
                          pl.BlockSpec((bg, hg, t_pad, d),
                                       lambda i, j: (i, j, 0, 0)),
                          pl.BlockSpec((bg, hg, t_pad, d),
                                       lambda i, j: (i, j, 0, 0))],
                out_specs=pl.BlockSpec((bg, hg, s_pad, d),
                                       lambda i, j: (i, j, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
                **kw,
            )(qf, kf, vf)
            return out.transpose(0, 2, 1, 3)[:, :s]
        return fwd

    def scanned(attn):
        def body(c, _):
            o = attn(c, c, c)
            return o.astype(jnp.bfloat16), ()

        def run(x):
            y, _ = lax.scan(body, x, None, length=LOOPS)
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(run)

    def timed(fn, x, iters=5, warmup=1):
        for _ in range(warmup):
            float(fn(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            float(fn(x))
        return (time.perf_counter() - t0) / iters / LOOPS * 1000

    t = timed(scanned(lambda a, b, c: xla_attention(a, b, c)), q)
    print(f"xla: {t:.2f} ms/call", flush=True)
    t = timed(scanned(fam._forward_batched_heads), q)
    print(f"current kernel: {t:.2f} ms/call", flush=True)

    ref = np.asarray(xla_attention(q, q, q), np.float32)
    for bg, hg, sem in ((1, 3, ("parallel", "parallel")),
                        (2, 3, None),
                        (2, 3, ("parallel", "parallel")),
                        (4, 2, None),
                        (4, 3, ("parallel", "parallel")),
                        (8, 1, ("parallel", "parallel")),
                        (2, 6, ("parallel", "parallel"))):
        try:
            fn = make(bg, hg, sem)
            t = timed(scanned(fn), q)
            diff = np.abs(np.asarray(fn(q, q, q), np.float32) - ref).max()
            print(f"bg={bg} hg={hg} sem={bool(sem)}: {t:.2f} ms/call "
                  f"(maxdiff {diff:.1e})", flush=True)
        except Exception as e:
            print(f"bg={bg} hg={hg} sem={bool(sem)} failed: "
                  f"{type(e).__name__} {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
