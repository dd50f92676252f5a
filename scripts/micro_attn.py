"""In-jit scanned A/B: XLA fused attention vs the Pallas batched-heads
kernel at the CLIPSeg vision shape (b64, s485, h12, d64, bf16).

Each variant runs LOOPS iterations inside ONE executable (lax.scan with a
data dependency) so per-launch dispatch (~30ms on this transport) amortizes
to noise. Prints ms per single attention call.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

LOOPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tunevlseg_tpu.nn.attention import xla_attention
    from tunevlseg_tpu.ops import flash_attention as fa

    B, S, H, D = 64, 485, 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, H, D)) * 0.05, jnp.bfloat16)

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

    t_xla = timed(scanned(lambda a, b, c: xla_attention(a, b, c)), q)
    print(f"xla attention: {t_xla:.2f} ms/call", flush=True)

    t_flash = timed(scanned(
        lambda a, b, c: fa._forward_batched_heads(a, b, c)), q)
    print(f"pallas batched-heads: {t_flash:.2f} ms/call", flush=True)

    # head-group variants: monkeypatch the hg selection cap
    import tunevlseg_tpu.ops.flash_attention as fam
    src_fwd = fam._forward_batched_heads

    def make_hg(hgval):
        def fwd(q, k, v):
            import jax.numpy as jnp
            from jax.experimental import pallas as pl
            b, s, h, d = q.shape
            t = k.shape[1]
            scale = d ** -0.5
            s_pad = fam._ceil_to(s, 128)
            t_pad = fam._ceil_to(t, 128)
            prep = lambda x, to: jnp.pad(
                x, ((0, 0), (0, to - x.shape[1]), (0, 0), (0, 0))
            ).transpose(0, 2, 1, 3)
            qf, kf, vf = prep(q, s_pad), prep(k, t_pad), prep(v, t_pad)
            hg = hgval

            def kernel(q_ref, k_ref, v_ref, o_ref):
                for head in range(hg):
                    qh = q_ref[0, head]
                    kh = k_ref[0, head]
                    vh = v_ref[0, head]
                    scores = jax.lax.dot_general(
                        qh, kh, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale
                    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                    scores = jnp.where(col < t, scores, -jnp.inf)
                    m = jnp.max(scores, axis=-1, keepdims=True)
                    p = jnp.exp(scores - m)
                    denom = jnp.sum(p, axis=-1, keepdims=True)
                    out = jax.lax.dot_general(
                        p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) / denom
                    o_ref[0, head] = out.astype(o_ref.dtype)

            out = pl.pallas_call(
                kernel,
                grid=(b, h // hg),
                in_specs=[pl.BlockSpec((1, hg, s_pad, d), lambda i, j: (i, j, 0, 0)),
                          pl.BlockSpec((1, hg, t_pad, d), lambda i, j: (i, j, 0, 0)),
                          pl.BlockSpec((1, hg, t_pad, d), lambda i, j: (i, j, 0, 0))],
                out_specs=pl.BlockSpec((1, hg, s_pad, d), lambda i, j: (i, j, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            )(qf, kf, vf)
            return out.transpose(0, 2, 1, 3)[:, :s]
        return fwd

    for hgval in (2, 4, 6):
        try:
            t = timed(scanned(make_hg(hgval)), q)
            print(f"pallas hg={hgval}: {t:.2f} ms/call", flush=True)
        except Exception as e:
            print(f"hg={hgval} failed: {type(e).__name__} {str(e)[:150]}",
                  flush=True)

    # correctness cross-check at these shapes
    o1 = np.asarray(xla_attention(q, q, q), np.float32)
    o2 = np.asarray(fa._forward_batched_heads(q, q, q), np.float32)
    print(f"max diff: {np.abs(o1 - o2).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
