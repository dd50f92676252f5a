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

    # correctness cross-check at these shapes
    o1 = np.asarray(xla_attention(q, q, q), np.float32)
    o2 = np.asarray(fa._forward_batched_heads(q, q, q), np.float32)
    print(f"max diff: {np.abs(o1 - o2).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
