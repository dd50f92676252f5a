"""Micro-benchmark: one CLIP ViT-B/16 encoder layer at the bench shape
(b64, seq 485, width 768, heads 12, bf16) — where does the 2x-off-roofline
slack in the vision tower live?

Variants:
  layer      — the real PreNormEncoderLayer
  gemms      — just the 6 GEMMs (qkv, out, fc1, fc2) with no attention/LN
  attn       — just softmax(QK^T)V at these shapes
  qkv_fused  — layer math with q/k/v as ONE (768 -> 2304) GEMM
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from tunevlseg_tpu.nn.attention import xla_attention
    from tunevlseg_tpu.nn.layers import PreNormEncoderLayer

    B, S, D, H, F = 64, 485, 768, 12, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.02, jnp.bfloat16)

    layer = PreNormEncoderLayer(H, F, "quick_gelu", dtype=jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0), x)

    noop = jax.jit(lambda v: v + 1.0)
    overhead = timed(noop, (jnp.zeros(()),))
    print(f"dispatch+sync overhead: {overhead:.1f} ms", flush=True)

    full = jax.jit(lambda p, x: jnp.sum(
        layer.apply(p, x).astype(jnp.float32)))
    t = timed(full, (params, x))
    print(f"full layer: {t:.1f} ms ({t - overhead:.1f} net)", flush=True)

    w1 = jnp.asarray(rng.normal(size=(D, D)) * 0.02, jnp.bfloat16)
    wf1 = jnp.asarray(rng.normal(size=(D, F)) * 0.02, jnp.bfloat16)
    wf2 = jnp.asarray(rng.normal(size=(F, D)) * 0.02, jnp.bfloat16)

    def gemms(x, w1, wf1, wf2):
        q = x @ w1
        k = x @ w1
        v = x @ w1
        o = v @ w1
        h = o @ wf1
        y = h @ wf2
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(
            q.astype(jnp.float32)) + jnp.sum(k.astype(jnp.float32))

    t = timed(jax.jit(gemms), (x, w1, wf1, wf2))
    print(f"6 gemms only: {t:.1f} ms ({t - overhead:.1f} net)", flush=True)

    qh = jnp.asarray(rng.normal(size=(B, S, H, D // H)), jnp.bfloat16)
    attn = jax.jit(lambda q: jnp.sum(
        xla_attention(q, q, q).astype(jnp.float32)))
    t = timed(attn, (qh,))
    print(f"attention only: {t:.1f} ms ({t - overhead:.1f} net)", flush=True)

    w3 = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.02, jnp.bfloat16)

    def qkv_fused(x, w3, w1, wf1, wf2):
        qkv = x @ w3
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sp = lambda t: t.reshape(B, S, H, D // H)
        o = xla_attention(sp(q), sp(k), sp(v)).reshape(B, S, D) @ w1
        h = o @ wf1
        y = (h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(
            h.dtype)) @ wf2
        return jnp.sum(y.astype(jnp.float32))

    t = timed(jax.jit(qkv_fused), (x, w3, w1, wf1, wf2))
    print(f"qkv-fused pseudo-layer: {t:.1f} ms ({t - overhead:.1f} net)",
          flush=True)


if __name__ == "__main__":
    main()
