"""In-jit scanned A/B: full CLIP ViT-B/16 encoder layer variants at the
bench shape (b64, width 768, heads 12, bf16) — quantify the two remaining
MFU ideas from the round-1 profile:

  * fused qkv: one (768 -> 2304) GEMM instead of three (768 -> 768)
  * seq padding: S=485 (22x22+1 CLS) vs the MXU-tile-aligned S=512

Methodology per CLAUDE.md: LOOPS iterations inside ONE executable
(lax.scan with a data dependency) so the ~30ms/launch dispatch on this
transport amortizes away; variants interleaved across repeats.
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

    from tunevlseg_tpu.nn.attention import dot_product_attention
    from tunevlseg_tpu.nn.layers import PreNormEncoderLayer, quick_gelu

    B, D, H, F = 64, 768, 12, 3072
    rng = np.random.default_rng(0)

    layer = PreNormEncoderLayer(H, F, "quick_gelu", dtype=jnp.bfloat16)
    params = layer.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, D), jnp.bfloat16))["params"]

    def manual_fused(p, x):
        """Same math as PreNormEncoderLayer with q/k/v as ONE GEMM."""
        def ln(name, h):
            m = jnp.mean(h.astype(jnp.float32), -1, keepdims=True)
            v = jnp.var(h.astype(jnp.float32), -1, keepdims=True)
            nrm = (h.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)
            return (nrm * p[name]["scale"] + p[name]["bias"]).astype(x.dtype)

        a = p["self_attn"]
        wqkv = jnp.concatenate([a["q_proj"]["kernel"], a["k_proj"]["kernel"],
                                a["v_proj"]["kernel"]], 1).astype(x.dtype)
        bqkv = jnp.concatenate([a["q_proj"]["bias"], a["k_proj"]["bias"],
                                a["v_proj"]["bias"]]).astype(x.dtype)
        h = ln("layer_norm1", x)
        qkv = h @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, -1)
        sp = lambda t: t.reshape(*t.shape[:2], H, D // H)
        o = dot_product_attention(sp(q), sp(k), sp(v))
        o = o.reshape(*x.shape[:2], D) @ a["out_proj"]["kernel"].astype(
            x.dtype) + a["out_proj"]["bias"].astype(x.dtype)
        x = x + o
        h = ln("layer_norm2", x)
        m = p["mlp"]
        h = quick_gelu(h @ m["fc1"]["kernel"].astype(x.dtype)
                       + m["fc1"]["bias"].astype(x.dtype))
        h = h @ m["fc2"]["kernel"].astype(x.dtype) + m["fc2"]["bias"].astype(
            x.dtype)
        return x + h

    def make(fn_builder, x):
        def body(c, _):
            return (fn_builder(c) * 0.5).astype(jnp.bfloat16), ()

        def run(x):
            y, _ = lax.scan(body, x, None, length=LOOPS)
            return jnp.sum(y.astype(jnp.float32))

        return jax.jit(run), x

    variants = {}
    for S in (485, 512):
        x = jnp.asarray(rng.normal(size=(B, S, D)) * 0.05, jnp.bfloat16)
        variants[f"layer{S}"] = make(
            lambda c: layer.apply({"params": params}, c), x)
        variants[f"layer{S}_fused"] = make(lambda c: manual_fused(params, c),
                                           x)

    # warmup (compile) everything first
    for name, (fn, x) in variants.items():
        float(fn(x))

    # interleaved timing, 5 repeats
    times = {k: [] for k in variants}
    for _ in range(5):
        for name, (fn, x) in variants.items():
            t0 = time.perf_counter()
            float(fn(x))
            times[name].append((time.perf_counter() - t0) / LOOPS * 1000)
    for name, ts in times.items():
        print(f"{name}: {np.median(ts):.2f} ms/layer-call "
              f"(samples {[round(t, 2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
