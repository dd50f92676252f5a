"""Micro-benchmark: per-sample dynamic 3x3 conv formulations on TPU.

The CRIS Projector ends in a per-sample dynamic convolution (one 3x3xC
filter per batch element). Candidate lowerings:
  a) grouped conv, feature_group_count=B (1 output channel per group)
  b) 9-tap shift-and-contract: sum_k einsum('bchw,bc->bhw')
  c) reference check on small shapes (numpy) for exactness
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

    B, C, H, W, K = 64, 256, 104, 104, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, C, H, W)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(B, C, K, K)) * 0.05, jnp.bfloat16)

    def grouped(x, w):
        out = jax.lax.conv_general_dilated(
            x.reshape(1, B * C, H, W), w,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=B)
        return jnp.sum(out.astype(jnp.float32))

    def shifts(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        out = jnp.zeros((B, H, W), jnp.float32)
        for dy in range(K):
            for dx in range(K):
                out = out + jnp.einsum(
                    "bchw,bc->bhw", xp[:, :, dy:dy + H, dx:dx + W],
                    w[:, :, dy, dx], preferred_element_type=jnp.float32)
        return jnp.sum(out)

    def batched_mm(x, w):
        # im2col-free: contract C with a batched matmul per tap group by
        # folding taps into the contraction: patches (B, 9C, HW)
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
        cols = jnp.stack([xp[:, :, dy:dy + H, dx:dx + W]
                          for dy in range(K) for dx in range(K)], axis=1)
        cols = cols.reshape(B, K * K * C, H * W)
        wf = w.transpose(0, 2, 3, 1).reshape(B, K * K * C)
        out = jnp.einsum("bkp,bk->bp", cols, wf,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out)

    fns = {"grouped": grouped, "shifts": shifts, "batched_mm": batched_mm}
    outs = {}
    for name, fn in fns.items():
        j = jax.jit(fn)
        outs[name] = float(j(x, w))
        print(f"{name}: {timed(j, (x, w)):.1f} ms  (checksum {outs[name]:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
