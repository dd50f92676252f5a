"""Per-stage RN50 (CRIS ModifiedResNet) timing on the chip — where does the
vision tower's ~15% MFU go? (profile_cris r3: fwd 29.8ms net vs ~4.6ms
ideal at b64@416 bf16.)

Each stage is rebuilt standalone at its exact shape and timed with an
in-jit chained lax.scan (axon measurement rules). Prints measured vs ideal
(197 TFLOP/s bf16) per stage.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def timed_chain(fn, x0, params, iters=20):
    """fn(params, x) -> y; params passed as a jit ARG (axon remote-compile
    rejects closures with baked-in weight constants, CLAUDE.md rules)."""
    import jax
    import jax.numpy as jnp

    def scanned(p, x0):
        def body(c, _):
            y = fn(p, c)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-20
            return c + s.astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    j = jax.jit(scanned)
    float(j(params, x0))
    t0 = time.perf_counter()
    float(j(params, x0))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from tunevlseg_tpu.models.cris.resnet import (AttentionPool2d,
                                                  BatchNorm2d, Bottleneck,
                                                  Conv2d, avg_pool_nchw)

    B = 64
    rng = np.random.default_rng(0)
    results = []

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, (cin, cout) in enumerate(((3, 32), (32, 32), (32, 64))):
                x = Conv2d(cin, cout, 3, stride=2 if i == 0 else 1,
                           padding=1, use_bias=False, dtype=jnp.bfloat16,
                           name=f"conv{i+1}")(x)
                x = nn.relu(BatchNorm2d(cout, True, name=f"bn{i+1}")(x))
            return avg_pool_nchw(x, 2)

    class Stage(nn.Module):
        inplanes: int
        planes: int
        blocks: int
        stride: int

        @nn.compact
        def __call__(self, x):
            inp = self.inplanes
            for b in range(self.blocks):
                x = Bottleneck(inp, self.planes,
                               self.stride if b == 0 else 1, True,
                               dtype=jnp.bfloat16, name=f"b{b}")(x)
                inp = self.planes * 4
            return x

    def flops_bottleneck(cin, planes, stride, hw_out):
        cout = planes * 4
        f = hw_out * hw_out * (cin * planes          # 1x1 (applied pre-stride? approx)
                               + planes * planes * 9
                               + planes * cout)
        if stride != 1 or cin != cout:
            f += hw_out * hw_out * cin * cout        # downsample 1x1
        return 2 * f * B

    cases = [
        ("stem", Stem(), (B, 3, 416, 416),
         2 * B * (208 * 208 * (3 * 32 * 9 + 32 * 32 * 9 + 32 * 64 * 9))),
        ("layer1", Stage(64, 64, 3, 1), (B, 64, 104, 104),
         sum(flops_bottleneck(64 if b == 0 else 256, 64, 1, 104)
             for b in range(3))),
        ("layer2", Stage(256, 128, 4, 2), (B, 256, 104, 104),
         sum(flops_bottleneck(256 if b == 0 else 512, 128, 2 if b == 0 else 1,
                              52) for b in range(4))),
        ("layer3", Stage(512, 256, 6, 2), (B, 512, 52, 52),
         sum(flops_bottleneck(512 if b == 0 else 1024, 256,
                              2 if b == 0 else 1, 26) for b in range(6))),
        ("layer4", Stage(1024, 512, 3, 2), (B, 1024, 26, 26),
         sum(flops_bottleneck(1024 if b == 0 else 2048, 512,
                              2 if b == 0 else 1, 13) for b in range(3))),
        ("attnpool", AttentionPool2d(13, 2048, 32, 1024, True,
                                     dtype=jnp.bfloat16), (B, 2048, 13, 13),
         2 * B * 170 * (2048 * 2048 * 3 + 170 * 2048 * 2 + 2048 * 1024)),
    ]

    total_ms = total_ideal = 0.0
    for name, mod, shape, flops in cases:
        x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x)
        ms = timed_chain(lambda p, c, m=mod: m.apply(p, c), x, params)
        ideal = flops / 197e12 * 1e3
        total_ms += ms
        total_ideal += ideal
        print(f"{name:9s} {ms:7.2f} ms   ideal {ideal:6.2f} ms   "
              f"MFU {100 * ideal / ms:5.1f}%")
    print(f"{'TOTAL':9s} {total_ms:7.2f} ms   ideal {total_ideal:6.2f} ms")


if __name__ == "__main__":
    main()
