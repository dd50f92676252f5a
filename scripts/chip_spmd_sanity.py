"""Single-chip sanity of the custom_partitioning-wrapped Pallas kernels on
the real TPU (axon): proves the sdy-annotated custom call + Mosaic kernel
compile and run together on this platform. The CPU-mesh tests
(tests/test_spmd_kernels.py) already prove partitioning semantics and
numerics on 8 virtual devices; what only the chip can prove is the
platform lowering. Run after any jax/libtpu bump and before flipping
TUNEVLSEG_KERNELS_SPMD semantics.

Usage (chip):  python scripts/chip_spmd_sanity.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    from tunevlseg_tpu.nn.attention import xla_attention
    from tunevlseg_tpu.ops import conv_pallas as cp
    from tunevlseg_tpu.ops import flash_attention as fa

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("data", "model"))
    rng = np.random.default_rng(0)

    # flash: flagship vision shape
    b, s, h, d = 8, 485, 12, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.bfloat16)
               for _ in range(3))
    spec = NamedSharding(mesh, P("data", None, "model", None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: fa._forward_bh_spmd(q, k, v, None))(
        qs, ks, vs)
    ref = xla_attention(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"flash cp-wrapped on axon: max|err| vs XLA = {err:.4f}", flush=True)
    assert err < 0.1, err

    # the vjp routes through _backward_bh_spmd only when device_count > 1,
    # so on the single chip invoke the cp-wrapped backward directly
    dq2, dk2, dv2 = jax.jit(lambda q, k, v, g: fa._backward_bh_spmd(
        q, k, v, g, None))(qs, ks, vs, jnp.ones_like(q))
    print("flash cp-wrapped backward ran:",
          [float(jnp.sum(jnp.abs(x.astype(jnp.float32)))) > 0
           for x in (dq2, dk2, dv2)], flush=True)

    # flat conv: a CRIS res2-block shape
    spec_c = cp.make_flat_spec(104, 104, 1)
    x = jnp.asarray(rng.standard_normal((8, 104, 104, 64)), jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((64, 64, 3, 3)) * 0.1, jnp.float32)
    flat = cp.flat_begin(x, spec_c)
    fs = jax.device_put(flat, NamedSharding(mesh, P("data", None, None)))
    w_mat = jnp.transpose(wt, (2, 3, 1, 0)).reshape(-1, 64)
    ones, zeros = jnp.ones((64,), jnp.float32), jnp.zeros((64,), jnp.float32)
    out_c = jax.jit(lambda f, w, s, o: cp._conv_spmd_nores(
        spec_c, True, f, w, s, o))(fs, w_mat, ones, zeros)
    ref_c = cp._conv_flat_ref(spec_c, True, flat, w_mat, ones, zeros, None)
    err_c = float(jnp.max(jnp.abs(out_c.astype(jnp.float32)
                                  - ref_c.astype(jnp.float32))))
    print(f"flat conv cp-wrapped on axon: max|err| vs jnp ref = {err_c:.4f}",
          flush=True)
    assert err_c < 0.5, err_c
    print("CHIP_SPMD_SANITY_OK", flush=True)


if __name__ == "__main__":
    main()
