"""SPMD execution of the Pallas kernels through their custom_partitioning
rules (ops/spmd.py) on the 8-device virtual CPU mesh, with interpret-mode
kernels — every case compares a sharded jitted run against the plain
single-device kernel / XLA formulation.

What this proves: the partition callbacks hand the kernels per-device LOCAL
shapes (no all-gather of the batch/head dims), the shardy rule replicates
the factors the kernels need whole (seq, head_dim, flat rows, channels),
and numerics/gradients are identical to the unsharded run. What it cannot
prove here: Mosaic compilation of the local shapes on a real multi-chip TPU
(the kernels themselves are chip-proven single-device at these and larger
shapes; `TUNEVLSEG_KERNELS_SPMD=0` is the production kill switch).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import tunevlseg_tpu.ops.conv_pallas as cp
from tunevlseg_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)
    monkeypatch.setattr(cp, "_INTERPRET", True)


def dp_tp_mesh():
    assert jax.device_count() == 8, "conftest provides the 8-device CPU mesh"
    return Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "model"))


def qkv(rng, b=8, s=160, h=4, d=16, t=None):
    t = s if t is None else t
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    return q, k, v


def shard(mesh, x, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def test_flash_forward_dp_tp_matches_plain_kernel(rng):
    mesh = dp_tp_mesh()
    q, k, v = qkv(rng)
    ref = fa._forward_batched_heads(q, k, v, None)  # plain, unsharded

    spec = P("data", None, "model", None)
    qs, ks, vs = (shard(mesh, x, spec) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: fa.flash_attention_p(None, q, k, v, None)
                  )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # the batch/head shardings pass through the rule to the output
    out_spec = out.sharding.spec
    assert out_spec[0] == "data" and out_spec[2] == "model"


def test_flash_forward_kv_valid_dp_tp(rng):
    from tunevlseg_tpu.nn.attention import xla_attention
    mesh = dp_tp_mesh()
    q, k, v = qkv(rng, s=144)
    kv_valid = 130  # mask the final 14 positions (MXU seq-padding contract)
    ref = xla_attention(q, k, v, kv_valid=kv_valid)

    spec = P("data", None, "model", None)
    qs, ks, vs = (shard(mesh, x, spec) for x in (q, k, v))
    out = jax.jit(lambda q, k, v: fa.flash_attention_p(kv_valid, q, k, v,
                                                       None))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flash_gradients_dp_tp_match_xla(rng):
    from tunevlseg_tpu.nn.attention import xla_attention
    mesh = dp_tp_mesh()
    q, k, v = qkv(rng)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention_p(None, q, k, v, None) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    ref_grads = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    spec = P("data", None, "model", None)
    qs, ks, vs = (shard(mesh, x, spec) for x in (q, k, v))
    got = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(qs, ks, vs)
    for g, r in zip(got, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=1e-4)


def test_flash_seq_sharded_input_is_replicated_not_wrong(rng):
    """A (hypothetical) sequence-sharded operand must produce CORRECT
    attention: 's'/'t' are need-replication factors, so the partitioner
    reshards them whole before the kernel instead of computing a local
    softmax over a sequence slice."""
    mesh = dp_tp_mesh()
    q, k, v = qkv(rng, b=4, s=128)
    ref = fa._forward_batched_heads(q, k, v, None)
    qs = shard(mesh, q, P(None, "data", None, None))  # seq-sharded!
    ks = shard(mesh, k, P(None, "data", None, None))
    vs = shard(mesh, v, P(None, None, "model", None))
    out = jax.jit(lambda q, k, v: fa.flash_attention_p(None, q, k, v, None)
                  )(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flash_kill_switch_raises_then_xla_fallback(rng, monkeypatch):
    monkeypatch.setenv("TUNEVLSEG_KERNELS_SPMD", "0")
    q, k, v = qkv(rng, b=2, s=128)
    # device_count is 8 here, so the dispatch must refuse the kernel...
    with pytest.raises(ValueError, match="KERNELS_SPMD"):
        fa._dispatch(q, k, v, None, None)
    # ...and the public entry falls back to the XLA path (returns None)
    monkeypatch.delenv("TUNEVLSEG_FLASH", raising=False)
    assert fa.flash_attention(q, k, v) is None


def conv_setup(rng, b=8, h=10, w=12, cin=8, cout=16, k=3):
    spec = cp.make_flat_spec(h, w, 1)
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((cout, cin, k, k)) * 0.2,
                     jnp.float32)
    scale = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    offset = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    return spec, x, wt, scale, offset


def test_conv_flat_batch_sharded_matches_ref(rng):
    mesh = dp_tp_mesh()
    spec, x, wt, scale, offset = conv_setup(rng)

    def f(x, wt, scale, offset):
        flat = cp.flat_begin(x, spec)
        out = cp.conv_flat(flat, spec, wt, scale, offset, relu=True)
        return cp.flat_end(out, spec)

    ref = f(x, wt, scale, offset)  # 8 devices, replicated inputs: also SPMD
    # reference formulation, no pallas involved at all
    w_mat = jnp.transpose(wt, (2, 3, 1, 0)).reshape(-1, wt.shape[0])
    ref_jnp = cp.flat_end(cp._conv_flat_ref(
        spec, True, cp.flat_begin(x, spec), w_mat, scale, offset, None), spec)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ref_jnp),
                               atol=1e-4, rtol=1e-4)

    xs = shard(mesh, x, P("data", None, None, None))
    out = jax.jit(f)(xs, wt, scale, offset)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_jnp),
                               atol=1e-4, rtol=1e-4)


def test_conv_flat_batch_sharded_grads(rng):
    mesh = dp_tp_mesh()
    spec, x, wt, scale, offset = conv_setup(rng, b=4)
    res = jnp.asarray(rng.standard_normal((4, spec.rows, 16)), jnp.float32)

    def loss(x, wt, scale, offset, res):
        flat = cp.flat_begin(x, spec)
        out = cp.conv_flat(flat, spec, wt, scale, offset, relu=True,
                           residual=res)
        return jnp.sum(cp.flat_end(out, spec) ** 2)

    ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, wt, scale, offset, res)
    xs = shard(mesh, x, P("data", None, None, None))
    rs = shard(mesh, res, P("data", None, None))
    got = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
        xs, wt, scale, offset, rs)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-4, rtol=2e-4)


def test_conv_kill_switch(monkeypatch, rng):
    monkeypatch.setenv("TUNEVLSEG_KERNELS_SPMD", "0")
    monkeypatch.setenv("TUNEVLSEG_PCONV", "strict")
    spec, x, wt, scale, offset = conv_setup(rng, b=2)
    flat = cp.flat_begin(x, spec)
    with pytest.raises(ValueError, match="KERNELS_SPMD"):
        cp.conv_flat(flat, spec, wt, scale, offset)


def test_flash_biased_cross_attention_dp_tp(rng):
    """The biased/cross variant (CLIP text tower: causal + padding bias)
    also carries a rule — the broadcast bias is materialized to (b,h,s,t)
    at the dispatch so the factor sizes bind."""
    from tunevlseg_tpu.nn.attention import (causal_bias, padding_bias,
                                            xla_attention)
    mesh = dp_tp_mesh()
    b, s = 8, 64
    q, k, v = qkv(rng, b=b, s=s)
    mask = np.ones((b, s), np.int32)
    mask[1, 40:] = 0
    bias = causal_bias(s) + padding_bias(jnp.asarray(mask))
    ref = xla_attention(q, k, v, bias)

    spec = P("data", None, "model", None)
    qs, ks, vs = (shard(mesh, x, spec) for x in (q, k, v))
    out = jax.jit(lambda q, k, v, bias: fa.flash_attention_p(
        None, q, k, v, bias))(qs, ks, vs, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_vision_tower_flash_spmd_matches_xla(rng, monkeypatch):
    """Model-level integration: the real CLIP vision tower with the flash
    kernel FORCED (TUNEVLSEG_FLASH=1) through its SPMD rule on the dp x tp
    mesh, batch-sharded pixels, vs the unforced XLA run — proves the
    in-model wiring (head counts, layouts) survives sharded execution."""
    from tunevlseg_tpu.models.clip.config import CLIPSegConfig
    from tunevlseg_tpu.models.clip.vision import CLIPVisionTower

    mesh = dp_tp_mesh()
    cfg = CLIPSegConfig.tiny()
    tower = CLIPVisionTower(cfg.vision)
    pix = jnp.asarray(rng.standard_normal((8, 3, 32, 32)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), pix)

    monkeypatch.delenv("TUNEVLSEG_FLASH", raising=False)
    _, ref, _ = tower.apply(params, pix)  # XLA attention (CPU, unforced)

    monkeypatch.setenv("TUNEVLSEG_FLASH", "1")
    pix_s = shard(mesh, pix, P("data", None, None, None))
    _, got, _ = jax.jit(tower.apply)(params, pix_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flash_spmd_inserts_no_collectives(rng):
    """The perf property, not just correctness: a batch+head-sharded flash
    call must partition with ZERO collectives (each device runs its local
    kernel); a seq-sharded operand must instead be all-gathered whole.
    Compile-time check on the lowered HLO."""
    mesh = dp_tp_mesh()
    q, k, v = qkv(rng)
    f = jax.jit(lambda q, k, v: fa.flash_attention_p(None, q, k, v, None))

    spec = P("data", None, "model", None)
    qs, ks, vs = (shard(mesh, x, spec) for x in (q, k, v))
    hlo = f.lower(qs, ks, vs).compile().as_text()
    for coll in ("all-gather", "all-to-all", "all-reduce",
                 "collective-permute"):
        assert coll not in hlo, f"unexpected {coll} around the flash kernel"
    # (the seq-sharded case DOES reshard — covered numerically by
    # test_flash_seq_sharded_input_is_replicated_not_wrong; XLA:CPU lowers
    # that reshard without a literal all-gather op, so no HLO contrast here)


def test_conv_flat_spmd_inserts_no_collectives(rng):
    mesh = dp_tp_mesh()
    spec, x, wt, scale, offset = conv_setup(rng)

    def f(x, wt, scale, offset):
        flat = cp.flat_begin(x, spec)
        return cp.flat_end(
            cp.conv_flat(flat, spec, wt, scale, offset, relu=True), spec)

    xs = shard(mesh, x, P("data", None, None, None))
    hlo = jax.jit(f).lower(xs, wt, scale, offset).compile().as_text()
    for coll in ("all-gather", "all-to-all", "all-reduce",
                 "collective-permute"):
        assert coll not in hlo, f"unexpected {coll} around the flat conv"


def test_flash_spmd_legacy_gspmd_partitioner(rng):
    """The infer/partition callbacks serve the legacy (non-shardy)
    partitioner — flip it off for one compile to exercise them."""
    mesh = dp_tp_mesh()
    q, k, v = qkv(rng, b=4, s=128, h=2)
    ref = fa._forward_batched_heads(q, k, v, None)
    spec = P("data", None, "model", None)
    qs, ks, vs = (shard(mesh, x, spec) for x in (q, k, v))
    jax.config.update("jax_use_shardy_partitioner", False)
    try:
        out = jax.jit(lambda q, k, v: fa.flash_attention_p(
            None, q, k, v, None))(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
    finally:
        jax.config.update("jax_use_shardy_partitioner", True)
