"""Fused attention Pallas TPU kernels.

Two variants for the framework's short CLIP sequences (485+ctx tokens):
  * `_forward_batched_heads` (unbiased): grid over batch, a head-group per
    cell in the native layout — softmax(QKᵀ)V entirely in VMEM, no S×S
    scores in HBM; paired with the fused `_backward_batched_heads` vjp;
  * `_forward` (biased): grid over (batch·head, q-block) with full K/V per
    cell; backward recomputes in XLA.
All variants take a STATIC `kv_valid`: keys/values at positions >= kv_valid
are masked to exact-zero probability (and exact-zero dk/dv), supporting the
model-level MXU sequence padding in models/clip/vision.py.
Grid-shape sweeps (scripts/micro_attn.py head groups, micro_attn_grid.py
batch groups + dimension_semantics) confirmed the current shape is the
fastest of the family at the CLIPSeg vision shape (2.23ms vs 2.30-2.76).

MEASURED RESULT (v5e): the batched-heads kernel is ~1.6x FASTER than the
XLA fused path at the CLIPSeg vision shape — 2.86 vs 4.63 ms/call, in-jit
scanned A/B (scripts/micro_attn.py), e2e bench 14.23 -> 15.14 steps/s —
because the S x S score tensor (361MB/layer at b64 s485 h12 bf16) never
round-trips HBM. An earlier per-launch-synced A/B concluded the opposite;
that measurement was an artifact of ~30ms/launch dispatch noise on the
remote transport. Default dispatch is "auto": this kernel for unbiased
self-attention with S >= 256 on TPU, XLA otherwise (nn/attention.py).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flipped by tests on CPU


def _strict() -> bool:
    """TUNEVLSEG_FLASH=strict: kernel failures RAISE instead of silently
    falling back to XLA (VERDICT r2 #7 — a masked Mosaic bug in a long run
    is an invisible perf loss and a lost correctness signal). Read at call
    time so tests can toggle it."""
    return os.environ.get("TUNEVLSEG_FLASH", "") == "strict"


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _multi_device() -> bool:
    return jax.device_count() > 1


def _dispatch(q, k, v, bias, kv_valid=None):
    if _multi_device():
        # sharded-program path: the custom_partitioning-wrapped kernels
        # (ops/spmd.py) run on per-device local (b, h) shards
        from tunevlseg_tpu.ops.spmd import require_spmd_kernels
        require_spmd_kernels("flash kernel")
        if bias is None and q.shape[1] == k.shape[1]:
            return _forward_bh_spmd(q, k, v, kv_valid)
        if bias is None:
            return _forward_nobias_spmd(q, k, v, kv_valid)
        # the rule needs static factor sizes: materialize the broadcast
        # bias (the kernel does this internally anyway)
        b, s, h, _ = q.shape
        bias_full = jnp.broadcast_to(
            bias, (b, h, s, k.shape[1])).astype(jnp.float32)
        return _forward_biased_spmd(q, k, v, bias_full, kv_valid)
    if bias is None and q.shape[1] == k.shape[1]:
        return _forward_batched_heads(q, k, v, kv_valid)
    return _forward(q, k, v, bias, kv_valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def flash_attention_p(kv_valid, q, k, v, bias):
    return _dispatch(q, k, v, bias, kv_valid)


def _forward_batched_heads(q, k, v, kv_valid=None):
    """Unbiased variant tuned for SHORT sequences: grid over batch only,
    all heads processed inside one grid cell (statically unrolled), blocks
    kept in the native (S, H, D) layout — no fold transposes and cells big
    enough (~0.8 GFLOP) to hide DMA behind compute."""
    from jax.experimental import pallas as pl

    b, s, h, d = q.shape
    t = k.shape[1] if kv_valid is None else kv_valid  # mask model-level pads
    scale = d ** -0.5
    s_pad = _ceil_to(s, 128)
    t_pad = _ceil_to(k.shape[1], 128)

    def prep(x, to):
        x = jnp.pad(x, ((0, 0), (0, to - x.shape[1]), (0, 0), (0, 0)))
        # (B, S, H, D) -> (B, H, S, D): per-head 2D slices inside the kernel
        # (Mosaic cannot reshape into strided 4D slots)
        return x.transpose(0, 2, 1, 3)

    qf, kf, vf = prep(q, s_pad), prep(k, t_pad), prep(v, t_pad)

    # heads per grid cell: enough work to hide DMA, small enough for the
    # ~16MB VMEM budget (each head's f32 scores block is s_pad*t_pad*4B)
    hg = 1
    for cand in (4, 3, 2):
        if h % cand == 0 and cand * s_pad * t_pad * 4 * 2 < 8 * 2 ** 20:
            hg = cand
            break

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for head in range(hg):
            qh = q_ref[0, head]                        # (s_pad, d)
            kh = k_ref[0, head]                        # (t_pad, d)
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
        interpret=_INTERPRET,
    )(qf, kf, vf)
    return out.transpose(0, 2, 1, 3)[:, :s]


def _forward(q, k, v, bias, kv_valid=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, s, h, d = q.shape
    t = k.shape[1] if kv_valid is None else kv_valid
    scale = d ** -0.5

    block_q = min(_ceil_to(s, 8), 256)
    s_pad = _ceil_to(s, block_q)
    t_pad = _ceil_to(k.shape[1], 128)
    # keep the native head dim: Mosaic lane-pads internally without the
    # explicit 2x FLOP cost of materializing zeros to 128
    d_pad = _ceil_to(d, 64)

    def pad(x, seq_to):
        return jnp.pad(x, ((0, 0), (0, seq_to - x.shape[1]), (0, 0),
                           (0, d_pad - d)))

    # (B, S, H, D) -> (B*H, S, D)
    def fold(x, seq_to):
        x = pad(x, seq_to)
        return x.transpose(0, 2, 1, 3).reshape(b * h, seq_to, d_pad)

    qf = fold(q, s_pad)
    kf = fold(k, t_pad)
    vf = fold(v, t_pad)

    has_bias = bias is not None
    if has_bias:
        tb = k.shape[1]
        bias_full = jnp.broadcast_to(bias, (b, h, s, tb)).astype(jnp.float32)
        bias_full = jnp.pad(bias_full,
                            ((0, 0), (0, 0), (0, s_pad - s), (0, t_pad - tb)))
        bias_full = bias_full.reshape(b * h, s_pad, t_pad)

    grid = (b * h, s_pad // block_q)

    def kernel(*refs):
        if has_bias:
            q_ref, k_ref, v_ref, b_ref, o_ref = refs
        else:
            q_ref, k_ref, v_ref, o_ref = refs
        # matmuls run at the input precision (bf16 MXU rate when the model
        # computes in bf16) with f32 accumulation
        qb = q_ref[0]                              # (block_q, d_pad)
        kb = k_ref[0]                              # (t_pad, d_pad)
        scores = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if has_bias:
            scores = scores + b_ref[0]
        # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < t, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom
        o_ref[0] = out.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
        pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((1, t_pad, d_pad), lambda i, j: (i, 0, 0)),
    ]
    args = [qf, kf, vf]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_q, t_pad),
                                     lambda i, j: (i, j, 0)))
        args.append(bias_full)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
        interpret=_INTERPRET,
    )(*args)

    out = out.reshape(b, h, s_pad, d_pad).transpose(0, 2, 1, 3)
    return out[:, :s, :, :d]


def _backward_batched_heads(q, k, v, g, kv_valid=None):
    """Fused backward for the unbiased batched-heads variant. The sequences
    here are short (<=~512 after padding), so each head's full (s, t) score
    matrix fits VMEM: recompute p = softmax(qk^T) flash-style (no stored
    residual beyond q/k/v), then the standard 5-matmul attention backward

        dv = p^T g,  dp = g v^T,  delta_i = sum_j p_ij dp_ij,
        ds = p (dp - delta) * scale,  dq = ds k,  dk = ds^T q

    all inside one grid cell per (batch, head-group) — none of the four
    (s, t) intermediates (scores, p, dp, ds) ever round-trips HBM, which is
    the same reason the forward beats XLA at these shapes. Probabilities
    and ds are cast to the input dtype for the MXU matmuls (f32
    accumulation), mirroring the XLA recompute path's bf16 numerics."""
    from jax.experimental import pallas as pl

    b, s, h, d = q.shape
    t = k.shape[1] if kv_valid is None else kv_valid
    scale = d ** -0.5
    s_pad = _ceil_to(s, 128)
    t_pad = _ceil_to(k.shape[1], 128)

    def prep(x, to):
        x = jnp.pad(x, ((0, 0), (0, to - x.shape[1]), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3)

    qf, kf = prep(q, s_pad), prep(k, t_pad)
    vf, gf = prep(v, t_pad), prep(g.astype(q.dtype), s_pad)

    # four f32 (s_pad, t_pad) live intermediates per head -> tighter VMEM
    # budget than the forward's two
    hg = 1
    for cand in (4, 3, 2):
        if h % cand == 0 and cand * s_pad * t_pad * 4 * 4 < 10 * 2 ** 20:
            hg = cand
            break

    def kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
        for head in range(hg):
            qh = q_ref[0, head]                         # (s_pad, d)
            kh = k_ref[0, head]                         # (t_pad, d)
            vh = v_ref[0, head]
            gh = g_ref[0, head]
            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < t, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)  # (s_pad, t_pad) f32
            pc = p.astype(qh.dtype)
            # dv = p^T g
            dv = jax.lax.dot_general(
                pc, gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dp = g v^T
            dp = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            delta = jnp.sum(p * dp, axis=-1, keepdims=True)
            ds = (p * (dp - delta) * scale).astype(qh.dtype)
            dq = jax.lax.dot_general(
                ds, kh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, qh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq_ref[0, head] = dq.astype(dq_ref.dtype)
            dk_ref[0, head] = dk.astype(dk_ref.dtype)
            dv_ref[0, head] = dv.astype(dv_ref.dtype)

    spec_s = pl.BlockSpec((1, hg, s_pad, d), lambda i, j: (i, j, 0, 0))
    spec_t = pl.BlockSpec((1, hg, t_pad, d), lambda i, j: (i, j, 0, 0))
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b, h // hg),
        in_specs=[spec_s, spec_t, spec_t, spec_s],
        out_specs=(spec_s, spec_t, spec_t),
        out_shape=(jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, t_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, t_pad, d), v.dtype)),
        interpret=_INTERPRET,
    )(qf, kf, vf, gf)

    def unprep(x, n):
        return x.transpose(0, 2, 1, 3)[:, :n]

    # masked key columns produce EXACT zero dk/dv rows (p and ds vanish
    # there), so slicing back to the full input T is correct under kv_valid
    return unprep(dq, s), unprep(dk, k.shape[1]), unprep(dv, k.shape[1])


# SPMD variants: identical kernels, but partitionable along batch (dp/fsdp)
# and heads (tp); seq and head_dim factors are need-replication. Engaged by
# _dispatch/_bwd whenever the program spans >1 device.
from tunevlseg_tpu.ops.spmd import partitioned_kernel  # noqa: E402

_forward_bh_spmd = partitioned_kernel(
    _forward_batched_heads,
    in_mappings=(("b", "s", "h", "d"), ("b", "t", "h", "d"),
                 ("b", "t", "h", "d")),
    out_mappings=(("b", "s", "h", "d"),),
    shardable=("b", "h"), static_argnums=(3,))

_backward_bh_spmd = partitioned_kernel(
    _backward_batched_heads,
    in_mappings=(("b", "s", "h", "d"), ("b", "t", "h", "d"),
                 ("b", "t", "h", "d"), ("b", "s", "h", "d")),
    out_mappings=(("b", "s", "h", "d"), ("b", "t", "h", "d"),
                  ("b", "t", "h", "d")),
    shardable=("b", "h"), static_argnums=(4,))


def _forward_nobias(q, k, v, kv_valid=None):
    return _forward(q, k, v, None, kv_valid)


_forward_nobias_spmd = partitioned_kernel(
    _forward_nobias,
    in_mappings=(("b", "s", "h", "d"), ("b", "t", "h", "d"),
                 ("b", "t", "h", "d")),
    out_mappings=(("b", "s", "h", "d"),),
    shardable=("b", "h"), static_argnums=(3,))

# bias operand must arrive pre-broadcast to the full (b, h, s, t) — the
# rule binds factor sizes across operands, so a broadcastable (1, 1, s, t)
# bias would clash with q's b/h
_forward_biased_spmd = partitioned_kernel(
    _forward,
    in_mappings=(("b", "s", "h", "d"), ("b", "t", "h", "d"),
                 ("b", "t", "h", "d"), ("b", "h", "s", "t")),
    out_mappings=(("b", "s", "h", "d"),),
    shardable=("b", "h"), static_argnums=(4,))


def _fwd(kv_valid, q, k, v, bias):
    return _dispatch(q, k, v, bias, kv_valid), (q, k, v, bias)


def _bwd(kv_valid, res, g):
    q, k, v, bias = res
    if bias is None and q.shape[1] == k.shape[1]:
        try:
            if _multi_device():
                from tunevlseg_tpu.ops.spmd import require_spmd_kernels
                require_spmd_kernels("flash backward")
                dq, dk, dv = _backward_bh_spmd(q, k, v, g, kv_valid)
            else:
                dq, dk, dv = _backward_batched_heads(q, k, v, g, kv_valid)
            return dq, dk, dv, None
        except Exception:  # Mosaic/VMEM limits -> XLA recompute below
            if _strict():
                raise
            pass
    # exact recomputation in XLA (the biased/cross-attention variants)
    def ref_attn(q, k, v, bias):
        from tunevlseg_tpu.nn.attention import xla_attention
        return xla_attention(q, k, v, bias, kv_valid=kv_valid)

    _, vjp = jax.vjp(ref_attn, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


flash_attention_p.defvjp(_fwd, _bwd)


_warned = False


def flash_attention(q, k, v, bias: Optional[jnp.ndarray] = None,
                    kv_valid: Optional[int] = None):
    """Returns fused attention output, or None to signal fallback.

    `kv_valid` (static) masks key/value positions >= kv_valid — the
    model-level MXU seq-padding contract (models/clip/vision.py): padded
    tokens may ride through the GEMMs but must never be attended to."""
    global _warned
    try:
        return flash_attention_p(kv_valid, q, k, v, bias)
    except Exception as e:  # fall back to the XLA path, but say so once
        if _strict():
            raise
        if not _warned:
            _warned = True
            import logging
            logging.getLogger("tunevlseg").warning(
                "pallas flash attention unavailable (%s); using XLA path", e)
        return None
