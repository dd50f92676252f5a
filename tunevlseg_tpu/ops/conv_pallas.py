"""Flat-space Pallas TPU conv kernels for the small-channel "conv-emitter
floor" stages (docs/ROOFLINE.md: RN50 stem/layer1/layer2 run at 13-25% MFU
under the XLA conv emitter at C<=128, and every source-level layout or
einsum reformulation was measured to cancel at the graph level).

The idea: keep activations in a PADDED, ROW-FLATTENED layout
    (B, ROWS, C)   with pixel (h, w) of the zero-padded (Hp, Wp) plane
                   stored at row  MB + h*Wp + w,
so that every tap (dy, dx) of a stride-1 kxk convolution is a CONSTANT
row offset (dy-r)*Wp + (dx-r).  The im2col patch matrix for a band of MB
output rows is then built by k*k contiguous sublane-shifted copies inside
VMEM, and the conv becomes ONE large GEMM

    (MB, k*k*C) @ (k*k*C, Cout)

whose contraction depth k*k*C fills the 128-deep MXU (K=576 for the
k=3/C=64 stages) instead of the K=64 quarter-utilization regime the conv
emitter hits at these shapes.  The first and last band of each image are
guard bands (written as zeros, never computed), which makes the layout
CHAINABLE: a whole stride-1 stage (1x1s, 3x3s, residual adds, fused
frozen-BN affines and ReLUs) runs flat with a single pad/reshape on entry
and one slice on exit.

Reference counterpart: the implicit cuDNN conv layer under
/root/reference/src/models/components/cris_model/clip.py:185-275 (CLIP
ModifiedResNet) and detectron2/modelling/backbone/resnet.py (FreeSOLO
R101); there is no reference kernel code — this is TPU-native design.

Numerics: taps accumulate in f32 on the MXU, the fused affine/residual/
ReLU epilogue runs in f32, outputs cast back to the input dtype — the
same contract as the XLA path (nn/conv.py).

Gradients: `conv_flat` carries an analytic custom_vjp (`_conv_flat_bwd`)
— the transpose of a flat conv is a flat conv with the spatially-flipped
transposed weight, so dx rides the SAME Pallas kernel and dW is k*k
GEMMs contracting over B*ROWS; trainable paths (the trans_seg upsampler
is full-FT) pay kernel-grade cost in both directions.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flipped by tests on CPU
_FORCE_MODE: Optional[str] = None  # "im2col" | "taps" — micro-bench override
# Both grid dims are dependency-free (each step writes a disjoint output
# block; halo reads only overlap INPUT blocks), so "parallel" is legal on
# both. Kept overridable for micro probes (scripts/micro_pconv_probe.py).
_DIM_SEMANTICS = ("arbitrary", "arbitrary")
_SKIP_MASK = False  # timing probe ONLY: skip the validity-mask epilogue
_WARNED_FALLBACK = False


def _strict() -> bool:
    """TUNEVLSEG_PCONV=strict: kernel failures RAISE instead of silently
    falling back to the jnp reference path (same contract as
    TUNEVLSEG_FLASH=strict)."""
    return os.environ.get("TUNEVLSEG_PCONV", "") == "strict"


def flat_conv_mode() -> str:
    """The TUNEVLSEG_PALLAS_CONV value ("0" = disabled), read at model
    build/trace time by every wired backbone. Multi-device TPU programs
    run the kernel through its custom_partitioning rule (ops/spmd.py:
    batch shardable, rows/channels replicated — matching dp/fsdp batch
    sharding; tp replicates convs per parallel/sharding_rules.py), unless
    TUNEVLSEG_KERNELS_SPMD=0 opts multi-device runs back to the plain XLA
    conv path. CPU programs keep the flat layout regardless of device
    count — they dispatch to the jnp reference formulation, which shards
    natively (tests, mesh dryruns)."""
    v = os.environ.get("TUNEVLSEG_PALLAS_CONV", "0")
    if v in ("0", ""):
        return "0"
    from tunevlseg_tpu.ops.spmd import multi_device_kernels_blocked
    if jax.default_backend() == "tpu" and multi_device_kernels_blocked():
        return "0"
    return v


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _use_im2col(k2: int, c: int) -> bool:
    """im2col pays k*k VMEM tap copies to lift the GEMM contraction to
    k*k*C; once C alone fills the MXU depth (>=128 lanes), accumulating
    k*k direct dots is the same MXU utilization without the copies.
    Single decision point shared by the kernel and the VMEM gate (a
    forced-mode mismatch would let the gate pass a shape whose scratch
    Mosaic then rejects at XLA-compile time)."""
    if _FORCE_MODE is not None and k2 > 1:
        return _FORCE_MODE == "im2col"
    return k2 > 1 and c < 128


@dataclasses.dataclass(frozen=True)
class FlatSpec:
    """Geometry of one flat space: a stride-1 conv chain at fixed (H, W).

    All arrays in the space are (B, ROWS, C) with pixel (h, w) of the
    r-padded (Hp, Wp) plane at row MB + h*Wp + w; rows [0, MB) and
    [(nb_pix+1)*MB, ROWS) are zero guard bands, rows beyond the pixel
    block inside the middle bands are masked to zero by the kernel.
    """

    h: int
    w: int
    r: int          # max tap radius hosted by this space (k <= 2r+1)
    mb: int         # band height (rows per grid step), multiple of 8
    qb: int = 0     # halo fetch granularity: divides mb, >= lead; 0 == mb

    @property
    def hp(self) -> int:
        return self.h + 2 * self.r

    @property
    def wp(self) -> int:
        return self.w + 2 * self.r

    @property
    def mp(self) -> int:
        return self.hp * self.wp

    @property
    def lead(self) -> int:
        return self.r * self.wp + self.r

    @property
    def nb_pix(self) -> int:
        return -(-self.mp // self.mb)

    @property
    def rows(self) -> int:
        return (self.nb_pix + 2) * self.mb


def make_flat_spec(h: int, w: int, r: int = 1, mb: Optional[int] = None,
                   max_k2c: Optional[int] = None,
                   itemsize: int = 2) -> FlatSpec:
    """Pick a band height: big enough to engage every MXU and amortize
    per-band overhead, small enough that the im2col patch scratch
    (mb x max_k2c) stays ~<=3MB of VMEM, and always >= the tap lead
    r*Wp + r so band-1 reads stay in bounds.

    The halo granularity qb = mb/d (largest d in 8/4/2/1 with d*lead <=
    mb) bounds the HBM read amplification of the neighbor fetches at
    1 + 2/d — at d=8 the kernel reads x 1.25x instead of the 3x a
    full-block halo would cost, which is what keeps the BW-bound
    small-channel stages compute-limited.

    Bands are sized to the image: pick the band COUNT under the VMEM cap
    first, then split the padded pixel rows evenly — a fixed mb would
    compute up to ~2x excess guard rows at the small-spatial stages
    (26x26 stage3: 1536 rows banded naively vs 784 pixels)."""
    wp = w + 2 * r
    lead = r * wp + r
    mp = (h + 2 * r) * wp
    if mb is None:
        cap = 2048
        if max_k2c:
            cap = min(cap, (4 * 2 ** 20) // (max_k2c * itemsize))
        cap = _ceil_to(max(cap, lead, 128), 128)
        nbp = -(-mp // cap)
        mb = _ceil_to(max(-(-mp // nbp), lead, 128), 128)
    d = next((d for d in (8, 4, 2, 1) if mb % d == 0 and mb // d >= lead), 1)
    spec = FlatSpec(h, w, r, mb, mb // d)
    if spec.qb < spec.lead:
        raise ValueError(f"halo {spec.qb} < lead {spec.lead}")
    return spec


def flat_begin(x_nhwc: jnp.ndarray, spec: FlatSpec) -> jnp.ndarray:
    """(B, H, W, C) -> flat (B, ROWS, C) with zero pads and guard bands."""
    b, h, w, c = x_nhwc.shape
    assert (h, w) == (spec.h, spec.w), (x_nhwc.shape, spec)
    r = spec.r
    xp = jnp.pad(x_nhwc, ((0, 0), (r, r), (r, r), (0, 0)))
    flat = xp.reshape(b, spec.mp, c)
    return jnp.pad(flat, ((0, 0), (spec.mb, spec.rows - spec.mb - spec.mp),
                          (0, 0)))


def flat_end(flat: jnp.ndarray, spec: FlatSpec) -> jnp.ndarray:
    """flat (B, ROWS, C) -> (B, H, W, C) (drops guards and spatial pad)."""
    b, _, c = flat.shape
    r = spec.r
    x = flat[:, spec.mb:spec.mb + spec.mp].reshape(b, spec.hp, spec.wp, c)
    return x[:, r:spec.hp - r, r:spec.wp - r]


def _tap_offsets(spec: FlatSpec, k: int):
    r = k // 2
    return [(dy - r) * spec.wp + (dx - r) for dy in range(k)
            for dx in range(k)]


def _conv_flat_ref(spec: FlatSpec, relu: bool, x, w_mat, scale, offset,
                   residual):
    """jnp reference of the flat conv (differentiable; used for the
    custom_vjp backward, interpret-free CPU tests, and strict-off
    fallback). x (B, ROWS, C), w_mat (k*k*C, Cout)."""
    c = x.shape[-1]
    k2 = w_mat.shape[0] // c
    k = int(round(k2 ** 0.5))
    offs = _tap_offsets(spec, k)
    lead = spec.lead
    xg = jnp.pad(x, ((0, 0), (lead, lead), (0, 0)))
    acc = None
    for t, off in enumerate(offs):
        sl = jax.lax.dynamic_slice_in_dim(xg, lead + off, spec.rows, 1)
        part = jnp.einsum("bmc,co->bmo", sl,
                          w_mat[t * c:(t + 1) * c].astype(sl.dtype),
                          preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc * scale[None, None] + offset[None, None]
    if residual is not None:
        acc = acc + residual.astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    rowid = jnp.arange(spec.rows)[None, :, None]
    p = rowid - spec.mb
    pc = jnp.maximum(p, 0)
    hh, ww = pc // spec.wp, pc % spec.wp
    r = spec.r
    valid = ((p >= 0) & (hh >= r) & (hh < spec.hp - r)
             & (ww >= r) & (ww < spec.wp - r))
    return jnp.where(valid, acc, 0.0).astype(x.dtype)


_VMEM_BUDGET = 12 * 2 ** 20  # conservative vs the ~16MB/core VMEM


def _kernel_vmem_bytes(spec: FlatSpec, c: int, k2c: int, cout: int,
                       itemsize: int, has_res: bool) -> int:
    """Static VMEM estimate for one grid step (streamed blocks counted
    twice for the pipeline's double buffering). Mosaic VMEM exhaustion
    raises at XLA-compile time, where the dispatch's try/except cannot
    reach — this check keeps oversized shapes on the jnp path instead."""
    mb = spec.mb
    qb = spec.qb or mb
    halo = k2c > c
    streamed = (mb + 2 * qb if halo else mb) * c + mb * cout
    if has_res:
        streamed += mb * cout
    resident = k2c * cout + (mb + 2 * qb) * c  # weights + window copy
    if _use_im2col(k2c // c, c):
        resident += mb * k2c
    # Count the resident scratch double too: Mosaic allocates the window
    # copy / im2col buffer on the pipelined stack, so an up-banded
    # im2col case measured 30.31M actual scoped VMEM against an 11.6M
    # single-buffered estimate (PERF_r04/micro_pconv_probe.log) — the
    # single-counted guard let it through to a compile-time OOM.
    return 2 * (streamed + resident) * itemsize


def _conv_flat_pallas(spec: FlatSpec, relu: bool, x, w_mat, scale, offset,
                      residual):
    """Banded-streaming kernel: VMEM residency is O(mb * C) regardless of
    image size. Each output band j reads only x bands j-1/j/j+1 (the tap
    window spans [p0 - lead, p0 + mb + lead) and lead <= mb by
    construction), fetched via clamped block index maps so pallas'
    automatic pipeline still prefetches; the window is assembled with
    STATIC slices because every tap offset is a compile-time constant."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, rows, c = x.shape
    k2c, cout = w_mat.shape
    k2 = k2c // c
    k = int(round(k2 ** 0.5))
    assert k * k == k2 and rows == spec.rows
    offs = _tap_offsets(spec, k)
    mb, wp, hp, r = spec.mb, spec.wp, spec.hp, spec.r
    qb = spec.qb or mb
    assert mb % qb == 0 and qb >= spec.lead
    d = mb // qb
    nb = spec.nb_pix + 2
    nq = nb * d  # total qb-granularity blocks
    has_res = residual is not None
    im2col = _use_im2col(k2, c)
    halo = k2 > 1  # k=1 taps only read the band itself

    def kernel(*refs):
        if im2col:
            patch_ref = refs[-1]
            refs = refs[:-1]
        if has_res:
            res_ref, o_ref = refs[-2:]
        else:
            o_ref = refs[-1]
        if halo:
            xp_ref, xc_ref, xn_ref = refs[:3]
        else:
            xc_ref = refs[0]
        w_ref, sc_ref, of_ref = refs[3 if halo else 1:][:3]
        band = pl.program_id(1)
        guard = (band == 0) | (band == nb - 1)

        @pl.when(guard)
        def _():
            o_ref[0] = jnp.zeros((mb, cout), o_ref.dtype)

        @pl.when(jnp.logical_not(guard))
        def _():
            p0 = band * mb
            if k2 == 1:
                acc = jnp.dot(xc_ref[0], w_ref[:],
                              preferred_element_type=jnp.float32)
            else:
                # window rows [p0 - qb, p0 + mb + qb); tap off reads
                # window rows [qb + off, qb + mb + off) — static slices
                win = jnp.concatenate([xp_ref[0], xc_ref[0], xn_ref[0]],
                                      axis=0)
                if im2col:
                    for t, off in enumerate(offs):
                        patch_ref[:, t * c:(t + 1) * c] = \
                            win[qb + off:qb + mb + off]
                    acc = jnp.dot(patch_ref[:], w_ref[:],
                                  preferred_element_type=jnp.float32)
                else:
                    acc = jnp.zeros((mb, cout), jnp.float32)
                    for t, off in enumerate(offs):
                        acc += jnp.dot(win[qb + off:qb + mb + off],
                                       w_ref[t * c:(t + 1) * c, :],
                                       preferred_element_type=jnp.float32)
            acc = acc * sc_ref[:] + of_ref[:]
            if has_res:
                acc = acc + res_ref[0].astype(jnp.float32)
            if relu:
                acc = jnp.maximum(acc, 0.0)
            if _SKIP_MASK:  # timing probe only (wrong ring-row numerics)
                o_ref[0] = acc.astype(o_ref.dtype)
            else:
                i = jax.lax.broadcasted_iota(jnp.int32, (mb, 1), 0) + p0
                p = i - mb
                pc = jnp.maximum(p, 0)
                hh, ww = pc // wp, pc % wp
                valid = ((p >= 0) & (hh >= r) & (hh < hp - r)
                         & (ww >= r) & (ww < wp - r))
                o_ref[0] = jnp.where(valid, acc, 0.0).astype(o_ref.dtype)

    # prev halo = tail qb rows of band j-1 (qb-block d*j - 1); next halo
    # = head qb rows of band j+1 (qb-block d*(j+1)); clamped fetches at
    # the guard bands are unused
    in_specs = [pl.BlockSpec((1, mb, c), lambda i, j: (i, j, 0))]
    if halo:
        in_specs = [
            pl.BlockSpec((1, qb, c),
                         lambda i, j: (i, jnp.maximum(d * j - 1, 0), 0)),
            pl.BlockSpec((1, mb, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, qb, c),
                         lambda i, j: (i, jnp.minimum(d * (j + 1),
                                                      nq - 1), 0)),
        ]
    in_specs += [
        pl.BlockSpec((k2c, cout), lambda i, j: (0, 0)),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
    ]
    args = ([x] * (3 if halo else 1)) + [
        w_mat.astype(x.dtype), scale.reshape(1, cout),
        offset.reshape(1, cout)]
    if has_res:
        in_specs.append(pl.BlockSpec((1, mb, cout), lambda i, j: (i, j, 0)))
        args.append(residual)
    scratch = []
    if im2col:
        scratch.append(pltpu.VMEM((mb, k2c), x.dtype))
    flops = 2 * b * spec.nb_pix * mb * k2c * cout
    return pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, mb, cout), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, cout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_DIM_SEMANTICS),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size * (d + 2) // d if halo else x.size)
            * x.dtype.itemsize
            + b * rows * cout * x.dtype.itemsize * (2 if has_res else 1),
            transcendentals=0),
        interpret=_INTERPRET,
    )(*args)


# SPMD variants (one per arity — custom_partitioning needs a fixed operand
# list, and `residual` is optional): identical kernel, partitionable along
# batch; rows/channels are need-replication factors (ops/spmd.py).
def _conv_flat_pallas_res(spec, relu, x, w_mat, scale, offset, residual):
    return _conv_flat_pallas(spec, relu, x, w_mat, scale, offset, residual)


def _conv_flat_pallas_nores(spec, relu, x, w_mat, scale, offset):
    return _conv_flat_pallas(spec, relu, x, w_mat, scale, offset, None)


from tunevlseg_tpu.ops.spmd import partitioned_kernel  # noqa: E402

_conv_spmd_res = partitioned_kernel(
    _conv_flat_pallas_res,
    in_mappings=(("b", "m", "c"), ("kc", "o"), ("o",), ("o",),
                 ("b", "m", "o")),
    out_mappings=(("b", "m", "o"),),
    shardable=("b",), static_argnums=(0, 1))

_conv_spmd_nores = partitioned_kernel(
    _conv_flat_pallas_nores,
    in_mappings=(("b", "m", "c"), ("kc", "o"), ("o",), ("o",)),
    out_mappings=(("b", "m", "o"),),
    shardable=("b",), static_argnums=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_flat_p(spec: FlatSpec, relu: bool, x, w_mat, scale, offset,
                 residual):
    # Off-TPU (CPU tests, the 8-device CPU mesh dryrun) the jnp reference
    # path runs instead of the kernel unless interpret mode is forced —
    # same contract as ops/flash_attention.py's dispatch.
    if not _INTERPRET and jax.default_backend() != "tpu":
        return _conv_flat_ref(spec, relu, x, w_mat, scale, offset, residual)
    try:
        need = _kernel_vmem_bytes(spec, x.shape[-1], w_mat.shape[0],
                                  w_mat.shape[1], x.dtype.itemsize,
                                  residual is not None)
        if need > _VMEM_BUDGET:
            raise ValueError(
                f"flat conv needs ~{need >> 20}MB VMEM "
                f"(> {_VMEM_BUDGET >> 20}MB budget) at spec={spec}")
        if jax.device_count() > 1:
            from tunevlseg_tpu.ops.spmd import require_spmd_kernels
            require_spmd_kernels("flat conv kernel")
            if residual is None:
                return _conv_spmd_nores(spec, relu, x, w_mat, scale, offset)
            return _conv_spmd_res(spec, relu, x, w_mat, scale, offset,
                                  residual)
        return _conv_flat_pallas(spec, relu, x, w_mat, scale, offset,
                                 residual)
    except Exception as e:
        if _strict():
            raise
        # loud, once per process: the jnp fallback is SLOWER than leaving
        # TUNEVLSEG_PALLAS_CONV unset, so a silent swap poisons A/Bs
        # (CLAUDE.md r4: the silent-variant-flip failure mode)
        global _WARNED_FALLBACK
        if not _WARNED_FALLBACK:
            _WARNED_FALLBACK = True
            import logging
            logging.getLogger(__name__).warning(
                "flat conv kernel unavailable (%s: %s) — falling back to "
                "the slow jnp formulation; unset TUNEVLSEG_PALLAS_CONV or "
                "set TUNEVLSEG_PCONV=strict to make this an error",
                type(e).__name__, e)
        return _conv_flat_ref(spec, relu, x, w_mat, scale, offset, residual)


def _valid_rows(spec: FlatSpec) -> jnp.ndarray:
    """(ROWS,) f32 mask of pixel rows (guards and the r-ring are 0)."""
    p = jnp.arange(spec.rows) - spec.mb
    pc = jnp.maximum(p, 0)
    hh, ww = pc // spec.wp, pc % spec.wp
    r = spec.r
    return (((p >= 0) & (hh >= r) & (hh < spec.hp - r)
             & (ww >= r) & (ww < spec.wp - r))).astype(jnp.float32)


def _conv_flat_fwd(spec, relu, x, w_mat, scale, offset, residual):
    out = _conv_flat_p(spec, relu, x, w_mat, scale, offset, residual)
    return out, (x, w_mat, scale, offset, residual, out)


def _conv_flat_bwd(spec, relu, res, g):
    """Analytic VJP — the transpose of a flat conv is a flat conv:

      dx  = flat_conv(dy * scale, W')         W'[t'] = W[k2-1-t']^T, since
                                              the tap offsets negate under
                                              index reversal — runs through
                                              the SAME Pallas kernel;
      dWt_t = x_shift(t)^T @ dy               k^2 GEMMs whose contraction
                                              is B*ROWS (MXU-deep);
      dW = dWt * scale;  dscale = sum_{t,c} W * dWt  (exact for scale==0,
      no division, no forward recompute);  doffset/dres = dy.

    dy is masked by the relu state (out > 0; exact ties at 0 take the
    0-branch, a measure-zero deviation from jnp.maximum's tie rule) and by
    the row-validity mask, mirroring the forward's forced-zero pads."""
    x, w_mat, scale, offset, residual, out = res
    c = x.shape[-1]
    k2c, cout = w_mat.shape
    k2 = k2c // c
    k = int(round(k2 ** 0.5))
    if relu:
        dy = g.astype(jnp.float32) * (out > 0)
    else:
        dy = g.astype(jnp.float32) * _valid_rows(spec)[None, :, None]
    dys = dy * scale[None, None]

    # dx: flipped-transposed weight through the kernel (W' is (k2*O, C))
    w_flip = jnp.concatenate(
        [w_mat[(k2 - 1 - t) * c:(k2 - t) * c, :].T for t in range(k2)], 0)
    dx = _conv_flat_p(spec, False, dys.astype(x.dtype),
                      w_flip.astype(jnp.float32),
                      jnp.ones((c,), jnp.float32),
                      jnp.zeros((c,), jnp.float32), None).astype(x.dtype)

    # dW: per-tap contraction over every (batch, row) pair, against the
    # UNSCALED dy (dwt) — then dw = dwt * scale, and d_scale contracts
    # dwt with the weight itself: d_scale_o = sum dy*acc
    # = sum_{t,c} w[tc,o] * dwt[tc,o]. Exact for any scale (incl. 0),
    # no division by scale, no forward recompute.
    lead = spec.lead
    xg = jnp.pad(x, ((0, 0), (lead, lead), (0, 0)))
    dwt = jnp.concatenate([
        jnp.einsum("bmc,bmo->co",
                   jax.lax.dynamic_slice_in_dim(xg, lead + off, spec.rows, 1),
                   dy, preferred_element_type=jnp.float32)
        for off in _tap_offsets(spec, k)], 0)
    dw = (dwt * scale[None, :]).astype(w_mat.dtype)
    d_scale = jnp.einsum("ko,ko->o", w_mat.astype(jnp.float32), dwt,
                         preferred_element_type=jnp.float32)
    d_offset = jnp.sum(dy, axis=(0, 1))
    d_res = dy.astype(residual.dtype) if residual is not None else None
    return dx, dw, d_scale, d_offset, d_res


_conv_flat_p.defvjp(_conv_flat_fwd, _conv_flat_bwd)


def conv_flat(flat: jnp.ndarray, spec: FlatSpec, weight_oihw: jnp.ndarray,
              scale: Optional[jnp.ndarray] = None,
              offset: Optional[jnp.ndarray] = None,
              relu: bool = False,
              residual: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stride-1 'same' conv in flat space with a fused
    (scale * conv + offset [+ residual]) [ReLU] epilogue.

    weight_oihw: torch-layout (O, I, k, k), k odd, k//2 <= spec.r.
    scale/offset: per-channel f32 (fold a frozen BatchNorm or a bias here);
    residual: another flat (B, ROWS, O) array added before the ReLU.

    Gradient contract: the VJP zeroes dL/dx at the guard/ring rows (the
    forward forces those OUTPUT rows to zero, and its boundary-row taps
    genuinely read the ring, so the true ring cotangent is non-zero).
    This is exact for inputs produced by flat_begin or a previous
    conv_flat — their ring rows are forced constants whose cotangents
    are discarded anyway — which is every supported chaining; do not
    differentiate w.r.t. a hand-built flat tensor whose ring rows carry
    trainable-dependent values.
    """
    o, i, kh, kw = weight_oihw.shape
    assert kh == kw and kh % 2 == 1 and kh // 2 <= spec.r
    assert flat.shape[-1] == i and flat.shape[1] == spec.rows
    w_mat = jnp.transpose(weight_oihw, (2, 3, 1, 0)).reshape(kh * kw * i, o)
    if scale is None:
        scale = jnp.ones((o,), jnp.float32)
    if offset is None:
        offset = jnp.zeros((o,), jnp.float32)
    return _conv_flat_p(spec, relu, flat, w_mat,
                        scale.astype(jnp.float32),
                        offset.astype(jnp.float32), residual)


def conv2d_same_pallas(x: jnp.ndarray, weight_oihw: jnp.ndarray,
                       scale=None, offset=None, relu: bool = False,
                       layout: str = "nhwc",
                       spec: Optional[FlatSpec] = None) -> jnp.ndarray:
    """Single-conv convenience wrapper (used by micro benches and as the
    one-off entry point): flat_begin -> conv_flat -> flat_end."""
    if layout == "nchw":
        x = x.transpose(0, 2, 3, 1)
    b, h, w, c = x.shape
    k = weight_oihw.shape[2]
    if spec is None:
        spec = make_flat_spec(h, w, k // 2,
                              max_k2c=k * k * c, itemsize=x.dtype.itemsize)
    out = flat_end(conv_flat(flat_begin(x, spec), spec, weight_oihw,
                             scale, offset, relu), spec)
    if layout == "nchw":
        out = out.transpose(0, 3, 1, 2)
    return out
