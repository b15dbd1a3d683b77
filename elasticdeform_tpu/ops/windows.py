"""Window-gather resampling: the TPU fast path.

Why: XLA's TPU lowering of arbitrary *element* gathers is a scalar loop
(measured ~0.1 G elem/s on v5e), while gathers of contiguous *rows* with a
128-lane minor dimension run at ~0.1-1.4 G rows/s (~100 M rows/s sustained
from multi-GB tables, invariant to index order — a descriptor-rate limit).
The per-voxel ``(order+1)^naxis`` element gathers of the straightforward
formulation (ops/resample.py) are therefore replaced by ONE row gather per
output voxel:

1. **Overlapping window table.** The (mirror-padded) input is expanded into
   a table whose rows are overlapping axis-aligned windows of shape
   ``a = (a_0, ..)`` with strides ``s = (s_0, ..)``, ``prod(a) = 128``
   lanes. Choosing ``a_h >= s_h + order`` guarantees that the full
   ``(order+1)``-tap interpolation stencil of ANY coordinate lies inside a
   single window: the window index is ``t_h = i_h // s_h`` and the stencil
   offset ``o_h = i_h mod s_h`` satisfies ``o_h + order <= a_h - 1``.
   The table costs ``prod(a_h / s_h)`` x the input in HBM (e.g. ~26x for 3D
   order-3) and is built by a one-hot grouped conv (im2col on the MXU) —
   pure streaming writes.

2. **One row gather per voxel** fetches the 128-lane window containing the
   whole stencil.

3. **Weighted lane reduction.** The separable spline weights are scattered
   into a 128-lane mask vector per voxel (outer product of per-axis
   shifted weight vectors, built with iota comparisons on the VPU) and the
   output is ``sum(row * wrow)`` — all fused elementwise work.

The computation is tap-for-tap identical to the reference semantics
(reference deform.c:818-901); only the memory layout differs. The table
build + gather run as ONE ``custom_vjp`` op (:func:`_windows_op`) whose
hand-written backward scatters cotangent rows per sample group and
immediately folds each group's block onto the padded volume (a lane-space
one-hot matmul, :func:`_fold_table_v2`) — XLA's own transposes of these
programs were measured 3-20x slower (transposed grouped convs,
scan-carried table accumulation), and fusing the stages avoids ever
materializing the multi-GB table cotangent.

For orders/naxis where 128 lanes cannot cover the full stencil
(order >= 4 in 3D, naxis >= 4), leading axes fall back to a short static
loop of ``order+1`` row gathers.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from elasticdeform_tpu.ops.bspline import filter_start, spline_weights
from elasticdeform_tpu.ops.modes import mirror_index_np

LANES = 128


# 3-D order<=3 window geometry, all measured END-TO-END on v5e:
#   '448' = (4,4,8)/(1,1,5): 128-lane rows, 26x table expansion;
#   '555' = (5,5,5)/(2,2,2): 125-lane rows, 1.6x smaller table — LOSES
#     on the 64x 64^3 fwd+grad pair (381 vs 363 ms: the smaller table
#     does not speed the RMW-bound scatter, 125-lane rows gather slower);
#   '888' = (8,8,8)/(5,5,5): 512-lane rows, only 4.1x expansion — wins
#     when the 448 table would be HBM-resident (gathers from <= ~48 MiB
#     operands are VMEM-staged at ~3x the rate): single 128^3 crop
#     forward 44.9 vs 32.7 Mvox/s (r3 campaign5); LOSES on 64^3 pair
#     configs whose 448 table already fits the cap (c4 15 vs 25).
#   'auto' (default): 448 unless the per-sample 448 table exceeds
#     _gather_slice_bytes() and 888's is smaller (needs deform_size).
# Read at call time so A/B runs and tests can flip it per trace.
def _plan3d():
    return os.environ.get("ELASTICDEFORM_TPU_PLAN3D", "auto")


def _table_bytes(deform_size, widths, order):
    """Per-sample window-table bytes for a candidate all-windowed plan."""
    pad = order // 2 + 1  # == resample.pad_amount(order)
    rows = 1
    for k, w in enumerate(widths):
        padded = deform_size[k] + 2 * pad + w
        rows *= (padded - w) // max(w - order, 1) + 1
    return rows * math.prod(widths) * 4


# 2-D order<=3 window geometry: '816' = (8,16)/(5,13) (2.0x table
# expansion) vs '432' = (4,32)/(1,29) (4.4x). The (8,16) plan maximizes
# prod(strides) = prod(widths - order) under prod(widths) <= 128, halving
# the table build — the dominant stage of the small-2D forward; the row
# gather is 128 lanes either way. Default measured on v5e (r3): see
# bench_artifacts/stages_c1_*.json.
def _plan2d():
    return os.environ.get("ELASTICDEFORM_TPU_PLAN2D", "816")


def window_plan(naxis: int, order: int, deform_size=None):
    """Choose window widths/strides and which leading axes loop.

    Returns ``(n_lead, widths, strides)`` where the first ``n_lead`` axes
    are handled by a static (order+1)-tap loop of row gathers and the
    remaining axes are covered by one window of ``prod(widths) <= 128``
    lanes (512 for the big-volume 3-D plan). Constraint per windowed axis:
    ``widths[h] >= strides[h] + order``.

    ``deform_size`` (optional, static): per-sample extent over the deformed
    axes; lets the 3-D 'auto' geometry pick the low-expansion 512-lane plan
    when the default plan's table would blow the VMEM gather-staging cap.
    Callers that pre-pad for a plan must pass the SAME ``deform_size`` they
    padded for (or an explicit ``plan``) downstream.
    """
    def strides_for(widths):
        return tuple(max(w - order, 1) for w in widths)

    if naxis == 1:
        widths = (LANES,)
    elif naxis == 2:
        if order <= 3:
            widths = (4, 32) if _plan2d() == "432" else (8, 16)
        else:
            widths = (8, 16)
    elif naxis == 3:
        if order <= 3:
            p3 = _plan3d()
            if p3 == "555":
                widths = (5, 5, 5)
            elif p3 == "888":
                widths = (8, 8, 8)
            elif p3 == "448":
                widths = (4, 4, 8)
            else:   # auto — see the _plan3d() comment for the measurements
                widths = (4, 4, 8)
                if deform_size is not None:
                    b448 = _table_bytes(deform_size, widths, order)
                    b888 = _table_bytes(deform_size, (8, 8, 8), order)
                    if b448 > _gather_slice_bytes() and b888 < b448:
                        widths = (8, 8, 8)
        else:
            # 128 lanes cannot cover a 3-axis stencil of width 5/6:
            # loop over axis 0, window the last two axes
            return 1, (8, 16), strides_for((8, 16))
    else:
        # window the last three axes (or two for high order), loop the rest
        n_lead, widths, strides = window_plan(
            3, order, None if deform_size is None else deform_size[-3:])
        return naxis - 3 + n_lead, widths, strides
    if any(w < order + 1 for w in widths):
        return None  # cannot serve this config
    return 0, widths, strides_for(widths)


_CONV_SPECS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}

# The one-hot contractions need exact f32 products, which XLA's HIGHEST
# precision provides as SIX bf16 MXU passes. Because a 0/1 matrix is
# exactly representable in bf16, the same result needs only THREE for the
# table-build conv: split x = hi + mid + lo into bf16 parts
# (each remainder is exact in f32 and the final remainder fits bf16's
# 8-bit mantissa for normal-range data), contract each part at DEFAULT
# precision with f32 accumulation, and sum — per output element the three
# partial picks add back to x exactly (the pairwise f32 sums are exact
# because x itself is f32-representable). Verified bit-identical on random
# f32; the only divergence is at f32-subnormal residuals (~1e-45 absolute)
# and |x| > bf16_max/2 ~ 1.7e38 — set ELASTICDEFORM_TPU_ONEHOT_BF16X3=0 to
# fall back to HIGHEST, or =1 to force it on CPU too (where bf16 is
# emulated and the trick only helps for differential testing).
# ORDERING ASSUMPTION: per output element the three partial picks must be
# accumulated in an order where hi meets mid (or lo meets mid) before the
# extremes meet — hi+lo first can need >24 mantissa bits and round 1 ulp.
# XLA does not *guarantee* channel accumulation order, so bit-exactness is
# empirical per backend/version; test_onehot_bf16x3_matches_highest
# asserts it and will catch an ordering change.
_BF16X3 = os.environ.get("ELASTICDEFORM_TPU_ONEHOT_BF16X3", "auto")


@functools.lru_cache(maxsize=1)
def _default_platform():
    return jax.devices()[0].platform


# below this many conv-input elements the 3-pass build loses: the split's
# extra kernels cost more than HIGHEST's in-pipeline passes on tiny convs
# (measured on v5e: 200x300 2D build 0.77 ms HIGHEST vs 0.99 bf16x3; the
# single 128^3 crop config is already bf16x3 territory — c3 29.6 vs 25.4
# Mvox/s, r3 campaign3 — and 64x 64^3 builds 18 ms bf16x3 vs 27 HIGHEST)
_BF16X3_MIN_ELEMS = int(os.environ.get(
    "ELASTICDEFORM_TPU_BF16X3_MIN_ELEMS", str(1 << 21)))


def _use_bf16x3(dtype, elems=None) -> bool:
    if dtype != jnp.float32 or _BF16X3 == "0":
        return False
    if _BF16X3 == "1":
        return True
    if elems is not None and elems < _BF16X3_MIN_ELEMS:
        return False
    return _default_platform() != "cpu"


# Opt-in: run the backward FOLD contractions (gradient-only path) with the
# BF16_BF16_F32_X3 dot algorithm — 3 MXU passes instead of HIGHEST's 6 at
# ~2^-17 relative error on the input-gradient (the forward/parity path is
# unaffected). MEASURED on v5e (r3, bench_artifacts/stages_448_foldx3
# .json): fold 26 -> 14.4 ms, 64x 64^3 pair 363 -> 351 ms (+3.4%).
# Deliberately OFF by default: the exact analytic adjoint (<Ax,y> ==
# <x,A'y> to 1e-12) is a library contract, and +3.4% does not buy its
# loss. Set ELASTICDEFORM_TPU_FOLD_X3=1 for the fast approximate
# input-gradient when ~1e-5 relative error is acceptable.
_FOLD_X3 = os.environ.get("ELASTICDEFORM_TPU_FOLD_X3", "0") == "1"


def _fold_precision(dtype):
    if _FOLD_X3 and dtype == jnp.float32 and _default_platform() != "cpu":
        return jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    return jax.lax.Precision.HIGHEST


def _split_bf16x3(x):
    """Split f32 ``x`` into three bf16 parts with ``hi+mid+lo == x``.

    The rounding MUST go through ``lax.reduce_precision``: writing it as
    ``x - x.astype(bf16).astype(f32)`` lets XLA's excess-precision pass
    elide the bf16 round-trip on TPU, collapsing the residuals to zero —
    the "exact" 3-pass build then silently computes with ``bf16(x)`` alone
    (measured 2^-9 output error; caught by a TPU-vs-reference differential
    run). ``reduce_precision(x, 8, 7)`` is bf16 round-to-nearest-even in
    f32 representation and is never elided; the subsequent casts are exact
    because each part is bf16-representable by construction.
    """
    hi = jax.lax.reduce_precision(x, 8, 7)
    r1 = x - hi
    mid = jax.lax.reduce_precision(r1, 8, 7)
    r2 = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def _onehot_contract(x, M, axes_x, axes_m):
    """``tensordot(x, M)`` where ``M`` is a one-hot (0/1) matrix.

    Contracts at HIGHEST precision (or the X3 algorithm when _FOLD_X3 is
    on). A materialized bf16x3 split of ``x`` was measured SLOWER here than
    HIGHEST's in-pipeline 6 bf16 passes — the fold's big operand is the one
    being split, and the three part arrays cost more HBM traffic than the
    extra MXU passes. The split only wins in :func:`_build_table_impl`,
    whose output dwarfs its input.
    """
    return jnp.tensordot(x, jnp.asarray(M, x.dtype),
                         axes=[axes_x, axes_m],
                         precision=_fold_precision(x.dtype))


@functools.lru_cache(maxsize=None)
def _patch_kernel(widths, channels, dtype_name):
    """One-hot grouped-conv kernel (*widths, 1, C*lanes): group c's output
    lane ``u`` copies input channel ``c`` at in-window offset ``u``."""
    lanes = math.prod(widths)
    k = np.zeros((*widths, 1, channels * lanes), dtype=dtype_name)
    for u, offsets in enumerate(np.ndindex(*widths)):
        for c in range(channels):
            k[(*offsets, 0, c * lanes + u)] = 1
    return k


@functools.lru_cache(maxsize=None)
def _fold_matrix(P: int, T: int, a: int, s: int, dtype_name: str):
    """(P, T, a) 0/1 fold tensor: entry 1 iff window t covers p at offset u
    (``t*s + u == p``) — the adjoint of patch extraction as a contraction."""
    A = np.zeros((P, T, a), dtype=dtype_name)
    for t in range(T):
        base = t * s
        top = min(a, P - base)
        for u in range(top):
            A[base + u, t, u] = 1
    return A


@functools.lru_cache(maxsize=None)
def _zfold_band_matrix(nt: int, widths, stride: int, W: int, delta: int,
                       p_cap: int, dtype_name: str):
    """One band block of the z-fold: (nt*lanes, a_rest*W).

    Entry 1 iff ``t_rel*stride + u_z - delta == p_rel`` with
    ``0 <= p_rel < min(W, p_cap)`` (``delta = band_start - t_lo*stride``
    aligns the band's absolute positions; ``p_cap`` trims positions past
    the volume in the last band).
    """
    lanes = math.prod(widths)
    a_z = widths[-1]
    a_rest = lanes // a_z
    M = np.zeros((nt * lanes, a_rest * W), dtype=dtype_name)
    for t in range(nt):
        for ur in range(a_rest):
            for uz in range(a_z):
                p = t * stride + uz - delta
                if 0 <= p < min(W, p_cap):
                    M[t * lanes + ur * a_z + uz, ur * W + p] = 1
    return M


def _zfold_apply(z2, T_z, widths, stride, P_z, dtn):
    """Fold the last windowed axis of ``z2`` (rows, T_z*lanes) -> rows of
    (a_rest * P_z), via one one-hot matmul — banded when the band
    decomposition saves enough MXU work.

    The full matrix contracts T_z*lanes features per output though each
    output position receives from at most ceil(a_z/stride) windows; bands
    of width ``2*stride`` only touch their ~``(2*stride + a_z)/stride``
    contributing windows (0.30x the flops for the 3D order-3 plan). Band
    inputs are lane-aligned static slices and outputs assemble by a plain
    concat, so no relayout is introduced.
    """
    lanes = math.prod(widths)
    a_z = widths[-1]
    a_rest = lanes // a_z
    W = 2 * stride
    nt = min(T_z, (W + a_z - 2) // stride + 1)
    nbands = -(-P_z // W)
    ratio = (nbands * nt * W) / (T_z * P_z)
    if ratio >= 0.7 or nbands <= 1:
        Fz = _zfold_matrix(T_z, tuple(widths), stride, P_z, dtn)
        return _onehot_contract(z2, Fz, [1], [0]), P_z
    outs = []
    for c in range(nbands):
        t_lo = max(0, min(T_z - nt, -(-(c * W - (a_z - 1)) // stride)))
        delta = c * W - t_lo * stride
        p_cap = P_z - c * W
        Mb = jnp.asarray(_zfold_band_matrix(
            nt, tuple(widths), stride, W, delta, p_cap, dtn), z2.dtype)
        part = jnp.dot(z2[:, t_lo * lanes:(t_lo + nt) * lanes], Mb,
                       precision=_fold_precision(z2.dtype))
        outs.append(part.reshape(-1, a_rest, W))
    z = jnp.concatenate(outs, axis=-1)[..., :P_z]
    return z.reshape(z2.shape[0], a_rest * P_z), P_z


@functools.lru_cache(maxsize=None)
def _zfold_matrix(T: int, widths, stride: int, P: int, dtype_name: str):
    """One-hot matrix folding the LAST windowed axis in lane space.

    Input features: ``(t_z, u_0, .., u_z)`` = ``T * prod(widths)``; output
    features: ``(u_0, .., u_{z-1}, p_z)`` = ``prod(widths[:-1]) * P``; entry
    1 iff ``t_z * stride + u_z == p_z``. Contracting with it keeps the
    minor dimension wide (``P`` lanes) instead of exposing the tiny window
    dims — the (8, 128) tile layout would pad those ~10x.
    """
    lanes = math.prod(widths)
    a_z = widths[-1]
    a_rest = lanes // a_z
    M = np.zeros((T * lanes, a_rest * P), dtype=dtype_name)
    for t in range(T):
        for ur in range(a_rest):
            for uz in range(a_z):
                p = t * stride + uz
                if p < P:
                    M[t * lanes + ur * a_z + uz, ur * P + p] = 1
    return M


def _fold_table_v2(ct, spatial, widths, strides, n_lead, channels, nbatch,
                   batched):
    """Fold table-row cotangents back onto the padded volume (overlap-add).

    Same contraction as :func:`_fold_table` but the last windowed axis is
    folded FIRST by a single one-hot matmul over the lane dimension
    (:func:`_zfold_matrix`) — all intermediates keep a wide minor dim, which
    the tile layout handles ~4x better than the window-dim reshapes of the
    original formulation (measured 141 -> ~35 ms on the 64x 64^3 batch).
    """
    naxis = len(spatial)
    nw = naxis - n_lead
    counts = [(spatial[n_lead + k] - widths[k]) // strides[k] + 1
              for k in range(nw)]
    lead = math.prod(spatial[:n_lead]) if n_lead else 1
    BL = nbatch * lead
    dt = ct.dtype.name
    lanes = math.prod(widths)
    P_z = spatial[-1]
    T_z = counts[-1]
    a_rest = lanes // widths[-1]

    # --- fold the last windowed axis in lane space (one-hot matmuls) ---
    z = ct.reshape(BL * math.prod(counts[:-1]), T_z, channels, lanes)
    if channels > 1:
        z = jnp.swapaxes(z, 1, 2)  # (.., C, T_z, lanes)
    z = z.reshape(-1, T_z * lanes)
    z, _ = _zfold_apply(z, T_z, tuple(widths), strides[-1], P_z, dt)
    # (BL, T_0.., T_{nw-2}, C, a_0.., a_{nw-2}, P_z)
    z = z.reshape(BL, *counts[:-1], channels, *widths[:-1], P_z)

    # --- remaining windowed axes: per-axis contractions, P_z stays minor ---
    # at step k dims are [BL, T_k..T_{nw-2}, C, a_k..a_{nw-2}, P_z,
    # P_0..P_{k-1}]; count axis is 1, width axis is (nw-1-k) + 2
    for k in range(nw - 1):
        A = _fold_matrix(spatial[n_lead + k], counts[k],
                         widths[k], strides[k], dt)
        z = _onehot_contract(z, A, [1, nw - 1 - k + 2], [1, 2])
    # z: (BL, C, P_z, P_{n_lead}..P_{naxis-2}) -> (B?, *spatial, C)
    z = jnp.moveaxis(z, 1, -1)            # channels last
    z = jnp.moveaxis(z, 1, naxis - n_lead)  # P_z to its spatial slot
    if batched:
        return z.reshape(nbatch, *spatial, channels)
    return z.reshape(*spatial, channels)


def _fold_table(ct, spatial, widths, strides, n_lead, channels, nbatch,
                batched):
    """Adjoint of the window-table build: overlap-add the cotangent rows
    back onto the padded volume, as per-axis matmul contractions.

    XLA's autodiff of the one-hot grouped conv lowers to an lhs-dilated
    transposed conv measured at ~280 ms / 64x 64^3 batch; this contraction
    chain does the same fold in ~108 ms on the MXU.
    """
    naxis = len(spatial)
    nw = naxis - n_lead
    counts = [(spatial[n_lead + k] - widths[k]) // strides[k] + 1
              for k in range(nw)]
    lead = math.prod(spatial[:n_lead]) if n_lead else 1
    BL = nbatch * lead
    dt = ct.dtype.name
    z = ct.reshape(BL, *counts, channels, *widths)
    # contract (count_k, width_k) -> P_k one axis at a time; at step k the
    # dims are [BL, T_k..T_{nw-1}, C, a_k..a_{nw-1}, P_0..P_{k-1}], so the
    # count axis is 1 and the width axis is nw-k+2; tensordot appends the
    # new P axis at the end
    for k in range(nw):
        A = _fold_matrix(spatial[n_lead + k], counts[k],
                         widths[k], strides[k], dt)
        z = _onehot_contract(z, A, [1, nw - k + 2], [1, 2])
    # z: (BL, C, P_{n_lead}..P_{naxis-1}) -> (B?, *spatial, C)
    z = jnp.moveaxis(z, 1, -1)
    if batched:
        return z.reshape(nbatch, *spatial, channels)
    return z.reshape(*spatial, channels)



# Table-build implementation, all bit-identical (tested):
#   'matmul' — per-axis one-hot selection dot_generals (+ one transpose);
#   'conv'   — one-hot grouped im2col conv;
#   'concat' — copy-only slice/reshape/concat (no MXU, no bf16x3);
#   'auto'   — measured winner per geometry (the default).
# MEASURED on v5e: 2-D matmul beats conv at every size probed, 200x300
# through 2048^2 (ratio 0.64-1.0x build time, tools/probe_build2d.py;
# end-to-end c1 156 vs 138, c2 243 vs 184 Mvox/s). conv vs concat:
# conv wins (28.7 vs 33.7 ms on the 64x 64^3 batch table — XLA lowers
# the lane-space concats with relayout shuffles). 3-D assignments in
# 'auto' follow the campaign A/Bs recorded in ROADMAP.md.
def _build_mode():
    return os.environ.get("ELASTICDEFORM_TPU_BUILD", "auto")


def _concat_eligible(widths, strides, channels):
    """Copy-only build requires unit strides on the leading windowed axes
    (pure shifted views), a last-axis overlap that one neighbour chunk
    covers, and single-channel rows (channel-major lane order would need
    a minor-dim transpose)."""
    return (channels == 1
            and all(s == 1 for s in strides[:-1])
            and widths[-1] - strides[-1] <= strides[-1])


def _build_table_concat(xp, widths, strides, n_lead, batched):
    """Copy-only window-table construction.

    The overlapping windows of the LAST axis come from the stride-reshape
    trick: ``window(t) = x[s*t : s*t + w]`` is chunk ``t`` of the
    ``(T+1, s)`` reshape concatenated with the first ``w - s`` lanes of
    chunk ``t+1``. The remaining (unit-stride) windowed axes are plain
    shifted views, concatenated along the lane axis in ``_patch_kernel``'s
    ndindex order. Two concats total; every element is an exact copy.
    """
    nbatch = xp.shape[0] if batched else 1
    spatial = xp.shape[1:-1] if batched else xp.shape[:-1]
    naxis = len(spatial)
    nw = naxis - n_lead
    lanes = math.prod(widths)
    counts = [(spatial[n_lead + k] - widths[k]) // strides[k] + 1
              for k in range(nw)]
    lead_dims = spatial[:n_lead]
    batch = nbatch * max(math.prod(lead_dims), 1)
    x = xp.reshape(batch, *spatial[n_lead:])

    w_z, s_z = widths[-1], strides[-1]
    T_z = counts[-1]
    nchunk = T_z + 1
    padz = nchunk * s_z - x.shape[-1]
    pcfg = [(0, 0)] * (x.ndim - 1)
    if padz > 0:
        # pad values are never read: the last window ends at
        # (T_z-1)*s_z + w_z <= P_z
        x = jnp.pad(x, pcfg + [(0, padz)])
    elif padz < 0:
        x = x[..., :nchunk * s_z]
    xc = x.reshape(*x.shape[:-1], nchunk, s_z)
    c1 = xc[..., :T_z, :]
    if w_z > s_z:
        c2 = xc[..., 1:T_z + 1, :w_z - s_z]
        z = jnp.concatenate([c1, c2], axis=-1)   # (..., T_z, w_z)
    else:
        z = c1
    if nw == 1:
        table = z
    else:
        pieces = []
        for offs in np.ndindex(*widths[:-1]):
            idx = (slice(None),) + tuple(
                slice(o, o + counts[k]) for k, o in enumerate(offs)
            ) + (slice(None), slice(None))
            pieces.append(z[idx])
        table = jnp.concatenate(pieces, axis=-1)
    n_rows = batch * math.prod(counts)
    return (table.reshape(n_rows, lanes),
            tuple(lead_dims) + tuple(counts))


@functools.lru_cache(maxsize=None)
def _filter_expand_matrix(n: int, T: int, w: int, s: int, pad: int,
                          extra: int, order: int):
    """(n, T*w) fused prefilter + mirror-pad + window-expand matrix.

    Column ``t*w + u`` is row ``pad_idx[t*s + u]`` of the ``n x n`` spline
    prefilter matrix (identity for order <= 1): prefilter, window padding,
    and patch extraction along one axis in a single contraction. Because
    padding and expansion only SELECT rows of ``F``, every column's inner
    product is exactly the staged pipeline's computation (float64, cast at
    upload). The composition is a selection matrix iff order <= 1.
    """
    from elasticdeform_tpu.ops.prefilter import filter_matrix
    pad_idx = window_pad_indices(n, pad, extra)
    pos = (np.arange(T)[:, None] * s + np.arange(w)[None, :]).reshape(-1)
    F = filter_matrix(n, order)
    return np.ascontiguousarray(F[pad_idx[pos]].T)


@functools.lru_cache(maxsize=None)
def _expand_matrix(P: int, T: int, w: int, s: int, dtype_name: str):
    """(P, T*w) selection matrix: column ``t*w + u`` picks input ``t*s + u``.

    Each column has exactly one 1, so a HIGHEST-precision matmul with it is
    an exact copy (products are x*1; the 6-pass f32 reconstruction keeps
    the value bit-exact).
    """
    E = np.zeros((P, T * w), dtype=dtype_name)
    for t in range(T):
        for u in range(w):
            E[t * s + u, t * w + u] = 1
    return E


# cap on the selection-matmul build's intermediate arrays: each axis
# contraction multiplies the live array by that axis's expansion, so
# high-expansion plans on big volumes materialize multi-hundred-MB
# intermediates and lose to the conv (measured on v5e, 128^3 448 plan:
# 240 MB intermediates, c3 15.5 vs 32.7 Mvox/s conv; the 64^3 448 pair
# at 35 MB WINS, c4 28.3 vs 25.0)
_MM_BUILD_CAP = int(os.environ.get(
    "ELASTICDEFORM_TPU_MM_BUILD_CAP", str(1 << 26)))


def _matmul_build_eligible(xp, widths, strides, n_lead, batched) -> bool:
    """'auto' gate for the selection-matmul build (see _build_mode).

    2-D: always (wins at every probed size, tools/probe_build2d.py).
    3-D: single sample only (the batched 8-D assembly transpose hits a
    tiled-layout padded copy — 20 GB on the 64x 64^3 table) and only while
    the per-pass intermediates stay under _MM_BUILD_CAP.
    """
    nbatch = xp.shape[0] if batched else 1
    spatial = xp.shape[1:-1] if batched else xp.shape[:-1]
    C = xp.shape[-1]
    nw = len(spatial) - n_lead
    if nw == 2:
        # the per-axis (counts*w, n) selection matrix itself must stay
        # bounded: at n >= ~8K it reaches GiB scale and the conv build
        # (O(w) kernel, no n x n operand) takes over. Same BYTE units as
        # the 3-D intermediate check below, at 4x the budget (the matrix
        # is a one-shot operand, not a per-pass live intermediate): f32
        # keeps n <= ~4K eligible (the probed winners), ~8K+ falls back.
        item = np.dtype(xp.dtype).itemsize
        for k in range(nw):
            counts_k = (spatial[n_lead + k] - widths[k]) // strides[k] + 1
            mat_bytes = counts_k * widths[k] * spatial[n_lead + k] * item
            if mat_bytes > (_MM_BUILD_CAP << 2):
                return False
        return True
    if nw != 3:
        return False
    batch = nbatch * max(math.prod(spatial[:n_lead]), 1)
    if batch > 1:
        return False
    split = _use_bf16x3(xp.dtype, xp.size)
    item = 2 if split else np.dtype(xp.dtype).itemsize
    chans = C * (3 if split else 1)
    live = batch * chans * math.prod(spatial[n_lead:])
    for k in range(nw):
        counts_k = (spatial[n_lead + k] - widths[k]) // strides[k] + 1
        live = live // spatial[n_lead + k] * counts_k * widths[k]
        if live * item > _MM_BUILD_CAP:
            return False
    return True


def _build_table_matmul(xp, widths, strides, n_lead, batched, fuse=None):
    """N-D window-table build as per-axis one-hot selection matmuls.

    Each windowed axis is expanded by contracting it with a ``(P, T*w)``
    selection matrix (column ``t*w + u`` picks input ``t*s + u``); after
    all ``nw`` contractions one transpose assembles the channel-major row
    layout. Every column has exactly one 1, so each output element is a
    copy of one input element — bit-identical to the conv build (tested).

    Precision: the f32 path contracts at HIGHEST (6 bf16 MXU passes).
    Past the bf16x3 gate the input is split hi/mid/lo into 3x channels and
    every contraction runs as a single bf16 pass — selections only copy,
    and each part is bf16-representable, so the parts survive every stage
    exactly; the final ordered sum ``(hi + mid) + lo`` reconstructs f32
    exactly and fuses into the assembling transpose.

    ``fuse=(order, pad)``: ``xp`` is the RAW input; the spline prefilter
    and the window mirror-padding compose into each axis's expansion
    matrix (:func:`_filter_expand_matrix`) — the whole input side of the
    forward becomes ``nw`` matmuls + one transpose. Requires
    ``n_lead == 0``; caller gates via :func:`can_fuse_filter_build`.
    """
    nbatch = xp.shape[0] if batched else 1
    spatial = xp.shape[1:-1] if batched else xp.shape[:-1]
    C = xp.shape[-1]
    naxis = len(spatial)
    nw = naxis - n_lead
    lanes = math.prod(widths)
    if fuse is not None:
        # xp is the RAW (unfiltered, unpadded) input; each axis contracts
        # with the fused prefilter+pad+expand matrix instead
        assert n_lead == 0, "filter fusion requires all-windowed axes"
        order, pad = fuse
        counts = [(spatial[k] + 2 * pad) // strides[k] + 1
                  for k in range(nw)]
    else:
        counts = [(spatial[n_lead + k] - widths[k]) // strides[k] + 1
                  for k in range(nw)]
    lead_dims = spatial[:n_lead]
    batch = nbatch * max(math.prod(lead_dims), 1)
    x = xp.reshape(batch, *spatial[n_lead:], C)

    # the dense prefilter rows invalidate the "selections only copy"
    # argument, so the exact split only serves unfiltered fusions
    split = _use_bf16x3(x.dtype, x.size) and (fuse is None or order <= 1)
    if split:
        parts = _split_bf16x3(x)
        # part index minor within each channel: (..., C*3)
        x = jnp.stack(parts, axis=-1).reshape(*x.shape[:-1], C * 3)
        mm_kw = dict(preferred_element_type=jnp.bfloat16)
    else:
        mm_kw = dict(precision=jax.lax.Precision.HIGHEST)

    t = x
    for k in range(nw):
        # 0/1 entries are exactly representable in every dtype; numpy has
        # no bfloat16, so build f32 and cast at upload (like _patch_kernel)
        if fuse is not None:
            E_np = _filter_expand_matrix(
                spatial[k], counts[k], widths[k], strides[k], pad,
                widths[k], order).astype(
                    "float32" if split else x.dtype.name)
        else:
            E_np = _expand_matrix(spatial[n_lead + k], counts[k], widths[k],
                                  strides[k],
                                  "float32" if split else x.dtype.name)
        E = jnp.asarray(E_np, jnp.bfloat16) if split else jnp.asarray(E_np)
        # contract the current leading spatial axis (always position 1);
        # its (T_k * w_k) expansion lands as the new trailing axis, so
        # after nw passes the layout is (B, C', T1*w1, ..., Tnw*wnw)
        t = jax.lax.dot_general(t, E, (((1,), (0,)), ((), ())), **mm_kw)

    tw = sum(((counts[k], widths[k]) for k in range(nw)), ())
    if split:
        t = t.reshape(batch, C, 3, *tw)
        t = ((t[:, :, 0].astype(jnp.float32)
              + t[:, :, 1].astype(jnp.float32))
             + t[:, :, 2].astype(jnp.float32))
    else:
        t = t.reshape(batch, C, *tw)
    perm = ((0,) + tuple(2 + 2 * k for k in range(nw)) + (1,)
            + tuple(3 + 2 * k for k in range(nw)))
    table = jnp.transpose(t, perm)
    n_rows = batch * math.prod(counts)
    return (table.reshape(n_rows, C * lanes),
            tuple(lead_dims) + tuple(counts))


def can_fuse_filter_build(raw_spatial, channels, plan, pad, order,
                          compute_dtype, prefilter: bool,
                          nbatch: int = 1) -> bool:
    """May the prefilter+pad+expand chain fuse into the build matmuls?

    Requires: windows cover every axis (n_lead == 0) and the
    selection-matmul build being the auto winner for the VIRTUAL padded
    geometry (batched 3-D is not; see _matmul_build_eligible). When a
    real filter is fused (order > 1 with prefilter) the build runs dense
    HIGHEST — the bf16x3 split's exactness argument needs selections —
    but this still WINS end-to-end: on the 128^3 888-plan geometry the
    dense fused build is 2.10 ms vs 2.68 split-selection build + ~1.5 ms
    staged fused filter+pad (tools/probe_build888.py, r3).
    """
    if _build_mode() not in ("auto", "matmul"):
        return False
    if os.environ.get("ELASTICDEFORM_TPU_FUSE_BUILD", "1") == "0":
        return False   # A/B + regression escape hatch: staged pipeline
    if prefilter and order > 1:
        from elasticdeform_tpu.ops.prefilter import use_scan_filter
        if any(use_scan_filter(n, order) for n in raw_spatial):
            return False   # huge axis: scan prefilter, no dense F to fuse
    n_lead, widths, strides = plan
    if n_lead != 0:
        return False
    padded = tuple(n + 2 * pad + w for n, w in zip(raw_spatial, widths))
    batched = nbatch > 1
    shape = (nbatch, *padded, channels) if batched else (*padded, channels)
    fake = jax.ShapeDtypeStruct(shape, jnp.dtype(compute_dtype))
    return _matmul_build_eligible(fake, widths, strides, 0, batched)


def _build_table_impl(xp, widths, strides, n_lead, batched=False, fuse=None):
    """Expand padded input (*spatial, C) into the overlapping window table.

    Dispatches between the bit-identical constructions (see _build_mode):
    per-axis selection matmuls (2-D and single-sample 3-D; with ``fuse``
    the prefilter+pad compose into the matrices and ``xp`` is the raw
    input) and the one-hot grouped im2col conv (batched 3-D). Both are
    pure data movement through the MXU and beat slice-and-stack
    construction by >1000x on TPU: 128 separate strided-slice copies
    each have a unit minor dimension, which the (8, 128) tile layout
    pads 128x (measured 20 ms / 64^3 volume and a 262 GB allocation at
    batch 64); both builds emit feature-minor (..., 128)-dense rows
    directly.

    Returns (table2, table_dims) where ``table2`` is
    ``(n_rows, C * prod(widths))`` with rows laid out channel-major
    ``(C, lanes)``, and ``table_dims`` are the per-axis window counts
    (leading non-windowed axes keep their size).
    """
    nbatch = xp.shape[0] if batched else 1
    spatial = xp.shape[1:-1] if batched else xp.shape[:-1]
    C = xp.shape[-1]
    naxis = len(spatial)
    nw = naxis - n_lead
    lanes = math.prod(widths)

    if fuse is not None:
        # fused prefilter+pad+expand only exists as matmuls (gated by
        # can_fuse_filter_build at the caller)
        return _build_table_matmul(xp, widths, strides, n_lead, batched,
                                   fuse)
    mode = _build_mode()
    if mode == "concat" and _concat_eligible(widths, strides, C):
        return _build_table_concat(xp, widths, strides, n_lead, batched)
    if mode == "matmul" or (mode == "auto" and _matmul_build_eligible(
            xp, widths, strides, n_lead, batched)):
        return _build_table_matmul(xp, widths, strides, n_lead, batched)

    # window counts; every valid i_h has its window inside the (extended)
    # padded array because the caller over-pads by widths[k]
    counts = [(spatial[n_lead + k] - widths[k]) // strides[k] + 1
              for k in range(nw)]

    lead_dims = spatial[:n_lead]
    batch = nbatch * max(math.prod(lead_dims), 1)
    xin = xp.reshape(batch, *spatial[n_lead:], C)

    # small-batch convs underutilize the chip: split the first windowed
    # axis into overlapping slabs to manufacture conv batch. Slabs must
    # tile the window count exactly (K divides counts[0]) and stay tall
    # enough to keep the conv efficient (measured on a single 136^3 table:
    # K=7/slab 19 -> 9.6 ms vs K=1 -> 28.3 ms vs K=19/slab 7 -> 29.4 ms).
    K = 1
    if (batch < 16 and nw >= 2 and counts[0] >= 16
            and batch * math.prod(counts) * lanes >= (1 << 24)):
        for k in range(min(64 // batch, counts[0] // 8), 1, -1):
            if counts[0] % k == 0 and counts[0] // k >= 8:
                K = k
                break
    if K > 1:
        t0_slab = counts[0] // K
        s0, w0 = strides[0], widths[0]
        slab_in = (t0_slab - 1) * s0 + w0
        slabs = jnp.stack(
            [jax.lax.slice_in_dim(xin, k * t0_slab * s0,
                                  k * t0_slab * s0 + slab_in, axis=1)
             for k in range(K)], axis=1)
        xin = slabs.reshape(batch * K, slab_in, *xin.shape[2:])
        conv_counts = [t0_slab] + counts[1:]
    else:
        conv_counts = counts

    kernel_np = _patch_kernel(tuple(widths), C, xp.dtype.name)
    if _use_bf16x3(xin.dtype, xin.size):
        # exact f32 in 3 bf16 MXU passes instead of HIGHEST's 6: the
        # hi/mid/lo parts become 3 input channels per group and the one-hot
        # kernel is replicated over them (see _BF16X3 above)
        parts = _split_bf16x3(xin)
        xin = jnp.stack(parts, axis=-1).reshape(*xin.shape[:-1], C * 3)
        kernel = jnp.asarray(np.repeat(kernel_np, 3, axis=-2), jnp.bfloat16)
        conv_kw = dict(preferred_element_type=jnp.float32)
    else:
        # one-hot kernel => products are x*1; HIGHEST keeps them exact
        kernel = jnp.asarray(kernel_np)
        conv_kw = dict(precision=jax.lax.Precision.HIGHEST)
    dn = jax.lax.conv_dimension_numbers(xin.shape, kernel.shape,
                                        _CONV_SPECS[nw])
    out = jax.lax.conv_general_dilated(
        xin, kernel, window_strides=tuple(strides), padding="VALID",
        dimension_numbers=dn, feature_group_count=C, **conv_kw)
    assert out.shape[1:-1] == tuple(conv_counts), (out.shape, conv_counts)
    # slab rows are (batch, K, t0_slab, T1..) = (batch, T0, T1..) row-major
    n_rows = batch * math.prod(counts)
    table2 = out.reshape(n_rows, C * lanes)
    # table_dims are PER-SAMPLE; batched tables are row-major with the
    # sample index outermost, so sample b's rows start at b * prod(dims)
    return table2, tuple(lead_dims) + tuple(counts)


def _shifted_weight_vector(w_taps, offset, width, order, dtype):
    """(N, width) vector with ``w_taps[l]`` at lane ``offset + l``.

    ``w_taps``: list of (N,) arrays; ``offset``: (N,) int lanes.
    """
    n = offset.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (n, width), 1)
    off = offset[:, None]
    out = jnp.zeros((n, width), dtype=dtype)
    for l, w in enumerate(w_taps):
        out = out + jnp.where(lanes == off + l, w[:, None],
                              jnp.zeros((), dtype))
    return out


# rows per streamed chunk: bounds the live (chunk, 128) gather/weight
# intermediates. 32768 rows -> 16 MB of gathered data per sample per step
# (x batch under vmap), while each step still issues >10^4 row gathers.
_CHUNK_ROWS = int(os.environ.get("ELASTICDEFORM_TPU_CHUNK_ROWS", "32768"))

# --- per-platform defaults for the VMEM-tied caps -----------------------
# The two byte caps below were measured on TPU v5e, whose cores have
# 128 MiB of VMEM; on parts with a different VMEM size the measured
# "XLA stages gather operands in VMEM under ~64 MiB" behavior shifts
# proportionally. When the env var is unset, the default scales with the
# device generation's VMEM (same 3/8 resp. 1/2 fractions of VMEM as the
# v5e-measured values); env vars always win. CPU and unknown kinds keep
# the v5e numbers (the caps are harmless there — CPU has no VMEM).
_VMEM_MIB_BY_KIND = (
    ("v2", 16), ("v3", 16),          # 16 MiB VMEM generations
    # v4/v5/v5 lite/v6 lite (Trillium): 128 MiB-class VMEM
)


@functools.lru_cache(maxsize=1)
def _vmem_mib():
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 128
    for key, mib in _VMEM_MIB_BY_KIND:
        if key in kind and f"{key}." not in kind:
            return mib
    return 128


def _cap_bytes(env_name, vmem_fraction_num, vmem_fraction_den):
    v = os.environ.get(env_name)
    if v:
        return int(v)
    return (_vmem_mib() * vmem_fraction_num // vmem_fraction_den) << 20


@functools.lru_cache(maxsize=1)
def _gather_slice_bytes():
    """Gather-operand cap for the per-sample-group decomposition: XLA
    stages gather operands of <= ~64 MiB in VMEM and sustains ~250 M
    rows/s there, vs ~82 M rows/s for HBM-resident operands (measured on
    v5e, tools/probe_gather.py). Batched gathers therefore dynamic-slice
    the big table into per-sample-group sub-tables under this cap
    (3/8 VMEM = 48 MiB on 128-MiB parts)."""
    return _cap_bytes("ELASTICDEFORM_TPU_GATHER_SLICE_BYTES", 3, 8)


@functools.lru_cache(maxsize=1)
def _bwd_group_bytes():
    """Cap on the gathered-value buffer materialized per backward scatter
    group. Small groups win: the HBM read-modify-write of the row scatter
    is locality bound (measured on v5e, 64x 64^3: per-sample groups 265 ms
    vs 352 ms for 8-sample groups). 1/2 VMEM = 64 MiB on 128-MiB parts."""
    return _cap_bytes("ELASTICDEFORM_TPU_BWD_GROUP_BYTES", 1, 2)


class _StageParams(NamedTuple):
    """Static configuration of the gather stage (hashable for custom_vjp)."""
    order: int
    widths: tuple
    strides: tuple
    n_lead: int
    tstrides: tuple
    pad: int
    channels: int
    lane_count: int
    compute_dtype: str
    n_out_s: int           # output voxels per sample
    rows_per_sample: int
    nbatch: int            # 1 when not batched
    # opt-in fast-augmentation mode: store/gather window-table VALUES in
    # this narrower dtype ("" = compute_dtype). Halves the bytes of the
    # byte-bound gather stage at ~2^-8 relative output error; the
    # coordinates, spline weights, prefilter and adjoint stay full
    # precision
    table_dtype: str = ""


def _chunk_weights(cc, p: _StageParams, staged: bool = False):
    """Per-voxel window indices and lane weights for one flat chunk.

    Returns (row_base, wrow, lead) where ``row_base`` (M,) indexes the
    per-sample table, ``wrow`` (M, lanes) are the combined lane weights of
    the windowed axes, and ``lead`` is the per-lead-axis tap weight/stride
    info for the static tap loop. With ``staged=True``, ``wrow`` is
    instead the LIST of per-windowed-axis shifted vectors (M, widths[k])
    — their outer product is never materialized; the consumer contracts
    them axis-by-axis against the gathered rows (measured 2x on 512-lane
    plans: the (M, lanes) weight row dominates HBM traffic there).
    """
    naxis = cc.shape[-1]
    idt = jnp.int32
    starts = []
    weights = []
    for h in range(naxis):
        c = cc[:, h]
        starts.append(filter_start(c, p.order).astype(idt) + p.pad)
        weights.append([w.astype(p.compute_dtype)
                        for w in spline_weights(c, p.order)])

    row_base = None
    wrow = None
    for k, h in enumerate(range(p.n_lead, naxis)):
        i_h = starts[h]
        if p.strides[k] == 1:
            t_h, o_h = i_h, jnp.zeros_like(i_h)
        else:
            t_h = i_h // p.strides[k]
            o_h = i_h - t_h * p.strides[k]
        term = t_h * p.tstrides[h] if p.tstrides[h] != 1 else t_h
        row_base = term if row_base is None else row_base + term
        if p.order == 0:
            taps = [jnp.ones(i_h.shape, p.compute_dtype)]
        else:
            taps = weights[h]
        wv = _shifted_weight_vector(taps, o_h, p.widths[k], p.order,
                                    p.compute_dtype)
        if staged:
            wrow = (wrow or []) + [wv]
        else:
            wrow = wv if wrow is None else (
                wrow[:, :, None] * wv[:, None, :]).reshape(
                    wv.shape[0], wrow.shape[1] * wv.shape[1])
    for h in range(p.n_lead):
        row_base = row_base + starts[h] * p.tstrides[h]
    return row_base, wrow, weights


def _lead_taps(weights, p: _StageParams):
    """Static list of (tap_row_offset, tap_weight_or_None) for the leading
    (non-windowed) axes; a single (0, None) entry when there are none."""
    taps = [(0, None)]
    for h in range(p.n_lead):
        new = []
        for off, w in taps:
            for t in range(p.order + 1):
                wt = weights[h][t]
                wnew = w if p.order == 0 else (wt if w is None else w * wt)
                new.append((off + t * p.tstrides[h], wnew))
        taps = new
    return taps


def _resample_chunk(table2, cc, row_offset, p: _StageParams):
    """Resample one flat chunk of output voxels from the window table.

    128-lane plans reduce against the materialized combined weight row;
    wider plans (512-lane 3-D) contract the gathered rows one windowed
    axis at a time against the small per-axis vectors instead — half the
    stage time (HBM traffic of the (M, lanes) intermediates), at the cost
    of a different summation association (~1e-7, inside the 1e-5 parity
    contract; 128-lane plans keep the bitwise-stable joint reduce).
    """
    staged = p.lane_count > LANES
    row_base, wrow, weights = _chunk_weights(cc, p, staged=staged)
    if row_offset is not None:
        row_base = row_base + row_offset

    def gather_reduce(rows_idx, w):
        rows = jnp.take(table2, rows_idx, axis=0, mode="clip")
        if staged:
            t = rows.reshape(-1, p.channels, *p.widths)
            for k in range(len(p.widths) - 1, -1, -1):
                wv = w[k].reshape(w[k].shape[0], 1, *((1,) * k),
                                  p.widths[k])
                t = jnp.sum(t * wv, axis=2 + k)
            return t
        if p.channels == 1:
            return jnp.sum(rows * w, axis=-1, keepdims=True)
        # rows are channel-major (C, lanes) — see _build_table
        rows = rows.reshape(-1, p.channels, p.lane_count)
        return jnp.sum(rows * w[:, None, :], axis=2)

    acc = None
    for tap_off, tap_w in _lead_taps(weights, p):
        contrib = gather_reduce(row_base + tap_off if tap_off else row_base,
                                wrow)
        if tap_w is not None:
            contrib = contrib * tap_w[:, None]
        acc = contrib if acc is None else acc + contrib
    return acc


def _row_offsets(p: _StageParams):
    if p.nbatch <= 1:
        return None
    return (jax.lax.broadcasted_iota(jnp.int32, (p.nbatch, p.n_out_s), 0)
            * p.rows_per_sample).reshape(p.nbatch * p.n_out_s)


# chunk loops up to this many steps are unrolled (plain Python loop over
# static slices) instead of lowered to a lax.map while-loop: small configs
# (e.g. the 200x300 2D forward = 2 chunks) are kernel-count bound and the
# loop machinery costs more than the chunks; long streams keep lax.map so
# the program stays compact and intermediates provably bounded
_UNROLL_CHUNKS = int(os.environ.get("ELASTICDEFORM_TPU_UNROLL_CHUNKS", "4"))


def _stage_flat(table2, cc_flat, row_off, p: _StageParams):
    """Streamed gather-reduce over a flat voxel range; returns (N, C)."""
    n_out = cc_flat.shape[0]
    naxis = cc_flat.shape[-1]

    # single-sample small configs: one chunk (one gather + one fused
    # weight chain) beats two — chunking exists to bound the live
    # (chunk, lanes) intermediates under vmap, which a lone sample under
    # 2x the chunk budget does not threaten
    chunk_cap = 2 * _CHUNK_ROWS if p.nbatch <= 1 else _CHUNK_ROWS
    if n_out <= chunk_cap:
        return _resample_chunk(table2, cc_flat, row_off, p)

    n_chunks = -(-n_out // _CHUNK_ROWS)
    if n_chunks <= _UNROLL_CHUNKS:
        parts = []
        for c0 in range(0, n_out, _CHUNK_ROWS):
            c1 = min(c0 + _CHUNK_ROWS, n_out)
            off_c = None if row_off is None else row_off[c0:c1]
            parts.append(_resample_chunk(table2, cc_flat[c0:c1], off_c, p))
        return jnp.concatenate(parts, axis=0)
    n_padded = n_chunks * _CHUNK_ROWS
    extra = n_padded - n_out
    cc_p = jnp.pad(cc_flat, ((0, extra), (0, 0)))
    cc_p = cc_p.reshape(n_chunks, _CHUNK_ROWS, naxis)
    if row_off is None:
        acc = jax.lax.map(
            lambda c: _resample_chunk(table2, c, None, p), cc_p)
    else:
        off_p = jnp.pad(row_off, (0, extra)).reshape(n_chunks, _CHUNK_ROWS)
        acc = jax.lax.map(
            lambda args: _resample_chunk(table2, args[0], args[1], p),
            (cc_p, off_p))
    return acc.reshape(n_padded, p.channels)[:n_out]


def _gather_group_size(p: _StageParams, row_bytes: int):
    """Samples per gather group, or 0 to keep the flat batched gather.

    Only batched tables past the VMEM-staging cap benefit from slicing,
    and only when a single sample's sub-table still fits under the cap.
    """
    B = max(p.nbatch, 1)
    sample_bytes = p.rows_per_sample * row_bytes
    cap = _gather_slice_bytes()
    if B <= 1 or B * sample_bytes <= cap or sample_bytes > cap:
        return 0
    G = max(1, min(B, cap // sample_bytes))
    while B % G:
        G -= 1
    return G


def _stage_primal(table2, cc_flat, p: _StageParams):
    """Streamed gather-reduce over all output voxels; returns (N, C)."""
    naxis = cc_flat.shape[-1]
    B = max(p.nbatch, 1)
    G = _gather_group_size(
        p, table2.shape[-1] * table2.dtype.itemsize)
    if not G:
        return _stage_flat(table2, cc_flat, _row_offsets(p), p)

    # per-sample-group decomposition: gather each group's voxels from a
    # dynamic slice of the table so the gather operand stays VMEM-sized
    # (~3x the HBM-resident row-gather rate, see _gather_slice_bytes)
    ngroups = B // G
    group_rows = G * p.rows_per_sample
    gp = p._replace(nbatch=G)
    cc_g = cc_flat.reshape(ngroups, G * p.n_out_s, naxis)
    goff = _row_offsets(gp)

    def one(args):
        g_idx, cc_b = args
        sub = jax.lax.dynamic_slice(
            table2, (g_idx * group_rows, 0),
            (group_rows, table2.shape[-1]))
        return _stage_flat(sub, cc_b, goff, gp)

    acc = jax.lax.map(
        one, (jnp.arange(ngroups, dtype=jnp.int32), cc_g))
    return acc.reshape(B * p.n_out_s, p.channels)


def _bwd_group(p: _StageParams):
    """Samples per backward group (bounds the live scatter target)."""
    B = max(p.nbatch, 1)
    bytes_per_sample = p.n_out_s * p.channels * p.lane_count * 4
    return max(1, min(B, _bwd_group_bytes() // max(bytes_per_sample, 1)))


def _scatter_group(g_g, cc_g, p: _StageParams, gsz: int):
    """Scatter one sample group's cotangent rows into its table block.

    Per-tap scatter of ``g * lane weights``, voxel-chunked; the in-place
    at[].add chain has no scan carry, so XLA aliases the destination buffer
    across steps. Reference semantics: the scatter-add gradient loop
    deform.c:953-995.
    """
    n_s = p.n_out_s
    m_g = gsz * n_s
    # voxel chunk for the scatter-value buffers: bounds the live
    # (chunk, 128) weight/value intermediates, which matters when this
    # backward itself runs under vmap (each instance would otherwise
    # materialize its full per-sample buffer, x batch). Measured on v5e
    # (64x 64^3): 65536-row chunks 231 ms vs 309 ms for 131072.
    vchunk = 2 * _CHUNK_ROWS

    dt = jnp.zeros((gsz * p.rows_per_sample,
                    p.channels * p.lane_count), p.compute_dtype)
    for v0 in range(0, m_g, vchunk):
        v1 = min(v0 + vchunk, m_g)
        cc_c = cc_g[v0:v1]
        g_c = g_g[v0:v1]
        row_base, wrow, weights = _chunk_weights(cc_c, p)
        if gsz > 1:
            vox = jnp.arange(v0, v1, dtype=jnp.int32)
            row_base = row_base + (vox // n_s) * p.rows_per_sample
        for tap_off, tap_w in _lead_taps(weights, p):
            gv = g_c if tap_w is None else g_c * tap_w[:, None]
            if p.channels == 1:
                vals = gv * wrow
            else:
                vals = (gv[:, :, None] * wrow[:, None, :]).reshape(
                    gv.shape[0], p.channels * p.lane_count)
            idx = row_base + tap_off if tap_off else row_base
            dt = dt.at[idx].add(vals)
    return dt


def _scatter_fold(g, cc_flat, p: _StageParams, padded_spatial, batched):
    """Backward-only pipeline: scatter cotangent rows per sample group and
    immediately fold each group's table block onto the padded volume.

    Fusing the fold into the group loop keeps the table cotangent working
    set at one group (~34 MB for a 64^3 sample) instead of materializing
    the full multi-GB d_table before folding — the scatter's HBM
    read-modify-write is locality-bound (measured on v5e, 64x 64^3:
    per-sample groups 265 ms vs 352 ms for 8-sample, 1297 ms for one
    64-sample scatter).
    """
    B = max(p.nbatch, 1)
    group = _bwd_group(p)
    n_s = p.n_out_s
    parts = []
    for b0 in range(0, B, group):
        gsz = min(group, B - b0)
        sl = slice(b0 * n_s, (b0 + gsz) * n_s)
        dt_g = _scatter_group(g[sl], cc_flat[sl], p, gsz)
        parts.append(_fold_table_v2(dt_g, tuple(padded_spatial), p.widths,
                                    p.strides, p.n_lead, p.channels, gsz,
                                    batched))
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)


def _cast_table(table2, p: _StageParams):
    """Apply the opt-in narrow table dtype (fast-augmentation mode).

    XLA fuses the cast into the build's final stage, so the table is
    WRITTEN narrow and every subsequent row gather moves half the bytes;
    the weighted reduction promotes back to the compute dtype."""
    if p.table_dtype and p.table_dtype != p.compute_dtype:
        return table2.astype(p.table_dtype)
    return table2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _windows_op(xp, cc_flat, p: _StageParams, padded_spatial, batched,
                fuse=None):
    """Fused table-build + window-gather with a hand-written adjoint.

    Primal: the table build (selection matmuls or one-hot grouped im2col
    conv) followed by the streamed gather-reduce. Backward w.r.t. ``xp``:
    scatter + fold per sample group (:func:`_scatter_fold`) — XLA's own
    transposes were measured 3-20x slower (scan-carried table accumulation
    at 13 M rows/s, lhs-dilated transposed conv at 280 ms), and keeping
    the two stages in one op avoids materializing the full table cotangent
    between them. Backward w.r.t. ``cc_flat``: forward-mode through the
    differentiable spline weights on a recomputed table
    (dead-code-eliminated when displacement gradients are not requested).

    ``fuse=(order, raw_spatial)``: ``xp`` is the raw input and the
    prefilter+pad chain folds into the build (see _build_table_matmul);
    the backward then appends the per-axis fused un-pad +
    transpose-prefilter contractions after the fold.
    """
    table2, _ = _build_table_impl(xp, p.widths, p.strides, p.n_lead, batched,
                                  _op_fuse(fuse, p))
    return _stage_primal(_cast_table(table2, p), cc_flat, p)


def _op_fuse(fuse, p: _StageParams):
    return None if fuse is None else (fuse[0], p.pad)


def _windows_op_fwd(xp, cc_flat, p, padded_spatial, batched, fuse=None):
    table2, _ = _build_table_impl(xp, p.widths, p.strides, p.n_lead, batched,
                                  _op_fuse(fuse, p))
    return _stage_primal(_cast_table(table2, p), cc_flat, p), (xp, cc_flat)


def _windows_op_bwd(p, padded_spatial, batched, fuse, res, g):
    xp, cc_flat = res
    naxis = cc_flat.shape[-1]
    B = max(p.nbatch, 1)
    n_s = p.n_out_s
    group = _bwd_group(p)

    d_xp = _scatter_fold(g, cc_flat, p, padded_spatial, batched)
    if fuse is not None:
        # adjoint of the fused prefilter+pad: contract each padded axis
        # back to the raw extent with the transposed row-selected filter
        # matrix (identity rows for order <= 1)
        from elasticdeform_tpu.ops.prefilter import filter_matrix
        order, raw_spatial = fuse
        bo = 1 if batched else 0
        for d in range(naxis - 1, -1, -1):
            idx = window_pad_indices(raw_spatial[d], p.pad,
                                     p.widths[d - p.n_lead])
            Ft = filter_matrix(raw_spatial[d], order)[idx].T
            m = jnp.asarray(Ft, d_xp.dtype)
            d_xp = jnp.moveaxis(
                jnp.tensordot(m, d_xp, axes=[[1], [d + bo]],
                              precision=jax.lax.Precision.HIGHEST),
                0, d + bo)

    if os.environ.get("ELASTICDEFORM_TPU_SKIP_DCC", "0") == "1":
        # measurement-only escape hatch: skip the displacement-gradient
        # branch to quantify how much of it XLA fails to dead-code-eliminate
        return (d_xp, jnp.zeros_like(cc_flat))

    # --- d_cc: forward-mode through the weight polynomials on a recomputed
    # table (rebuild ~43 ms vs keeping a multi-GB residual; XLA eliminates
    # all of it when the caller does not use displacement gradients) ---
    table2, _ = _build_table_impl(xp, p.widths, p.strides, p.n_lead, batched,
                                  _op_fuse(fuse, p))
    table2 = _cast_table(table2, p)
    d_ccs = []
    for b0 in range(0, B, group):
        gsz = min(group, B - b0)
        sl = slice(b0 * n_s, (b0 + gsz) * n_s)
        cc_g = cc_flat[sl]
        g_g = g[sl]
        # the group's row offsets restart at 0, so slice its table rows
        # (sample b's rows start at b * rows_per_sample)
        if B > 1:
            table_g = jax.lax.slice_in_dim(
                table2, b0 * p.rows_per_sample,
                (b0 + gsz) * p.rows_per_sample, axis=0)
        else:
            table_g = table2
        dcc_cols = []
        group_p = p._replace(nbatch=gsz)
        for h in range(naxis):
            tangent = jnp.zeros_like(cc_g).at[:, h].set(1.0)
            _, t_out = jax.jvp(
                lambda c: _stage_primal(table_g, c, group_p), (cc_g,),
                (tangent,))
            dcc_cols.append(jnp.sum(t_out * g_g, axis=-1))
        d_ccs.append(jnp.stack(dcc_cols, axis=-1))

    d_cc = d_ccs[0] if len(d_ccs) == 1 else jnp.concatenate(d_ccs, axis=0)
    return (d_xp, d_cc)


_windows_op.defvjp(_windows_op_fwd, _windows_op_bwd)


def _make_params(padded_spatial, channels, B, naxis, order, out_spatial,
                 compute_dtype, pad, plan=None, table_dtype=""):
    """Static stage parameters for a given padded-input geometry.

    ``plan`` must be the plan the input was padded for; when omitted, the
    size-blind default ``window_plan(naxis, order)`` is used.
    """
    if plan is None:
        plan = window_plan(naxis, order)
    assert plan is not None
    n_lead, widths, strides = plan
    nw = naxis - n_lead
    counts = [(padded_spatial[n_lead + k] - widths[k]) // strides[k] + 1
              for k in range(nw)]
    table_dims = tuple(padded_spatial[:n_lead]) + tuple(counts)
    lane_count = math.prod(widths)
    rows_per_sample = math.prod(table_dims)
    if B * rows_per_sample >= 2 ** 31:
        raise ValueError(
            f"window table has {B * rows_per_sample} rows, which overflows "
            "the int32 row indices of the windows fast path; split the "
            "batch or use strategy='gather'")

    # row-major strides over the per-sample table_dims
    tstrides = [0] * naxis
    acc_s = 1
    for h in range(naxis - 1, -1, -1):
        tstrides[h] = acc_s
        acc_s *= table_dims[h]

    return _StageParams(order=order, widths=tuple(widths),
                        strides=tuple(strides), n_lead=n_lead,
                        tstrides=tuple(tstrides), pad=pad, channels=channels,
                        lane_count=lane_count,
                        compute_dtype=str(compute_dtype),
                        n_out_s=math.prod(out_spatial),
                        rows_per_sample=rows_per_sample, nbatch=B,
                        table_dtype=str(table_dtype or ""))


def resample_windows_transpose(g, mapped, inside, order: int, out_spatial,
                               compute_dtype, pad: int, padded_spatial,
                               batched: bool = False, plan=None):
    """Exact transpose of :func:`resample_windows` w.r.t. the padded input.

    Args are as in :func:`resample_windows` but with the output cotangent
    ``g`` ((B,) *out_spatial, C) in place of the input, plus the static
    ``padded_spatial`` shape of that input. Returns the input cotangent
    ((B,) *padded_spatial, C).

    This is the hand-written backward-only pipeline (the reference's
    ``deform_grid_grad`` semantics, deform.c:953-995 scatter + the table
    fold): scatter ``g`` into table-row cotangents, then overlap-add the
    rows back onto the padded volume — without paying the dead forward that
    ``jax.vjp`` on a zeros primal would execute.
    """
    naxis = len(mapped)
    B = g.shape[0] if batched else 1
    C = g.shape[-1]
    n_out = B * math.prod(out_spatial)
    p = _make_params(tuple(padded_spatial), C, B, naxis, order, out_spatial,
                     compute_dtype, pad, plan)
    cc_flat = jnp.stack([m.reshape(n_out).astype(compute_dtype)
                         for m in mapped], axis=-1)
    g2 = g.reshape(n_out, C).astype(compute_dtype)
    if inside is not None:
        mask = inside.reshape(n_out)[:, None]
        g2 = jnp.where(mask, g2, jnp.zeros((), g2.dtype))
    return _scatter_fold(g2, cc_flat, p, tuple(padded_spatial), batched)


def resample_windows(x, mapped, inside, order: int, out_spatial,
                     compute_dtype, pad: int, batched: bool = False,
                     plan=None, fuse_filter=None, table_dtype=""):
    """Window-gather resampling; same contract as resample.resample_linear.

    ``x``: (*padded_spatial, C) spline coefficients where each spatial axis
    was mirror-padded by ``pad`` on the left and by ``pad + widths[k]`` on
    the right (the extra right padding guarantees that the last windows
    exist; their out-of-stencil lanes carry zero weight).

    With ``batched=True``, ``x`` is (B, *padded_spatial, C) and ``mapped``/
    ``inside`` carry a leading batch axis; the batch folds into the table
    rows so the gather stays a plain 2-D row gather — ``vmap``-batched
    gathers lower with an extra transposed copy and off the fast DMA path.

    Large outputs are streamed in chunks with ``lax.map`` so the
    (chunk, 128) gathered-rows/lane-weight intermediates stay bounded; the
    table build + gather run as one custom-adjoint op
    (see :func:`_windows_op`).

    ``fuse_filter``: spline order whose prefilter folds into the build —
    ``x`` is then the RAW (*spatial, C) input (caller gates via
    :func:`can_fuse_filter_build`); the op contracts each axis with the
    fused prefilter+pad+expand matrix instead of expecting padding.
    """
    naxis = len(mapped)
    B = x.shape[0] if batched else 1
    n_out = B * math.prod(out_spatial)
    C = x.shape[-1]
    raw_spatial = x.shape[1:-1] if batched else x.shape[:-1]
    if fuse_filter is not None:
        if plan is None:
            plan = window_plan(naxis, order)
        widths = plan[1]
        padded_spatial = tuple(n + 2 * pad + w
                               for n, w in zip(raw_spatial, widths))
        fuse = (fuse_filter, tuple(raw_spatial))
    else:
        padded_spatial = raw_spatial
        fuse = None
    # _make_params also guards the int32 row indices of _chunk_weights /
    # _row_offsets against tables past 2**31 rows
    p = _make_params(tuple(padded_spatial), C, B, naxis, order, out_spatial,
                     compute_dtype, pad, plan, table_dtype)

    cc_flat = jnp.stack([m.reshape(n_out).astype(compute_dtype)
                         for m in mapped], axis=-1)
    acc = _windows_op(x, cc_flat, p, tuple(padded_spatial), batched, fuse)
    if inside is not None:
        # constant-mode mask applied outside the custom op so its cotangent
        # flows as a plain elementwise multiply
        mask = inside.reshape(n_out)[:, None]
        acc = jnp.where(mask, acc, jnp.zeros((), acc.dtype))
    if batched:
        return acc.reshape(B, *out_spatial, C)
    return acc.reshape(*out_spatial, C)


def window_pad_indices(length: int, pad: int, extra_right: int) -> np.ndarray:
    """Static index vector for mirror-pad + right extension.

    Left ``pad`` and right ``pad`` use the mirror fold (identical to the
    plain gather path); the additional ``extra_right`` entries only exist so
    the last overlapping windows are in-bounds — they are never touched by a
    nonzero weight, so clamped edge indices are fine.
    """
    core = np.arange(-pad, length + pad)
    idx = mirror_index_np(core, length)
    tail = np.full((extra_right,), length - 1, dtype=np.int64)
    return np.concatenate([idx, tail])


def window_pad_axis(x, axis: int, pad: int, extra_right: int):
    """Mirror-pad + right extension along ``axis`` (same content as indexing
    with :func:`window_pad_indices`).

    Expressed as reversed edge slices + concat + a broadcast tail instead of
    one ``jnp.take``: numerically identical, but its XLA *transpose* is pure
    slice-adds — ``take``'s transpose is a scatter-add, which costs tens of
    ms on multi-GB cotangents in the backward pass.
    """
    length = x.shape[axis]
    if length <= pad + 1:
        # multi-fold mirror (tiny axes): keep the general gather
        idx = window_pad_indices(length, pad, extra_right)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    parts = []
    if pad:
        parts.append(jax.lax.rev(
            jax.lax.slice_in_dim(x, 1, pad + 1, axis=axis), (axis,)))
    parts.append(x)
    if pad:
        parts.append(jax.lax.rev(
            jax.lax.slice_in_dim(x, length - pad - 1, length - 1, axis=axis),
            (axis,)))
    if extra_right:
        last = jax.lax.slice_in_dim(x, length - 1, length, axis=axis)
        shape = list(last.shape)
        shape[axis] = extra_right
        parts.append(jnp.broadcast_to(last, shape))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=axis)


def window_unpad_axis(d, axis: int, length: int, pad: int, extra_right: int):
    """Exact transpose of :func:`window_pad_axis` along ``axis``.

    Overlap-adds the pad regions back onto the core extent with static
    pads + adds (no scatter), mirroring the slice structure of the forward.
    """
    if length <= pad + 1:
        idx = jnp.asarray(window_pad_indices(length, pad, extra_right))
        moved = jnp.moveaxis(d, axis, 0)
        summed = jax.ops.segment_sum(moved, idx, num_segments=length)
        return jnp.moveaxis(summed, 0, axis)
    ndim = d.ndim
    out = jax.lax.slice_in_dim(d, pad, pad + length, axis=axis)

    def _pad_to(seg, lo):
        cfg = [(0, 0, 0)] * ndim
        cfg[axis] = (lo, length - lo - seg.shape[axis], 0)
        return jax.lax.pad(seg, jnp.zeros((), seg.dtype), cfg)

    if pad:
        left = jax.lax.rev(jax.lax.slice_in_dim(d, 0, pad, axis=axis),
                           (axis,))
        out = out + _pad_to(left, 1)
        right = jax.lax.rev(
            jax.lax.slice_in_dim(d, pad + length, 2 * pad + length,
                                 axis=axis), (axis,))
        out = out + _pad_to(right, length - pad - 1)
    if extra_right:
        tail = jnp.sum(jax.lax.slice_in_dim(
            d, 2 * pad + length, 2 * pad + length + extra_right, axis=axis),
            axis=axis, keepdims=True)
        out = out + _pad_to(tail, length - 1)
    return out
