"""Gather-based B-spline resampling at deformed coordinates.

TPU-native replacement for the per-voxel hot loop of the reference C kernel
(reference deform.c:649-1001). Key design choices:

* **Static mirror padding instead of per-tap boundary math.** After the
  boundary mode maps the sample coordinate into ``[0, len-1]``, the
  reference folds each of the ``(order+1)^naxis`` filter-tap indices with
  mirror arithmetic (deform.c:791-813). Since the mapped coordinate is
  in-range, all taps live within ``ceil(order/2)`` of the array, so we
  mirror-pad each deformed axis once (static gather with a precomputed index
  vector) and every tap becomes a *static* flat-stride offset from a single
  per-voxel base index. This removes all data-dependent index mapping from
  the inner loop: one base-index computation plus ``(order+1)^naxis``
  constant-offset gathers that XLA pipelines.
* **Channel axes ride along as a trailing dimension** — the reference's
  "step" loop over non-deformed axes (deform.c:828-838) reusing the same
  weights becomes row gathers of shape ``(channels,)``.
* **Everything is linear in the input**, so the exact adjoint (the
  reference's scatter-add gradient path, deform.c:926-997) is obtained with
  ``jax.linear_transpose`` — XLA transposes each gather into a fused
  scatter-add.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from elasticdeform_tpu.ops.bspline import filter_start, spline_weights
from elasticdeform_tpu.ops.modes import mirror_index_np


def pad_amount(order: int) -> int:
    """Mirror padding needed so all filter taps are in-bounds.

    The boundary-mode mapping does NOT fold every coordinate into
    ``[0, len-1]``: mirror leaves ``(len-1, len)`` unmapped and reflect
    leaves ``(-1, 0)`` unmapped (reference deform.c:52-69, 90-108 — the
    fold conditions are ``in <= 1-len`` / ``in >= len``), relying on the
    tap-level mirror fold (deform.c:791-813). With mapped cc in
    ``(-1, len)``, taps span ``[floor(cc+.5)-order//2, ...+order]`` which is
    covered by ``order//2 + 1`` on each side for all orders 0-5.
    """
    return order // 2 + 1


def mirror_pad(x, naxis: int, pad: int):
    """Mirror-extend the first ``naxis`` axes of ``x`` by ``pad`` on both
    sides, using static index gathers (same fold as reference deform.c:668-686)."""
    if pad == 0:
        return x
    for h in range(naxis):
        n = x.shape[h]
        idx = mirror_index_np(np.arange(-pad, n + pad), n)
        x = jnp.take(x, jnp.asarray(idx), axis=h)
    return x


def _index_dtype(total: int):
    return jnp.int32 if total < 2**31 else jnp.int64


def resample_linear(x, mapped, inside, order: int, out_spatial, compute_dtype):
    """Resample ``x`` at mapped coordinates; linear part only (no cval).

    Args:
        x: (*in_spatial, C) spline coefficients (already prefiltered),
            compute dtype.
        mapped: list of ``naxis`` arrays of shape ``out_spatial`` —
            boundary-mapped sample coordinates, guaranteed in
            ``[0, len_h - 1]``.
        inside: boolean array ``out_spatial`` (False -> output forced to 0
            here; the caller adds the cval constant), or None for modes
            without a constant region.
        order: interpolation order (0-5), static.
        out_spatial: static output spatial shape.
        compute_dtype: accumulation dtype.

    Returns (*out_spatial, C).
    """
    naxis = len(mapped)
    n_out = math.prod(out_spatial)
    channels = x.shape[-1]

    pad = pad_amount(order)
    xp = mirror_pad(x, naxis, pad)
    padded_spatial = xp.shape[:naxis]
    total = math.prod(padded_spatial)
    idt = _index_dtype(total * max(channels, 1))

    # row-major strides over the padded spatial dims
    strides = [0] * naxis
    s = 1
    for h in range(naxis - 1, -1, -1):
        strides[h] = s
        s *= padded_spatial[h]

    squeeze = channels == 1
    xf = xp.reshape(total) if squeeze else xp.reshape(total, channels)

    # per-axis start indices and tap weights (reference deform.c:783-818)
    base = None
    weights = []
    for h in range(naxis):
        cc = mapped[h]
        start = filter_start(cc, order).astype(idt) + pad
        term = start * strides[h] if strides[h] != 1 else start
        base = term if base is None else base + term
        weights.append([w.reshape(n_out) for w in spline_weights(cc, order)])
    base = base.reshape(n_out)

    # static tap loop with partial weight products
    # (the separable accumulation of reference deform.c:841-901)
    acc = None

    def visit(h, wpart, offset):
        nonlocal acc
        if h == naxis:
            vals = jnp.take(xf, base + offset if offset else base, axis=0,
                            mode="clip")
            contrib = vals if wpart is None else (
                wpart * vals if squeeze else wpart[:, None] * vals)
            acc = contrib if acc is None else acc + contrib
            return
        for tap in range(order + 1):
            w = weights[h][tap]
            if order == 0:
                wnew = wpart  # order 0: no weighting (deform.c:896-898)
            else:
                wnew = w if wpart is None else wpart * w
            visit(h + 1, wnew, offset + tap * strides[h])

    visit(0, None, 0)

    if inside is not None:
        mask = inside.reshape(n_out)
        acc = jnp.where(mask if squeeze else mask[:, None], acc,
                        jnp.zeros((), dtype=compute_dtype))
    out = acc.reshape(*out_spatial, channels) if not squeeze else \
        acc.reshape(*out_spatial, 1)
    return out


def cast_int_c(t, dtype):
    """Emulate a C truncating/wrapping cast of floats into an integer dtype,
    returning the result as the (integral-valued) float it came in as.

    The reference's per-axis input prefilter writes scipy's float result
    into an array of the *input* dtype (reference deform_grid.py:157-161,
    ``output=x_f`` with ``x_f = numpy.zeros_like(x)``); scipy's line-buffer
    writeback is a plain C cast (reference from_nd_image.c:434-487
    ``CASE_COPY_LINE_TO_DATA``): truncate toward zero, then wrap modulo
    2**bits (e.g. -12.69 -> 244 in uint8). ``npy_bool`` is an unsigned
    char, so bool follows the uint8 rule and the raw byte value is what
    later tap reads observe.
    """
    dtype = np.dtype(dtype)
    if dtype.kind == "b":
        dtype = np.dtype(np.uint8)
    info = np.iinfo(dtype)
    tr = jnp.trunc(t)
    span = float(2.0 ** info.bits)
    lo = float(info.min)
    return tr - jnp.floor((tr - lo) / span) * span


def cast_output(t, dtype):
    """Cast the float accumulator to the output dtype with the reference's
    rounding/clamping rules (reference deform.c:287-306):

    * floats: plain cast,
    * unsigned ints: ``t>0 ? t+0.5 : 0`` then clamp to ``[0, max]``, truncate,
    * signed ints: round half away from zero, clamp, truncate,
    * bool: C truncating cast, nonzero -> True.
    """
    dtype = np.dtype(dtype)
    if dtype.kind == "b":
        return jnp.trunc(t) != 0
    if dtype.kind not in "iu":
        # floats, complex, and ml_dtypes extended floats (bfloat16 has
        # numpy kind 'V'): plain cast
        return t.astype(dtype)
    info = np.iinfo(dtype)
    if dtype.kind == "u":
        r = jnp.where(t > 0, t + 0.5, 0.0)
    else:
        r = jnp.where(t > 0, t + 0.5, t - 0.5)
    r = jnp.clip(r, info.min, info.max)
    return jnp.trunc(r).astype(dtype)
