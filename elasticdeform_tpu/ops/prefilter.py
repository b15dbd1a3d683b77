"""B-spline prefilter (sample values -> spline coefficients) and its adjoint.

The reference runs ``scipy.ndimage.spline_filter1d`` on the host for the
forward prefilter (reference deform_grid.py:154-169) and a hand-written
transpose IIR recursion for the gradient (``NI_SplineFilter1DGrad``,
reference deform.c:1049-1168, poles at deform.c:1063-1084).

TPU-native design: the prefilter along an axis of length ``n`` is a *linear*
map, so it equals multiplication by a dense ``n x n`` matrix. We precompute
that matrix once per ``(n, order)`` on the host (float64, cached) by running
the causal/anti-causal recursions on the identity matrix, then apply it on
device as a single ``tensordot`` — which XLA places on the MXU. This replaces
a length-``n`` sequential scan (the least TPU-friendly construct) with one
matmul, and makes the exact adjoint trivially available as multiplication by
the transposed matrix (machine-precision agreement with the reference's
transpose recursion, which is the transpose of the same linear map).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

# Truncation tolerance of the recursion initialization, matching both SciPy
# and the reference (deform.c:1046 ``TOLERANCE 1e-15``).
_TOLERANCE = 1e-15


def spline_poles(order: int):
    """IIR filter poles per order (reference deform.c:1063-1084)."""
    if order in (0, 1):
        return ()
    if order == 2:
        return (math.sqrt(8.0) - 3.0,)
    if order == 3:
        return (math.sqrt(3.0) - 2.0,)
    if order == 4:
        return (
            math.sqrt(664.0 - math.sqrt(438976.0)) + math.sqrt(304.0) - 19.0,
            math.sqrt(664.0 + math.sqrt(438976.0)) - math.sqrt(304.0) - 19.0,
        )
    if order == 5:
        return (
            math.sqrt(67.5 - math.sqrt(4436.25)) + math.sqrt(26.25) - 6.5,
            math.sqrt(67.5 + math.sqrt(4436.25)) - math.sqrt(26.25) - 6.5,
        )
    raise ValueError("order should be 0, 1, 2, 3, 4 or 5.")


def _filter_lines(lines: np.ndarray, order: int) -> np.ndarray:
    """Apply the 1-D spline prefilter along axis 0 of ``lines`` (float64).

    Vectorized over the remaining axes. This is the classic
    causal/anti-causal recursive filter with mirror ("reflect about the edge
    sample") boundary initialization — the algorithm behind
    ``scipy.ndimage.spline_filter1d(mode='mirror')``, which is what the
    reference invokes at deform_grid.py:160,168.
    """
    poles = spline_poles(order)
    if not poles:
        return lines
    n = lines.shape[0]
    if n <= 1:
        return lines
    ln = np.array(lines, dtype=np.float64, copy=True)
    weight = 1.0
    for p in poles:
        weight *= (1.0 - p) * (1.0 - 1.0 / p)
    ln *= weight
    for p in poles:
        # causal initialization (mirror boundary), truncated at _TOLERANCE
        horizon = int(np.ceil(np.log(_TOLERANCE) / np.log(abs(p))))
        if horizon < n:
            zn = p
            acc = ln[0].copy()
            for k in range(1, horizon):
                acc += zn * ln[k]
                zn *= p
            ln[0] = acc
        else:
            zn = p
            iz = 1.0 / p
            z2n = p ** (n - 1)
            acc = ln[0] + z2n * ln[n - 1]
            z2n *= z2n * iz
            for k in range(1, n - 1):
                acc += (zn + z2n) * ln[k]
                zn *= p
                z2n *= iz
            ln[0] = acc / (1.0 - p ** (2 * n - 2))
        # causal recursion
        for k in range(1, n):
            ln[k] += p * ln[k - 1]
        # anti-causal initialization (mirror boundary)
        ln[n - 1] = (p / (p * p - 1.0)) * (ln[n - 1] + p * ln[n - 2])
        # anti-causal recursion
        for k in range(n - 2, -1, -1):
            ln[k] = p * (ln[k + 1] - ln[k])
    return ln


@functools.lru_cache(maxsize=None)
def filter_matrix(n: int, order: int) -> np.ndarray:
    """Dense ``n x n`` prefilter matrix ``F`` with ``coeffs = F @ samples``.

    Built by filtering the identity matrix column-by-column (vectorized).
    Cached per ``(n, order)``; float64.
    """
    if order <= 1 or n <= 1:
        return np.eye(n, dtype=np.float64)
    return np.ascontiguousarray(_filter_lines(np.eye(n, dtype=np.float64), order))


def _apply_matrix(x, mat: np.ndarray, axis: int):
    """Contract ``mat`` (n_out, n_in) with ``x`` along ``axis`` on device.

    Precision.HIGHEST is required: TPU matmuls default to bfloat16 inputs,
    and the filter matrix has gain ~6 with cancellation — bf16 noise there
    breaks the 1e-5 parity contract.
    """
    x = jnp.asarray(x)
    m = jnp.asarray(mat, dtype=x.dtype)
    out = jnp.tensordot(m, x, axes=[[1], [axis]],
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, 0, axis)


def spline_filter1d(x, order: int, axis: int):
    """Device-side equivalent of ``scipy.ndimage.spline_filter1d`` (mirror).

    Forward prefilter used before interpolation for ``order > 1``
    (reference deform_grid.py:154-169). Runs as one MXU matmul.
    """
    if order <= 1:
        return jnp.asarray(x)
    n = x.shape[axis]
    return _apply_matrix(x, filter_matrix(n, order), axis)


def spline_filter1d_select(x, order: int, axis: int, sel_idx: np.ndarray):
    """Fused prefilter + static row-selection: ``take(spline_filter1d(x),
    sel_idx, axis)`` as ONE matmul with the row-selected filter matrix.

    ``sel_idx`` is a static (host) integer vector; selecting rows of ``F``
    only duplicates/reorders them, so every output row is the same inner
    product the staged filter-then-take computes — the fusion is exact.
    Used to fold the window mirror-padding (ops/windows.py
    ``window_pad_indices``) into the prefilter matmul, saving a concat
    kernel per axis in the forward and a slice-add chain in the backward
    (the transpose of the fused matmul is again one matmul).
    """
    n = x.shape[axis]
    F = filter_matrix(n, order)[np.asarray(sel_idx)]
    return _apply_matrix(x, F, axis)


def spline_filter1d_select_transpose(x, order: int, axis: int,
                                     sel_idx: np.ndarray, n: int):
    """Exact adjoint of :func:`spline_filter1d_select`: contracts the
    selected-and-padded axis (length ``len(sel_idx)``) back to length ``n``
    with the transposed row-selected filter matrix — the un-pad overlap-add
    and the transpose prefilter in one matmul."""
    F = filter_matrix(n, order)[np.asarray(sel_idx)].T
    return _apply_matrix(x, F, axis)


def spline_filter1d_transpose(x, order: int, axis: int):
    """Exact adjoint of :func:`spline_filter1d`.

    TPU-native equivalent of ``NI_SplineFilter1DGrad`` (reference
    deform.c:1049-1168, exposed as ``spline_filter1d_grad`` at
    _deform_grid.c:61-92): multiplication by the transposed filter matrix.
    """
    if order <= 1:
        return jnp.asarray(x)
    n = x.shape[axis]
    return _apply_matrix(x, filter_matrix(n, order).T, axis)


def spline_filter1d_np(x: np.ndarray, order: int, axis: int) -> np.ndarray:
    """Host (numpy, float64) forward prefilter — used for oracle checks."""
    if order <= 1:
        return np.asarray(x, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    moved = np.moveaxis(x, axis, 0)
    out = _filter_lines(moved.reshape(moved.shape[0], -1), order)
    return np.moveaxis(out.reshape(moved.shape), 0, axis)
