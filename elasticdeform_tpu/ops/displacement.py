"""Coarse control-point grid -> dense per-voxel displacement field.

The reference interpolates the (prefiltered) control-point grid with a
hardcoded order-3 B-spline per output voxel, with mirror handling of filter
taps that fall outside the grid (reference deform.c:639-758; the coordinate
formula ``cp = (ncp-1) * (j + offset) / (idim-1)`` is deform.c:643,655;
``dorder = 3`` is deform.c:375).

TPU-native design: because ``cp`` along axis ``h`` depends only on the
*static* output index, crop offset, and array dimensions, the whole
interpolation is a separable linear map with per-axis matrices
``W_h (odim_h, ncp_h)`` that can be precomputed on the host and contracted
on device — the per-voxel 4^naxis gather loop of the C code becomes a chain
of tiny dense matmuls that XLA fuses and runs on the MXU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from elasticdeform_tpu.ops.bspline import filter_start, spline_weights
from elasticdeform_tpu.ops.modes import mirror_index_np

_DORDER = 3  # displacement spline order, hardcoded as in reference deform.c:375


@functools.lru_cache(maxsize=None)
def displacement_matrix(odim: int, ncp: int, idim: int, offset: int,
                        prefilter_grid: bool = False,
                        derivative: int = 0) -> np.ndarray:
    """Interpolation matrix ``W (odim, ncp)``: ``dense = W @ coeffs``.

    Row ``j`` holds the order-3 spline weights of output position ``j`` (plus
    crop ``offset``) scattered into the mirror-mapped control-point columns —
    the same taps/weights the reference computes at deform.c:639-647,653-691.

    With ``prefilter_grid=True`` the order-3 control-point prefilter
    (reference deform_grid.py:165-169) is composed into ``W`` on the host
    in float64 (``W @ F``), so the caller passes the RAW grid and one
    matmul per axis replaces prefilter + interpolation.

    ``derivative`` (0-2) builds the matrix of the field's ``derivative``-th
    spatial derivative instead: the rows hold ``beta3^(d)`` tap values
    scaled by ``((ncp-1)/(idim-1))**d`` (the chain-rule factor of the
    control-coordinate map) — the analytic spatial Jacobian/Hessian of
    the reconstruction, exact including the mirror coefficient fold.
    """
    if idim <= 1:
        raise ValueError("deformed axes must have at least 2 elements")
    jj = np.arange(odim, dtype=np.float64)
    cp = (ncp - 1) * (jj + offset) / (idim - 1)
    start = filter_start(cp, _DORDER, xp=np).astype(np.int64)
    if derivative == 0:
        weights = spline_weights(cp, _DORDER, xp=np)  # 4 arrays (odim,)
    else:
        from elasticdeform_tpu.ops.bspline import bspline3_np
        scale = ((ncp - 1) / (idim - 1)) ** derivative
        weights = [bspline3_np(cp - (start + tap), derivative) * scale
                   for tap in range(_DORDER + 1)]
    W = np.zeros((odim, ncp), dtype=np.float64)
    rows = np.arange(odim)
    for tap, w in enumerate(weights):
        cols = mirror_index_np(start + tap, ncp)
        np.add.at(W, (rows, cols), w)
    if prefilter_grid:
        from elasticdeform_tpu.ops.prefilter import filter_matrix
        W = W @ filter_matrix(ncp, _DORDER)
    return W


def dense_displacement(displacement_f, out_shape, in_shape, offsets, dtype,
                       prefilter_grid: bool = False):
    """Interpolate the (prefiltered) control grid to a dense field.

    Args:
        displacement_f: (naxis, ncp_0, ..., ncp_{n-1}) grid — prefiltered
            coefficients, or the raw grid with ``prefilter_grid=True``
            (the prefilter matrices then compose into the interpolation
            matmuls on the host; one kernel per axis instead of two).
        out_shape: static output spatial shape over the deformed axes.
        in_shape: static *uncropped* input spatial shape (the ``cp`` formula
            always divides by the full extent, reference deform.c:643).
        offsets: static per-axis crop offsets (0 when not cropped).
        dtype: compute dtype.

    Returns (naxis, *out_shape) dense displacement.
    """
    naxis = len(out_shape)
    out = jnp.asarray(displacement_f, dtype=dtype)
    for h in range(naxis):
        W = displacement_matrix(out_shape[h], out.shape[h + 1], in_shape[h],
                                offsets[h], prefilter_grid)
        # Precision.HIGHEST: TPU matmuls default to bf16, which would put
        # ~4e-3 noise on the displacement field (breaks 1e-5 parity)
        out = jnp.moveaxis(
            jnp.tensordot(jnp.asarray(W, dtype=dtype), out,
                          axes=[[1], [h + 1]],
                          precision=jax.lax.Precision.HIGHEST),
            0, h + 1)
    return out
