"""SciPy-based oracles encoding the reference semantics.

Two oracles, mirroring the reference's test strategy
(reference tests/test_deform_grid.py:36-72 and the SciPy-1.6 version gating
at :29-33, :94-97):

* :func:`deform_grid_oracle` — the first-principles recipe of the reference
  tests: interpolate the displacement grid with ``map_coordinates(order=3)``
  on a ``linspace(0, points-1, shape)`` grid, add to the voxel coordinates,
  resample with ``map_coordinates``. Valid on modern SciPy only for modes
  whose semantics did not change in SciPy 1.6 (mirror, constant, wrap).

* :func:`deform_grid_oracle_oldmode` — valid for ALL five modes: it applies
  the library's pre-1.6 boundary mapping to the coordinates first (one
  mapping step per the C semantics), then lets scipy do the spline
  interpolation on a generously mirror-padded input with ``mode='mirror'``
  (which matches the C library's always-mirror tap folding). The padding is
  wide enough that the prefilter of the padded array agrees with the
  mirror-extended prefilter to < 1e-12.
"""

from __future__ import annotations

import itertools

import numpy as np
import scipy.ndimage

from elasticdeform_tpu.ops.modes import (
    map_coordinate_np,
    mirror_index_np,
    mode_to_code,
    MODE_CONSTANT,
)

_ORACLE_PAD = 48  # IIR tail < 1e-14 for all orders' poles


def _dense_coords(X, displacement, axis, crop, affine=None):
    points = [displacement[0].shape[d] for d in range(len(axis))]
    coordinates = np.meshgrid(*[np.arange(X.shape[d]) for d in axis],
                              indexing='ij')
    xi = np.meshgrid(*[np.linspace(0, p - 1, X.shape[d])
                       for d, p in zip(axis, points)], indexing='ij')
    if crop is not None:
        coordinates = [c[crop] for c in coordinates]
        xi = [x[crop] for x in xi]
        crop_full = tuple(crop[axis.index(i)] if i in axis else slice(None)
                          for i in range(X.ndim))
    else:
        crop_full = (slice(None),) * X.ndim
    naxis = len(axis)
    if affine is not None:
        # reference deform.c:771-777: the (inverse) affine acts on the
        # 0-based *cropped output* coordinate; the crop offset and the
        # displacement are added afterwards (deform.c:781)
        offsets = [(crop[i].start or 0) if crop is not None else 0
                   for i in range(naxis)]
        o = [coordinates[l] - offsets[l] for l in range(naxis)]
        base = []
        for h in range(naxis):
            acc = np.full(o[0].shape, float(affine[h, naxis]))
            for l in range(naxis):
                acc = acc + affine[h, l] * o[l]
            base.append(acc + offsets[h])
        coordinates = base
    coords = []
    for i in range(naxis):
        yd = scipy.ndimage.map_coordinates(displacement[i], xi, order=3)
        coords.append(coordinates[i] + yd)
    return coords, crop_full


def _normalize_axis(X, axis):
    if axis is None:
        return tuple(range(X.ndim))
    if isinstance(axis, int):
        return (axis,)
    return tuple(axis)


def deform_grid_oracle(X, displacement, order=3, mode='constant', cval=0.0,
                       crop=None, prefilter=True, axis=None):
    """Reference-test-style scipy oracle (modern-scipy-compatible modes)."""
    axis = _normalize_axis(X, axis)
    coords, crop_full = _dense_coords(X, displacement, axis, crop)
    out = np.zeros(X[crop_full].shape, dtype=X.dtype)
    iter_axes = [range(X.shape[d]) if d not in axis else [slice(None)]
                 for d in range(X.ndim)]
    for a in itertools.product(*iter_axes):
        scipy.ndimage.map_coordinates(X[a], coords, output=out[a],
                                      order=order, cval=cval, mode=mode,
                                      prefilter=prefilter)
    return out


def deform_grid_oracle_oldmode(X, displacement, order=3, mode='constant',
                               cval=0.0, crop=None, prefilter=True,
                               axis=None, affine=None):
    """All-modes oracle with the pre-SciPy-1.6 boundary semantics.

    ``affine`` (optional): the (naxis, naxis+1) *inverse* affine applied to
    output coordinates, reference deform.c:771-777 semantics.
    """
    axis = _normalize_axis(X, axis)
    mode_code = mode_to_code(mode)
    coords, crop_full = _dense_coords(X, displacement, axis, crop, affine)

    mapped = []
    inside = np.ones(coords[0].shape, dtype=bool)
    for h, d in enumerate(axis):
        m, ins = map_coordinate_np(coords[h], X.shape[d], mode_code)
        mapped.append(m + _ORACLE_PAD)
        inside &= ins

    # mirror-pad the deformed axes so scipy's mirror mode reproduces the
    # C library's tap folding even for coordinates left in (-1, 0)/(len-1, len)
    Xp = X
    for d in axis:
        idx = mirror_index_np(np.arange(-_ORACLE_PAD, X.shape[d] + _ORACLE_PAD),
                              X.shape[d])
        Xp = np.take(Xp, idx, axis=d)

    out = np.zeros(X[crop_full].shape, dtype=np.float64)
    iter_axes = [range(X.shape[d]) if d not in axis else [slice(None)]
                 for d in range(X.ndim)]
    for a in itertools.product(*iter_axes):
        sample = scipy.ndimage.map_coordinates(
            np.asarray(Xp[a], dtype=np.float64), mapped, order=order,
            mode='mirror', prefilter=prefilter)
        if mode_code == MODE_CONSTANT:
            sample = np.where(inside, sample, cval)
        out[a] = sample
    return out.astype(X.dtype)


def map_coordinates_oracle(X, coordinates, order=3, mode='constant',
                           cval=0.0, prefilter=True, axis=None):
    """All-modes oracle for ``map_coordinates`` (pre-SciPy-1.6 semantics).

    Same recipe as :func:`deform_grid_oracle_oldmode` — apply the
    library's boundary mapping first, then let scipy interpolate on a
    mirror-padded input — but with caller-supplied dense coordinates
    instead of grid-interpolated displacements.
    """
    axis = _normalize_axis(X, axis)
    mode_code = mode_to_code(mode)
    naxis = len(axis)
    coords = [np.asarray(coordinates[h], dtype=np.float64)
              for h in range(naxis)]

    mapped = []
    inside = np.ones(coords[0].shape, dtype=bool)
    for h, d in enumerate(axis):
        m, ins = map_coordinate_np(coords[h], X.shape[d], mode_code)
        mapped.append(m + _ORACLE_PAD)
        inside &= ins

    Xp = X
    for d in axis:
        idx = mirror_index_np(np.arange(-_ORACLE_PAD, X.shape[d] + _ORACLE_PAD),
                              X.shape[d])
        Xp = np.take(Xp, idx, axis=d)

    if naxis == X.ndim:
        # pure case: output rank may differ from the input rank
        sample = scipy.ndimage.map_coordinates(
            np.asarray(Xp, dtype=np.float64), mapped, order=order,
            mode='mirror', prefilter=prefilter)
        if mode_code == MODE_CONSTANT:
            sample = np.where(inside, sample, cval)
        return sample.astype(X.dtype)

    out_spatial = coords[0].shape
    out_shape = list(X.shape)
    for h, d in enumerate(axis):
        out_shape[d] = out_spatial[h]
    out = np.zeros(tuple(out_shape), dtype=np.float64)
    iter_axes = [range(X.shape[d]) if d not in axis else [slice(None)]
                 for d in range(X.ndim)]
    for a in itertools.product(*iter_axes):
        sample = scipy.ndimage.map_coordinates(
            np.asarray(Xp[a], dtype=np.float64), mapped, order=order,
            mode='mirror', prefilter=prefilter)
        if mode_code == MODE_CONSTANT:
            sample = np.where(inside, sample, cval)
        out[a] = sample
    return out.astype(X.dtype)
