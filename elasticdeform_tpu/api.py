"""Numpy-compatible public API, mirroring the reference surface.

Drop-in equivalents of the reference's three public functions
(reference elasticdeform/__init__.py:1, deform_grid.py:6-291):
``deform_grid``, ``deform_random_grid``, ``deform_grid_gradient`` — numpy in,
numpy out, with the computation running jit-compiled on the default JAX
device (TPU). Each static configuration (shapes, axes, orders, modes, crop)
compiles once and is cached.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from elasticdeform_tpu import _normalize as _n
from elasticdeform_tpu.ops.deform import deform_apply, deform_gradient_apply


@functools.lru_cache(maxsize=512)
def _jitted_forward(spec):
    def fn(xs, displacement, affine):
        return deform_apply(list(xs), displacement, affine, spec)
    return jax.jit(fn)


@functools.lru_cache(maxsize=512)
def _jitted_gradient(spec):
    def fn(dys, displacement, affine):
        return deform_gradient_apply(list(dys), displacement, affine, spec)
    return jax.jit(fn)


def _to_device(arrays):
    return tuple(jnp.asarray(a) for a in arrays)


def _to_host(ys, dtypes):
    # preserve the reference's dtype contract even when x64 is disabled
    return [np.asarray(y).astype(dt, copy=False) for y, dt in zip(ys, dtypes)]


def deform_random_grid(X, sigma=25, points=3, order=3, mode='constant',
                       cval=0.0, crop=None, prefilter=True, axis=None,
                       affine=None, rotate=None, zoom=None):
    """Elastic deformation with a random deformation grid.

    Numpy-compatible twin of the reference ``deform_random_grid``
    (reference deform_grid.py:6-49): samples
    ``displacement = randn(naxis, *points) * sigma`` from the global numpy
    RNG and applies :func:`deform_grid`. For reproducible, device-side
    randomness use :func:`elasticdeform_tpu.deform_random` with an explicit
    PRNG key.
    """
    Xs = _n.normalize_inputs(X)
    axis_n, deform_shape = _n.normalize_axis_list(axis, Xs)
    if not isinstance(points, (list, tuple)):
        points = [points] * len(deform_shape)
    displacement = np.random.randn(len(deform_shape), *points) * sigma
    return deform_grid(X, displacement, order, mode, cval, crop, prefilter,
                       axis, affine, rotate, zoom)


def deform_grid(X, displacement, order=3, mode='constant', cval=0.0,
                crop=None, prefilter=True, axis=None, affine=None,
                rotate=None, zoom=None, *, strategy="auto"):
    """Elastic deformation with a deformation grid.

    Numpy-compatible twin of the reference ``deform_grid``
    (reference deform_grid.py:52-179); see that docstring for the full
    parameter semantics. The deformation runs jit-compiled on the default
    JAX device; outputs are numpy arrays with the input dtypes.
    """
    Xs = _n.normalize_inputs(X)
    axis_n, deform_shape = _n.normalize_axis_list(axis, Xs)
    output_shapes, output_offset = _n.compute_output_shapes(
        Xs, axis_n, deform_shape, crop)
    displacement = _n.normalize_displacement(displacement, Xs, axis_n)
    orders = _n.normalize_order(order, Xs)
    modes = _n.normalize_mode(mode, Xs)
    cvals = _n.normalize_cval(cval, Xs)
    inv_affine = _n.resolve_affine(affine, rotate, zoom, axis_n,
                                   output_shapes)
    spec = _n.build_spec(Xs, axis_n, deform_shape, output_shapes,
                         output_offset, orders, modes, cvals, prefilter,
                         displacement.dtype, inv_affine is not None,
                         strategy=strategy)
    fn = _jitted_forward(spec)
    ys = fn(_to_device(Xs), jnp.asarray(displacement),
            None if inv_affine is None else jnp.asarray(inv_affine))
    outputs = _to_host(ys, [np.dtype(x.dtype) for x in Xs])
    return outputs if isinstance(X, list) else outputs[0]


def deform_grid_gradient(dY, displacement, order=3, mode='constant', cval=0.0,
                         crop=None, prefilter=True, axis=None, X_shape=None,
                         affine=None, rotate=None, zoom=None, *,
                         strategy="auto"):
    """Gradient of :func:`deform_grid` w.r.t. the input.

    Numpy-compatible twin of the reference ``deform_grid_gradient``
    (reference deform_grid.py:182-291): the exact analytic adjoint,
    including the transpose spline prefilter. ``X_shape`` is required when
    ``crop`` is used.
    """
    dYs = _n.normalize_inputs(dY)
    if isinstance(X_shape, tuple):
        X_shape = [X_shape]
    elif X_shape is None:
        if crop is not None:
            raise ValueError(
                "X_shape is required if the crop parameter is given.")
        X_shape = [dy.shape for dy in dYs]

    class _Shaped:
        def __init__(self, shape, dtype):
            self.shape = tuple(int(s) for s in shape)
            self.ndim = len(shape)
            self.dtype = dtype
    dXs = [_Shaped(s, dy.dtype) for s, dy in zip(X_shape, dYs)]

    axis_n, deform_shape = _n.normalize_axis_list(axis, dXs)
    output_shapes, output_offset = _n.compute_output_shapes(
        dXs, axis_n, deform_shape, crop)
    if [tuple(s) for s in output_shapes] != [tuple(dy.shape) for dy in dYs]:
        raise ValueError("X_shape does not match output shape and cropping. "
                         "Expected output shape is %s, but %s given."
                         % (str(output_shapes),
                            str([tuple(dy.shape) for dy in dYs])))
    displacement = _n.normalize_displacement(displacement, dYs, axis_n)
    orders = _n.normalize_order(order, dYs)
    modes = _n.normalize_mode(mode, dYs)
    cvals = _n.normalize_cval(cval, dYs)
    inv_affine = _n.resolve_affine(affine, rotate, zoom, axis_n,
                                   output_shapes)
    spec = _n.build_spec(dXs, axis_n, deform_shape, output_shapes,
                         output_offset, orders, modes, cvals, prefilter,
                         displacement.dtype, inv_affine is not None,
                         strategy=strategy)
    fn = _jitted_gradient(spec)
    dxs = fn(_to_device(dYs), jnp.asarray(displacement),
             None if inv_affine is None else jnp.asarray(inv_affine))
    outputs = _to_host(dxs, [np.dtype(dy.dtype) for dy in dYs])
    return outputs if isinstance(dY, list) else outputs[0]
