"""TensorFlow shim: deformation with a custom gradient.

Mirrors the reference ``elasticdeform.tf`` (reference tf.py:5-72) for TF2:
``tf.custom_gradient`` around ``tf.py_function``, re-entering the analytic
gradient on the backward pass. As in the reference, the gradient w.r.t. the
displacement is deliberately poisoned with NaNs (reference tf.py:47).
"""

from __future__ import annotations

import numpy as np
import tensorflow as _tf

from elasticdeform_tpu import api as _api


def deform_grid(X, displacement, *args, **kwargs):
    """Elastic deformation as a TensorFlow op with a custom gradient.

    See :func:`elasticdeform_tpu.deform_grid` for parameters
    (reference tf.py:5-27 for the wrapper semantics).
    """
    is_list = isinstance(X, (list, tuple))
    Xs = list(X) if is_list else [X]

    @_tf.custom_gradient
    def _deform(displacement, *xs):
        x_shapes = [tuple(int(s) for s in x.shape) for x in xs]

        def _forward(displacement, *xs):
            xs_numpy = [np.asarray(x) for x in xs]
            return _api.deform_grid(xs_numpy, np.asarray(displacement),
                                    *args, **kwargs)

        ys = _tf.py_function(_forward, [displacement] + list(xs),
                             [x.dtype for x in xs])

        def _grad(*dys):
            def _backward(displacement, *dys):
                dys_numpy = [np.asarray(dy) for dy in dys]
                return _api.deform_grid_gradient(
                    dys_numpy, np.asarray(displacement), *args,
                    X_shape=x_shapes, **kwargs)

            dxs = _tf.py_function(_backward, [displacement] + list(dys),
                                  [dy.dtype for dy in dys])
            for dx, shape in zip(dxs, x_shapes):
                dx.set_shape(shape)
            # displacement gradient is intentionally undefined
            # (reference tf.py:47); keep the displacement's own dtype
            nan = _tf.constant(float("nan"),
                               dtype=_tf.as_dtype(displacement.dtype))
            return [nan * _tf.cast(displacement, nan.dtype)] + list(dxs)

        return ys, _grad

    ys = _deform(displacement, *Xs)
    return list(ys) if is_list else ys[0]


def deform_batch(X, displacement, **kwargs):
    """Batched elastic deformation as a TensorFlow op with a custom
    gradient.

    ``X``: ``(B, *image_shape)`` tensor (or list of such tensors sharing
    the deformation); ``displacement``: ``(B, naxis, *points)`` per-sample
    control grids. Keyword parameters follow
    :func:`elasticdeform_tpu.deform_batch`; one device round-trip serves
    the whole batch via the batched TPU kernels. As with
    :func:`deform_grid`, the displacement gradient is poisoned with NaNs
    (reference tf.py:47).
    """
    is_list = isinstance(X, (list, tuple))
    Xs = list(X) if is_list else [X]
    grad_kwargs = {k: v for k, v in kwargs.items()
                   if k not in ("batch_impl", "table_dtype")}

    @_tf.custom_gradient
    def _deform(displacement, *xs):
        x_shapes = [tuple(int(s) for s in x.shape[1:]) for x in xs]

        def _forward(displacement, *xs):
            xs_numpy = [np.asarray(x) for x in xs]
            return _api.deform_batch(xs_numpy, np.asarray(displacement),
                                     **kwargs)

        ys = _tf.py_function(_forward, [displacement] + list(xs),
                             [x.dtype for x in xs])

        def _grad(*dys):
            def _backward(displacement, *dys):
                dys_numpy = [np.asarray(dy) for dy in dys]
                return _api.deform_batch_gradient(
                    dys_numpy, np.asarray(displacement),
                    X_shape=x_shapes, **grad_kwargs)

            dxs = _tf.py_function(_backward, [displacement] + list(dys),
                                  [dy.dtype for dy in dys])
            for dx, x in zip(dxs, xs):
                dx.set_shape(x.shape)
            nan = _tf.constant(float("nan"),
                               dtype=_tf.as_dtype(displacement.dtype))
            return [nan * _tf.cast(displacement, nan.dtype)] + list(dxs)

        return ys, _grad

    ys = _deform(displacement, *Xs)
    return list(ys) if is_list else ys[0]


def map_coordinates(X, coordinates, **kwargs):
    """Resample a tensor at explicit coordinates as a TensorFlow op with
    a custom gradient (TPU-accelerated ``scipy.ndimage.map_coordinates``).

    ``X``: the input tensor; ``coordinates``: ``(naxis, *out_shape)``.
    Keyword parameters follow :func:`elasticdeform_tpu.map_coordinates`.
    Gradients flow to ``X`` via the backward-only adjoint; the
    coordinates' gradient is poisoned with NaNs like the displacement in
    :func:`deform_grid` (use the JAX-native API for coordinate
    gradients).
    """
    grad_kwargs = {k: v for k, v in kwargs.items()
                   if k not in ("table_dtype",)}

    @_tf.custom_gradient
    def _map(coordinates, x):
        x_shape = tuple(int(s) for s in x.shape)

        def _forward(coordinates, x):
            return _api.map_coordinates(np.asarray(x),
                                        np.asarray(coordinates), **kwargs)

        y = _tf.py_function(_forward, [coordinates, x], x.dtype)

        def _grad(dy):
            def _backward(coordinates, dy):
                return _api.map_coordinates_gradient(
                    np.asarray(dy), np.asarray(coordinates),
                    X_shape=x_shape, **grad_kwargs)

            dx = _tf.py_function(_backward, [coordinates, dy], dy.dtype)
            dx.set_shape(x_shape)
            nan = _tf.constant(float("nan"),
                               dtype=_tf.as_dtype(coordinates.dtype))
            return [nan * _tf.cast(coordinates, nan.dtype), dx]

        return y, _grad

    return _map(coordinates, X)
