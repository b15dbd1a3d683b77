"""PyTorch shim: autograd-capable elastic deformation.

Mirrors the reference ``elasticdeform.torch`` (reference torch.py:5-66): a
``torch.autograd.Function`` whose forward runs :func:`deform_grid` and whose
backward runs :func:`deform_grid_gradient`. Tensors are moved to the host,
deformed on the JAX default device (TPU), and returned on each input's
original torch device (reference torch.py:13-16). Like the reference, no
gradient is returned for the displacement (reference torch.py:29).
"""

from __future__ import annotations

import numpy as np
import torch as _torch

from elasticdeform_tpu import api as _api


def _to_numpy(t):
    """Host numpy view of a tensor; bfloat16 transits as float32.

    numpy has no native bfloat16, so ``.numpy()`` raises on bf16 tensors.
    The upcast is exact and the pipeline computes in float32 anyway;
    :func:`_from_numpy` casts results back, so deforming a bf16 tensor is
    bit-identical to deforming its f32 upcast and rounding once at the end
    — exactly what the JAX path does with a native bf16 input.
    """
    t = t.detach()
    if t.dtype == _torch.bfloat16:
        t = t.float()
    return t.cpu().numpy()


def _from_numpy(y, like):
    """Result tensor on ``like``'s device, restored to ``like``'s dtype.

    np.array copies: the api wrappers return numpy VIEWS of (read-only)
    JAX buffers; torch.as_tensor would share that memory and in-place
    torch ops on the result would be undefined behavior.
    """
    out = _torch.as_tensor(np.array(y), device=like.device)
    if like.dtype == _torch.bfloat16:
        out = out.to(_torch.bfloat16)
    return out


class ElasticDeform(_torch.autograd.Function):
    @staticmethod
    def forward(ctx, displacement, args, kwargs, *xs):
        # save_for_backward keeps autograd's version-counter checks: an
        # in-place edit of displacement between forward and backward raises
        # the standard autograd error instead of silently using stale data
        # (matches the reference shim, reference torch.py:9)
        ctx.save_for_backward(displacement)
        ctx.args = args
        ctx.kwargs = kwargs
        ctx.x_shapes = [tuple(x.shape) for x in xs]
        xs_numpy = [_to_numpy(x) for x in xs]
        displacement_numpy = _to_numpy(displacement)
        ys = _api.deform_grid(xs_numpy, displacement_numpy, *args, **kwargs)
        return tuple(_from_numpy(y, x) for x, y in zip(xs, ys))

    @staticmethod
    def backward(ctx, *dys):
        (displacement,) = ctx.saved_tensors
        displacement_numpy = _to_numpy(displacement)
        dys_numpy = [_to_numpy(dy) for dy in dys]
        dxs = _api.deform_grid_gradient(dys_numpy, displacement_numpy,
                                        *ctx.args, X_shape=ctx.x_shapes,
                                        **ctx.kwargs)
        dxs_torch = tuple(_from_numpy(dx, dy) for dx, dy in zip(dxs, dys))
        return (None, None, None) + dxs_torch


def deform_grid(X, displacement, *args, **kwargs):
    """Elastic deformation as a differentiable PyTorch op.

    See :func:`elasticdeform_tpu.deform_grid` for parameters
    (reference torch.py:33-66 for the wrapper semantics).
    """
    if not isinstance(X, (list, tuple)):
        Xs = [X]
    else:
        Xs = list(X)
    ys = ElasticDeform.apply(displacement, args, kwargs, *Xs)
    if isinstance(X, (list, tuple)):
        return list(ys)
    return ys[0]


class ElasticDeformBatch(_torch.autograd.Function):
    """Batched twin of :class:`ElasticDeform`: per-sample displacement
    grids, one device round-trip for the whole batch (the batched TPU
    kernels fold the batch into the window-table rows — far cheaper than
    a per-sample python loop). Backward is the backward-only batched
    adjoint (:func:`elasticdeform_tpu.api.deform_batch_gradient`); like
    the single-sample shim, no displacement gradient is returned."""

    @staticmethod
    def forward(ctx, displacement, kwargs, *xs):
        ctx.save_for_backward(displacement)
        ctx.kwargs = kwargs
        ctx.x_shapes = [tuple(x.shape[1:]) for x in xs]
        xs_numpy = [_to_numpy(x) for x in xs]
        displacement_numpy = _to_numpy(displacement)
        ys = _api.deform_batch(xs_numpy, displacement_numpy, **kwargs)
        return tuple(_from_numpy(y, x) for x, y in zip(xs, ys))

    @staticmethod
    def backward(ctx, *dys):
        (displacement,) = ctx.saved_tensors
        displacement_numpy = _to_numpy(displacement)
        dys_numpy = [_to_numpy(dy) for dy in dys]
        kwargs = {k: v for k, v in ctx.kwargs.items()
                  if k not in ("batch_impl", "table_dtype")}
        dxs = _api.deform_batch_gradient(dys_numpy, displacement_numpy,
                                         X_shape=ctx.x_shapes, **kwargs)
        dxs_torch = tuple(_from_numpy(dx, dy) for dx, dy in zip(dxs, dys))
        return (None, None) + dxs_torch


def deform_batch(X, displacement, **kwargs):
    """Batched elastic deformation as a differentiable PyTorch op.

    ``X``: ``(B, *image_shape)`` tensor (or list of such tensors sharing
    the deformation); ``displacement``: ``(B, naxis, *points)`` per-sample
    control grids. Keyword parameters follow
    :func:`elasticdeform_tpu.deform_batch`. Gradients flow to the image
    inputs only (the displacement gradient is not implemented, matching
    the single-sample shim and the reference, reference torch.py:29).
    """
    if not isinstance(X, (list, tuple)):
        Xs = [X]
    else:
        Xs = list(X)
    ys = ElasticDeformBatch.apply(displacement, kwargs, *Xs)
    if isinstance(X, (list, tuple)):
        return list(ys)
    return ys[0]


class MapCoordinates(_torch.autograd.Function):
    """General resampler (:func:`elasticdeform_tpu.api.map_coordinates`)
    as a differentiable PyTorch op. Gradients flow to the image input via
    the backward-only adjoint; like the displacement in the deform shims,
    the coordinates get no gradient here (use the JAX-native
    :func:`elasticdeform_tpu.map_coordinates` for coordinate gradients)."""

    @staticmethod
    def forward(ctx, coordinates, kwargs, x):
        ctx.save_for_backward(coordinates)
        ctx.kwargs = kwargs
        ctx.x_shape = tuple(x.shape)
        y = _api.map_coordinates(_to_numpy(x), _to_numpy(coordinates),
                                 **kwargs)
        return _from_numpy(y, x)

    @staticmethod
    def backward(ctx, dy):
        (coordinates,) = ctx.saved_tensors
        kwargs = {k: v for k, v in ctx.kwargs.items()
                  if k not in ("table_dtype",)}
        dx = _api.map_coordinates_gradient(
            _to_numpy(dy), _to_numpy(coordinates),
            X_shape=ctx.x_shape, **kwargs)
        return None, None, _from_numpy(dx, dy)


def map_coordinates(X, coordinates, **kwargs):
    """Resample a tensor at explicit coordinates as a differentiable
    PyTorch op (TPU-accelerated ``scipy.ndimage.map_coordinates``).

    ``X``: the input tensor; ``coordinates``: ``(naxis, *out_shape)``.
    Keyword parameters follow :func:`elasticdeform_tpu.map_coordinates`.
    Gradients flow to ``X`` only.
    """
    return MapCoordinates.apply(coordinates, kwargs, X)
