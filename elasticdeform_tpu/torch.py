"""PyTorch shim: autograd-capable elastic deformation.

Mirrors the reference ``elasticdeform.torch`` (reference torch.py:5-66): a
``torch.autograd.Function`` whose forward runs :func:`deform_grid` and whose
backward runs :func:`deform_grid_gradient`. Tensors are moved to the host,
deformed on the JAX default device (TPU), and returned on each input's
original torch device (reference torch.py:13-16). Like the reference, no
gradient is returned for the displacement (reference torch.py:29).
"""

from __future__ import annotations

import torch as _torch

from elasticdeform_tpu import api as _api


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
        xs_numpy = [x.detach().cpu().numpy() for x in xs]
        displacement_numpy = displacement.detach().cpu().numpy()
        ys = _api.deform_grid(xs_numpy, displacement_numpy, *args, **kwargs)
        return tuple(_torch.as_tensor(y, device=x.device)
                     for x, y in zip(xs, ys))

    @staticmethod
    def backward(ctx, *dys):
        (displacement,) = ctx.saved_tensors
        displacement_numpy = displacement.detach().cpu().numpy()
        dys_numpy = [dy.detach().cpu().numpy() for dy in dys]
        dxs = _api.deform_grid_gradient(dys_numpy, displacement_numpy,
                                        *ctx.args, X_shape=ctx.x_shapes,
                                        **ctx.kwargs)
        dxs_torch = tuple(_torch.as_tensor(dx, device=dy.device)
                          for dx, dy in zip(dxs, dys))
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
