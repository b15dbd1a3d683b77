"""Batched and mesh-sharded elastic augmentation.

The reference is strictly single-image, single-thread C (SURVEY.md §2: the
only concurrency artifact is releasing the GIL, reference deform.c:377-379).
On TPU, batching is first-class:

* :func:`batched_deform` — ``vmap`` over a leading batch axis with
  per-sample displacement grids (one compiled kernel for the whole batch),
* :func:`sharded_deform` — the same program laid out over a
  ``jax.sharding.Mesh`` batch axis with ``shard_map``; the deformation is
  per-sample independent, so the computation is embarrassingly parallel over
  ICI-connected chips with **zero collectives** in the op itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from elasticdeform_tpu import core as _core


def make_augmentation_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """A 1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def batched_deform(X, displacements, **kwargs):
    """Deform a batch of images with per-sample displacement grids.

    Args:
        X: array of shape ``(batch, *image_shape)`` (or a list of such
            arrays sharing the displacement).
        displacements: ``(batch, naxis, *points)`` per-sample control grids.
        **kwargs: forwarded to :func:`elasticdeform_tpu.deform_batch`
            (static).

    Returns the deformed batch (or list of batches). Uses the native
    batched kernels (see :func:`elasticdeform_tpu.deform_batch`).
    """
    return _core.deform_batch(X, displacements, **kwargs)


def batched_random_deform(key, X, sigma=25.0, points=3, **kwargs):
    """Random augmentation over a batch with per-sample random grids."""
    import jax.numpy as jnp
    xs = X[0] if isinstance(X, list) else X
    batch = xs.shape[0]
    naxis = len(kwargs.get("axis")) if kwargs.get("axis") is not None \
        else xs.ndim - 1
    if not isinstance(points, (list, tuple)):
        points = (points,) * naxis
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    displacement = jax.random.normal(
        key, (batch, naxis, *points), dtype=dtype) * sigma
    return _core.deform_batch(X, displacement, **kwargs)


def sharded_deform(mesh: Mesh, X, displacements, *, axis_name: str = "batch",
                   **kwargs):
    """Multi-chip batched deformation over a mesh batch axis.

    Uses ``shard_map`` so each chip runs the per-sample kernel on its local
    shard; no collectives are needed (the op is voxel-independent). The
    batch size must be divisible by the mesh axis size.
    """
    from jax import shard_map

    def local_fn(x, d):
        return batched_deform(x, d, **kwargs)

    n_spatial = X.ndim - 1
    d_spatial = displacements.ndim - 1
    in_specs = (P(axis_name, *([None] * n_spatial)),
                P(axis_name, *([None] * d_spatial)))
    out_specs = P(axis_name, *([None] * n_spatial))
    fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs)
    return fn(X, displacements)
