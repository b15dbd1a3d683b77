"""Spatially-sharded deformation of a single large volume (halo exchange).

The SURVEY.md §2/§5 stretch goal: when one volume does not fit (or should
not sit) on a single chip, shard it along its first deformed axis over a
``jax.sharding.Mesh`` and deform it cooperatively:

* each rank exchanges halo slabs with its ring neighbours via
  ``jax.lax.ppermute`` (one bidirectional exchange over ICI — the only
  collective in the op),
* the coarse displacement grid is replicated (it is tiny) and interpolated
  at *global* output positions with a dynamically-offset variant of the
  displacement matrices,
* each rank resamples its extended slab with the same window-gather kernel
  used everywhere else; coordinates are mapped in the global frame and
  shifted into slab-local indices.

Correctness contract: the per-voxel displacement along the sharded axis
must satisfy ``|displacement| <= max_displacement`` (a static bound that
sizes the halo). Exceeding it silently clamps to the halo edge. When
``prefilter`` is on, the halo is widened so the slab-local IIR prefilter
agrees with the global one to ~1e-7 (the filter poles decay by |p| ~ 0.268
per sample for cubic splines).

Supported surface (round 1): single input, ``mode in ('mirror',
'constant')`` (the pre-SciPy-1.6 tap folding is mirror, so mirror halos at
the global edges reproduce the exact semantics), no crop/affine. Other
modes/features: use batch-parallel :func:`sharded_deform` or a single chip.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from elasticdeform_tpu.ops import modes as _modes
from elasticdeform_tpu.ops.bspline import filter_start, spline_weights
from elasticdeform_tpu.ops.deform import (
    _prefilter_displacement, default_compute_dtype,
)
from elasticdeform_tpu.ops.displacement import displacement_matrix
from elasticdeform_tpu.ops.prefilter import spline_filter1d
from elasticdeform_tpu.ops.resample import pad_amount, cast_output
from elasticdeform_tpu.ops.windows import (
    window_plan, window_pad_indices, resample_windows,
)

_DORDER = 3
_PREFILTER_HALO = 16  # |pole|^16 < 1e-9 for all spline orders' poles


def _dense_displacement_offset(disp_f, out_spatial, global_shape, row0, cdt):
    """Dense displacement with a *traced* offset along axis 0.

    Same math as ops.displacement.dense_displacement, but the axis-0
    interpolation weights are computed from ``local_row + row0`` (row0 is a
    traced per-rank scalar), building the (s, ncp) weight matrix on the fly
    with one-hot scatters instead of a host-precomputed constant.
    """
    naxis = len(out_spatial)
    out = jnp.asarray(disp_f, dtype=cdt)
    # axis 0: dynamic offset
    ncp0 = out.shape[1]
    jj = jnp.arange(out_spatial[0], dtype=cdt) + row0.astype(cdt)
    cp = (ncp0 - 1) * jj / (global_shape[0] - 1)
    start = filter_start(cp, _DORDER).astype(jnp.int32)
    taps = spline_weights(cp, _DORDER)
    W0 = jnp.zeros((out_spatial[0], ncp0), dtype=cdt)
    s2 = 2 * ncp0 - 2
    for l, w in enumerate(taps):
        idx = start + l
        if ncp0 > 1:
            m = jnp.mod(idx, s2)
            idx = jnp.where(m >= ncp0, s2 - m, m)
        else:
            idx = jnp.zeros_like(idx)
        W0 = W0 + w[:, None] * jax.nn.one_hot(idx, ncp0, dtype=cdt)
    out = jnp.moveaxis(
        jnp.tensordot(W0, out, axes=[[1], [1]],
                      precision=jax.lax.Precision.HIGHEST), 0, 1)
    # remaining axes: static matrices
    for h in range(1, naxis):
        W = displacement_matrix(out_spatial[h], out.shape[h + 1],
                                global_shape[h], 0)
        out = jnp.moveaxis(
            jnp.tensordot(jnp.asarray(W, dtype=cdt), out,
                          axes=[[1], [h + 1]],
                          precision=jax.lax.Precision.HIGHEST), 0, h + 1)
    return out


def sharded_deform_spatial(mesh: Mesh, x, displacement, *,
                           max_displacement: float, order: int = 3,
                           mode: str = 'mirror', cval: float = 0.0,
                           prefilter: bool = True,
                           axis_name: str = "shard"):
    """Deform ONE volume sharded along axis 0 across the mesh.

    Args:
        mesh: 1-D mesh whose ``axis_name`` axis shards the volume's axis 0.
        x: (S0, ...) array; S0 must be divisible by the mesh axis size.
        displacement: (naxis, *points) control grid (replicated).
        max_displacement: static bound on |displacement| along axis 0, in
            voxels — sizes the halo exchange.
        order/mode/cval/prefilter: as in :func:`elasticdeform_tpu.deform`;
            mode must be 'mirror' or 'constant'.

    Returns the deformed volume, sharded like the input.
    """
    mode_code = _modes.mode_to_code(mode)
    if mode_code not in (_modes.MODE_MIRROR, _modes.MODE_CONSTANT):
        raise NotImplementedError(
            "spatial sharding supports mode 'mirror' or 'constant'; use "
            "batch-parallel sharding or a single chip for other modes")
    n = mesh.shape[axis_name]
    global_shape = tuple(int(d) for d in x.shape)
    naxis = len(global_shape)
    assert displacement.shape[0] == naxis
    S0 = global_shape[0]
    assert S0 % n == 0, "axis 0 must divide evenly over the mesh"
    s = S0 // n
    halo = int(math.ceil(max_displacement)) + order + 2
    if prefilter and order > 1:
        halo += _PREFILTER_HALO
    assert halo <= s, (
        f"halo ({halo}) must fit in one shard ({s}); use fewer shards or a "
        f"smaller max_displacement")

    cdt = default_compute_dtype(x.dtype, displacement.dtype)
    plan = window_plan(naxis, order)
    assert plan is not None
    n_lead, widths, strides = plan
    pad = pad_amount(order)

    def local_fn(x_local, disp):
        x_local = x_local.astype(cdt)
        r = jax.lax.axis_index(axis_name)
        row0 = (r * s).astype(jnp.int32)

        # --- halo exchange over the ring (ICI) ---
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        from_left = jax.lax.ppermute(x_local[-halo:], axis_name, fwd)
        from_right = jax.lax.ppermute(x_local[:halo], axis_name, bwd)
        # global-edge ranks replace the ring halo with the mirror extension
        # (the reference's tap folding is always mirror)
        mirror_left = x_local[1:halo + 1][::-1]
        mirror_right = x_local[-halo - 1:-1][::-1]
        left = jnp.where(r == 0, mirror_left, from_left)
        right = jnp.where(r == n - 1, mirror_right, from_right)
        slab = jnp.concatenate([left, x_local, right], axis=0)

        # --- prefilter (slab-local; halo absorbs the IIR tail) ---
        if prefilter and order > 1:
            for d in range(naxis):
                slab = spline_filter1d(slab, order, d)
        disp_f = _prefilter_displacement(disp, cdt)

        # --- dense displacement at global output positions ---
        out_spatial = (s,) + global_shape[1:]
        displ = _dense_displacement_offset(disp_f, out_spatial, global_shape,
                                           row0, cdt)

        # --- coordinates: global frame, then slab-local ---
        coords = [jax.lax.broadcasted_iota(cdt, out_spatial, h)
                  for h in range(naxis)]
        cc = [coords[h] + displ[h] for h in range(naxis)]
        cc[0] = cc[0] + row0.astype(cdt)
        mapped = []
        inside = None
        for h in range(naxis):
            m, ins = _modes.map_coordinate(cc[h], global_shape[h], mode_code)
            mapped.append(m)
            if mode_code == _modes.MODE_CONSTANT:
                inside = ins if inside is None else inside & ins
        # slab-local along axis 0 (clamped to the halo extent)
        local0 = mapped[0] - row0.astype(cdt) + halo
        mapped[0] = jnp.clip(local0, 0, slab.shape[0] - 1)

        # --- resample the slab with the window kernel ---
        xp = slab[..., None]
        slab_spatial = xp.shape[:-1]
        for h in range(naxis):
            extra = widths[h - n_lead] if h >= n_lead else 0
            idx = window_pad_indices(slab_spatial[h], pad, extra)
            xp = jnp.take(xp, jnp.asarray(idx), axis=h)
        y = resample_windows(xp, mapped, inside, order, out_spatial, cdt,
                             pad)
        y = y[..., 0]
        if inside is not None:
            y = y + jnp.where(inside, jnp.zeros((), cdt),
                              jnp.asarray(cval, cdt))
        return y

    from jax import shard_map
    spec_in = P(axis_name, *([None] * (naxis - 1)))
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(spec_in, P(*([None] * (naxis + 1)))),
                   out_specs=spec_in)
    out = fn(jnp.asarray(x), jnp.asarray(displacement))
    return cast_output(out, np.dtype(x.dtype))
