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

Boundary modes: all five are supported. The reference's tap folding is
always mirror (reference deform.c:791-813), so mirror slabs at the global
edges serve mirror/reflect/nearest/constant directly — their coordinate
mapping keeps folded samples near the *same* edge. ``wrap`` (pre-SciPy-1.6
period ``len-1``, reference deform.c:75-79) maps edge overshoot to the
*opposite* end of the volume; those samples are served by two small seam
strips (the volume's head and tail) that ride the existing ring exchange
(rank n-1's right-neighbour halo IS the volume head, rank 0's left
neighbour halo IS the tail) and are concatenated onto the slab so
resampling stays a single window-gather pass.

Correctness contract: the per-voxel displacement along the sharded axis
must satisfy ``|displacement| <= max_displacement`` (a static bound that
sizes the halo). Pass ``validate=True`` (eager calls) or run
:func:`validate_max_displacement` to check the bound against the exact
dense field; without validation, exceeding the bound clamps to the halo
edge. When ``prefilter`` is on, the halo is widened per order so the
slab-local IIR prefilter agrees with the global one to ~1e-9 of the
coefficient scale.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from elasticdeform_tpu.ops import modes as _modes
from elasticdeform_tpu._normalize import _check
from elasticdeform_tpu.ops.bspline import filter_start, spline_weights
from elasticdeform_tpu.ops.deform import (
    _prefilter_displacement, default_compute_dtype,
)
from elasticdeform_tpu.ops.displacement import (
    dense_displacement, displacement_matrix,
)
from elasticdeform_tpu.ops.prefilter import (
    spline_filter1d, spline_filter1d_select,
)
from elasticdeform_tpu.ops.resample import pad_amount, cast_output
from elasticdeform_tpu.ops.windows import (
    window_plan, window_pad_axis, window_pad_indices, resample_windows,
)

_DORDER = 3


def _prefilter_pad_block(block, naxis, order, prefilter, plan, pad):
    """Prefilter + window-pad one shard block ((*spatial, 1) layout).

    When an axis runs a prefilter matmul, the window padding folds into
    it as a row selection of the filter matrix — one kernel per axis,
    bit-identical to filter-then-pad (duplicated rows compute the same
    inner products; see ops.prefilter.spline_filter1d_select). Axes
    without a filter keep the concat pad.
    """
    from elasticdeform_tpu.ops.prefilter import use_scan_filter

    n_lead, widths, _ = plan
    for d in range(naxis):
        extra = widths[d - n_lead] if d >= n_lead else 0
        if prefilter and order > 1 and \
                not use_scan_filter(block.shape[d], order):
            idx = window_pad_indices(block.shape[d], pad, extra)
            block = spline_filter1d_select(block, order, d, idx)
        elif prefilter and order > 1:
            # huge per-shard axis: O(log n) scan filter + concat pad
            # instead of the O(n^2) fused filter-matrix row selection
            block = spline_filter1d(block, order, d)
            block = window_pad_axis(block, d, pad, extra)
        else:
            block = window_pad_axis(block, d, pad, extra)
    return block

# slab-local prefilter halo per order: ceil(ln(1e-9) / ln(|p_max|)) for the
# largest IIR pole of each order (reference deform.c:1063-1084 poles:
# order 2 |p|=0.1716, 3: 0.2679, 4: 0.3613, 5: 0.4306); the slab-local
# prefilter then agrees with the global one to ~1e-9 of coefficient scale
_PREFILTER_HALO = {2: 12, 3: 16, 4: 22, 5: 26}


def validate_max_displacement(displacement, max_displacement,
                              global_shape) -> float:
    """Check the exact dense axis-0 displacement against the halo bound.

    Computes the dense (post-prefilter, order-3) displacement field for
    component 0 over the full volume — the same field the sharded op uses —
    and raises ``ValueError`` if ``|field| > max_displacement`` anywhere.
    Returns the measured maximum. Eager-only (not jit-traceable).
    """
    displacement = np.asarray(displacement)
    cdt = default_compute_dtype(displacement.dtype)
    disp_f = _prefilter_displacement(displacement[0:1], cdt)
    d0 = dense_displacement(disp_f, tuple(global_shape), tuple(global_shape),
                            (0,) * len(global_shape), cdt)[0]
    mx = float(jnp.max(jnp.abs(d0)))
    if mx > max_displacement:
        raise ValueError(
            f"displacement along the sharded axis reaches {mx:.4f}, above "
            f"the declared max_displacement={max_displacement}; the halo "
            "would clamp — increase max_displacement")
    return mx


def _dynamic_weight_matrix(odim, ncp, idim, row0, cdt):
    """(odim, ncp) order-3 interpolation matrix for a *traced* offset.

    Same math as ops.displacement.displacement_matrix but built on device
    with one-hot scatters, since ``row0`` (the rank's global offset) is a
    traced scalar rather than a host constant.
    """
    jj = jnp.arange(odim, dtype=cdt) + row0.astype(cdt)
    cp = (ncp - 1) * jj / (idim - 1)
    start = filter_start(cp, _DORDER).astype(jnp.int32)
    taps = spline_weights(cp, _DORDER)
    W = jnp.zeros((odim, ncp), dtype=cdt)
    s2 = 2 * ncp - 2
    for l, w in enumerate(taps):
        idx = start + l
        if ncp > 1:
            m = jnp.mod(idx, s2)
            idx = jnp.where(m >= ncp, s2 - m, m)
        else:
            idx = jnp.zeros_like(idx)
        W = W + w[:, None] * jax.nn.one_hot(idx, ncp, dtype=cdt)
    return W


def _dense_displacement_offsets(disp_f, out_spatial, global_shape, row0s,
                                cdt):
    """Dense displacement with traced or static offsets per axis.

    ``row0s[h]`` is the rank's global offset along axis ``h``: a traced
    scalar for sharded axes, a Python int for static (crop) offsets, or
    None for plain unsharded axes (offset 0) — the latter two use the
    host-precomputed static matrices.
    """
    naxis = len(out_spatial)
    out = jnp.asarray(disp_f, dtype=cdt)
    for h in range(naxis):
        if row0s[h] is not None and not isinstance(row0s[h], int):
            W = _dynamic_weight_matrix(out_spatial[h], out.shape[h + 1],
                                       global_shape[h], row0s[h], cdt)
        else:
            W = jnp.asarray(displacement_matrix(
                out_spatial[h], out.shape[h + 1], global_shape[h],
                row0s[h] or 0), dtype=cdt)
        out = jnp.moveaxis(
            jnp.tensordot(W, out, axes=[[1], [h + 1]],
                          precision=jax.lax.Precision.HIGHEST), 0, h + 1)
    return out


def _dense_displacement_offset(disp_f, out_spatial, global_shape, row0, cdt):
    """Dense displacement with a traced offset along axis 0 only."""
    row0s = [row0] + [None] * (len(out_spatial) - 1)
    return _dense_displacement_offsets(disp_f, out_spatial, global_shape,
                                       row0s, cdt)


def _normalize_crop(crop, global_shape):
    """Per-axis (start, stop) from a list of slices (reference crop rules:
    plain non-negative start/stop, no step — deform_grid.py:335-346)."""
    naxis = len(global_shape)
    _check(isinstance(crop, (list, tuple)) and len(crop) == naxis,
           "crop must be a list with one slice per volume axis")
    bounds = []
    for h, sl in enumerate(crop):
        if sl is None:
            sl = slice(None)
        _check(isinstance(sl, slice) and sl.step in (None, 1),
               "crop slices must be plain slice(start, stop)")
        start = 0 if sl.start is None else int(sl.start)
        stop = global_shape[h] if sl.stop is None else int(sl.stop)
        _check(0 <= start < stop <= global_shape[h],
               f"crop slice {sl} out of range for axis {h} "
               f"({global_shape[h]})")
        bounds.append((start, stop))
    return bounds


def _spatial_crop_impl(mesh, x, displacement, max_displacement, order, mode,
                       cval, prefilter, axis_name, validate, crop):
    """Cropped sharded deformation: replicated-window strategy.

    With ``crop``, each rank's output slab is a window of the *cropped*
    output, whose source voxels live in the static global input window
    ``W = [start0 - halo, stop0 + halo)`` — generally NOT aligned with the
    input sharding. Instead of an irregular exchange, the (small) window is
    assembled on every rank by ONE ``all_gather`` of fixed-size shard
    pieces; each rank then resamples its own output rows from the
    replicated window with static-offset displacement matrices
    (the crop geometry of reference deform_grid.py:328-354 + deform.c:643,
    655, applied per rank). Memory per rank is the window, not the volume —
    the intended crop use case (small output from a big sharded volume).

    ``wrap`` mode is not supported with crop (folded samples would need
    seam windows at the far edges; use the uncropped path or crop on the
    host side).
    """
    is_list = isinstance(x, (list, tuple))
    xs = [jnp.asarray(a) for a in (x if is_list else [x])]
    cvals = list(cval) if isinstance(cval, (list, tuple)) \
        else [cval] * len(xs)
    assert len(cvals) == len(xs)
    for a in xs[1:]:
        _check(a.shape == xs[0].shape,
               "all inputs must share the (deformed) shape")

    mode_code = _modes.mode_to_code(mode)
    if mode_code == _modes.MODE_WRAP:
        raise NotImplementedError(
            "crop is not supported with mode='wrap' in the sharded spatial "
            "path (wrap-folded samples land outside the crop window)")
    n = mesh.shape[axis_name]
    global_shape = tuple(int(d) for d in xs[0].shape)
    naxis = len(global_shape)
    assert displacement.shape[0] == naxis
    bounds = _normalize_crop(crop, global_shape)
    start0, stop0 = bounds[0]
    out0 = stop0 - start0
    _check(out0 % n == 0,
           "the cropped extent of axis 0 must divide evenly over the mesh")
    s_out = out0 // n
    S0 = global_shape[0]
    _check(S0 % n == 0, "axis 0 must divide evenly over the mesh")
    s_in = S0 // n
    halo = int(math.ceil(max_displacement)) + order + 2
    if prefilter and order > 1:
        halo += _PREFILTER_HALO[order]

    if validate:
        if isinstance(displacement, jax.core.Tracer):
            raise ValueError(
                "validate=True needs a concrete displacement; under jit "
                "call validate_max_displacement(...) outside the trace")
        validate_max_displacement(np.asarray(displacement),
                                  max_displacement, global_shape)

    # static input window along axis 0 and its assembly from shard pieces
    W_lo = max(0, start0 - halo)
    W_hi = min(S0, stop0 + halo)
    W_len = W_hi - W_lo
    piece_cap = min(s_in, W_len)
    q_lo, q_hi = W_lo // s_in, (W_hi - 1) // s_in

    def _piece_lo(q):
        # start of the fixed-size piece rank q contributes: a window of its
        # shard that CONTAINS its intersection with W
        return max(0, min(W_lo - q * s_in, s_in - piece_cap))

    cdt = default_compute_dtype(*([a.dtype for a in xs]
                                  + [displacement.dtype]))
    plan = window_plan(naxis, order)
    assert plan is not None
    n_lead, widths, strides = plan
    pad = pad_amount(order)

    def _pp_block(block):
        return _prefilter_pad_block(block, naxis, order, prefilter,
                                    plan, pad)

    out_spatial = (s_out,) + tuple(b - a for a, b in bounds[1:])

    def local_fn(disp, *x_locals):
        r = jax.lax.axis_index(axis_name)
        lo_r = jnp.clip(W_lo - r * s_in, 0, s_in - piece_cap
                        ).astype(jnp.int32)

        slabs = []
        for x_local in x_locals:
            piece = jax.lax.dynamic_slice_in_dim(
                x_local.astype(cdt), lo_r, piece_cap, axis=0)
            gathered = jax.lax.all_gather(piece, axis_name)  # (n, cap, ...)
            segs = []
            for q in range(q_lo, q_hi + 1):
                g0 = max(W_lo, q * s_in)
                g1 = min(W_hi, (q + 1) * s_in)
                p0 = g0 - q * s_in - _piece_lo(q)
                segs.append(jax.lax.slice_in_dim(
                    gathered[q], p0, p0 + (g1 - g0), axis=0))
            W = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=0)
            # window-pad + prefilter the replicated window. At true volume
            # edges (W_lo == 0 / W_hi == S0) the mirror padding and the
            # prefilter's edge handling are semantically correct; at
            # interior cuts the nearest *used* coefficient is >= order + 2
            # taps away from the cut (+ _PREFILTER_HALO when prefiltering),
            # so neither the fake padding nor the IIR boundary init is
            # visible at 1e-9
            slabs.append(_pp_block(W[..., None]))
        disp_f = _prefilter_displacement(disp, cdt)

        # dense displacement at global output positions: axis 0 offset is
        # start0 + r*s_out (traced), other axes use the static crop offsets
        row0 = (r * s_out + start0).astype(jnp.int32)
        row0s = [row0] + [a for a, _ in bounds[1:]]
        displ = _dense_displacement_offsets(disp_f, out_spatial,
                                            global_shape, row0s, cdt)

        coords = [jax.lax.broadcasted_iota(cdt, out_spatial, h)
                  for h in range(naxis)]
        cc = [coords[h] + displ[h] for h in range(naxis)]
        cc[0] = cc[0] + row0.astype(cdt)
        for h in range(1, naxis):
            cc[h] = cc[h] + bounds[h][0]
        mapped = []
        inside = None
        for h in range(naxis):
            m, ins = _modes.map_coordinate(cc[h], global_shape[h], mode_code)
            mapped.append(m)
            if mode_code == _modes.MODE_CONSTANT:
                inside = ins if inside is None else inside & ins
        # window-local along axis 0
        mapped[0] = jnp.clip(mapped[0] - W_lo, 0, W_len - 1)

        ys = []
        for xp, cv in zip(slabs, cvals):
            y = resample_windows(xp, mapped, inside, order, out_spatial,
                                 cdt, pad)[..., 0]
            if inside is not None:
                y = y + jnp.where(inside, jnp.zeros((), cdt),
                                  jnp.asarray(cv, cdt))
            ys.append(y)
        return tuple(ys)

    from jax import shard_map
    spec_x = P(axis_name, *([None] * (naxis - 1)))
    spec_d = P(*([None] * (naxis + 1)))
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(spec_d,) + (spec_x,) * len(xs),
                   out_specs=(spec_x,) * len(xs))
    outs = fn(jnp.asarray(displacement), *xs)
    outs = [cast_output(o, np.dtype(a.dtype)) for o, a in zip(outs, xs)]
    return list(outs) if is_list else outs[0]


def _spatial_impl(mesh, x, displacement, max_displacement, order, mode,
                  cval, prefilter, axis_name, validate, batch_axis,
                  dense_field=False):
    """``dense_field=True``: ``displacement`` is the dense per-voxel field
    ((B,) naxis, S0, ...) sharded along the volume axis with the input —
    each rank consumes its own slab directly (no grid interpolation),
    serving :func:`sharded_deform_field_spatial`."""
    batched = batch_axis is not None
    is_list = isinstance(x, (list, tuple))
    xs = [jnp.asarray(a) for a in (x if is_list else [x])]
    cvals = list(cval) if isinstance(cval, (list, tuple)) \
        else [cval] * len(xs)
    assert len(cvals) == len(xs)
    for a in xs[1:]:
        _check(a.shape == xs[0].shape,
               "all inputs must share the (deformed) shape")

    mode_code = _modes.mode_to_code(mode)
    wrap = mode_code == _modes.MODE_WRAP
    n = mesh.shape[axis_name]
    global_shape = tuple(int(d) for d in
                         (xs[0].shape[1:] if batched else xs[0].shape))
    naxis = len(global_shape)
    assert displacement.shape[1 if batched else 0] == naxis
    S0 = global_shape[0]
    _check(S0 % n == 0, "axis 0 must divide evenly over the mesh")
    s = S0 // n
    halo = int(math.ceil(max_displacement)) + order + 2
    if prefilter and order > 1:
        halo += _PREFILTER_HALO[order]
    # the global-edge mirror slabs read x_local[1:halo+1], so the halo must
    # be strictly smaller than one shard
    _check(halo + 1 <= s,
           f"halo ({halo}) + 1 must fit in one shard ({s}); use fewer "
           "shards or a smaller max_displacement")

    if dense_field:
        exp = ((naxis,) + global_shape)
        got = tuple(int(d) for d in displacement.shape[1 if batched else 0:])
        if got != exp:
            raise ValueError(
                f"dense field must have shape "
                f"{'(B, ' if batched else '('}naxis, *volume_shape); got "
                f"trailing {got}, expected {exp}")

    if validate:
        if isinstance(displacement, jax.core.Tracer):
            raise ValueError(
                "validate=True needs a concrete displacement; under jit "
                "call validate_max_displacement(...) outside the trace")
        if dense_field:
            # device-side reduction: the field is volume-sized (and may be
            # sharded) — only the scalar max comes to the host
            worst = float(jnp.abs(
                displacement[:, 0] if batched else displacement[0]).max())
            if worst > max_displacement:
                raise ValueError(
                    f"dense field exceeds max_displacement along the "
                    f"sharded axis: |field| up to {worst} > "
                    f"{max_displacement}")
        else:
            disp_np = np.asarray(displacement)
            for d_s in (disp_np if batched else [disp_np]):
                validate_max_displacement(d_s, max_displacement,
                                          global_shape)

    cdt = default_compute_dtype(*( [a.dtype for a in xs]
                                   + [displacement.dtype]))
    plan = window_plan(naxis, order)
    assert plan is not None
    n_lead, widths, strides = plan
    pad = pad_amount(order)
    extra0 = widths[0 - n_lead] if 0 >= n_lead else 0

    def _pp_block(block):
        return _prefilter_pad_block(block, naxis, order, prefilter,
                                    plan, pad)

    def local_fn(disp, *x_locals):
        r = jax.lax.axis_index(axis_name)
        row0 = (r * s).astype(jnp.int32)

        # --- halo exchange over the ring (ICI), per input ---
        fwd = [(i, (i + 1) % n) for i in range(n)]
        bwd = [(i, (i - 1) % n) for i in range(n)]
        slabs = []
        for x_local in x_locals:
            x_local = x_local.astype(cdt)
            from_left = jax.lax.ppermute(x_local[-halo:], axis_name, fwd)
            from_right = jax.lax.ppermute(x_local[:halo], axis_name, bwd)
            # global-edge ranks replace the ring halo with the mirror
            # extension (the reference's tap folding is always mirror)
            mirror_left = x_local[1:halo + 1][::-1]
            mirror_right = x_local[-halo - 1:-1][::-1]
            left = jnp.where(r == 0, mirror_left, from_left)
            right = jnp.where(r == n - 1, mirror_right, from_right)
            slab = jnp.concatenate([left, x_local, right], axis=0)
            # --- prefilter (slab-local; halo absorbs the IIR tail) ---
            xp = _pp_block(slab[..., None])
            if wrap:
                # seam strips: rank n-1's from_right IS the volume head,
                # rank 0's from_left IS the volume tail; on other ranks the
                # strip content is unused (their voxels never cross-fold)
                head = _pp_block(from_right[..., None])
                tail = _pp_block(from_left[..., None])
                xp = jnp.concatenate([xp, head, tail], axis=0)
            slabs.append(xp)
        out_spatial = (s,) + global_shape[1:]
        if dense_field:
            # the rank's own slab of the caller's field IS the dense
            # displacement at its global output positions
            displ = disp.astype(cdt)
        else:
            # --- dense displacement at global output positions ---
            disp_f = _prefilter_displacement(disp, cdt)
            displ = _dense_displacement_offset(disp_f, out_spatial,
                                               global_shape, row0, cdt)

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
        slab_len = s + 2 * halo
        local0 = mapped[0] - row0.astype(cdt) + halo
        coord0 = jnp.clip(local0, 0, slab_len - 1)
        if wrap:
            # EVERY wrap-folded sample goes to a seam strip — selected by
            # the fold condition on the unfolded coordinate, not by slab
            # bounds: a folded coordinate can land just inside the slab
            # where its taps would overrun into the slab's edge padding
            L_main = slab_len + 2 * pad + extra0
            L_strip = halo + 2 * pad + extra0
            head_c = L_main + mapped[0]
            tail_c = L_main + L_strip + (mapped[0] - (S0 - halo))
            coord0 = jnp.where(cc[0] > S0 - 1, head_c,
                               jnp.where(cc[0] < 0, tail_c, coord0))
        mapped[0] = coord0

        # --- resample the slabs with the window kernel ---
        ys = []
        for xp, cv in zip(slabs, cvals):
            y = resample_windows(xp, mapped, inside, order, out_spatial,
                                 cdt, pad)[..., 0]
            if inside is not None:
                y = y + jnp.where(inside, jnp.zeros((), cdt),
                                  jnp.asarray(cv, cdt))
            ys.append(y)
        return tuple(ys)

    from jax import shard_map
    if batched:
        # per-sample grids: vmap the single-volume body over the local
        # batch; the ring ppermute batches through vmap, so one exchange
        # moves every local sample's halo
        body = jax.vmap(local_fn)
        spec_x = P(batch_axis, axis_name, *([None] * (naxis - 1)))
        spec_d = P(batch_axis, None, axis_name, *([None] * (naxis - 1))) \
            if dense_field else P(batch_axis, *([None] * (naxis + 1)))
    else:
        body = local_fn
        spec_x = P(axis_name, *([None] * (naxis - 1)))
        spec_d = P(None, axis_name, *([None] * (naxis - 1))) \
            if dense_field else P(*([None] * (naxis + 1)))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_d,) + (spec_x,) * len(xs),
                   out_specs=(spec_x,) * len(xs))
    outs = fn(jnp.asarray(displacement), *xs)
    outs = [cast_output(o, np.dtype(a.dtype)) for o, a in zip(outs, xs)]
    return list(outs) if is_list else outs[0]


def sharded_deform_spatial(mesh: Mesh, x, displacement, *,
                           max_displacement: float, order: int = 3,
                           mode: str = 'mirror', cval=0.0,
                           crop=None, prefilter: bool = True,
                           axis_name: str = "shard",
                           validate: bool = False):
    """Deform one volume (or a list sharing the deformation) sharded along
    axis 0 across the mesh.

    Args:
        mesh: 1-D mesh whose ``axis_name`` axis shards the volume's axis 0.
        x: (S0, ...) array, or a list of same-shaped arrays (shared
            deformation, like the reference's multi-input ``deform_grid``);
            S0 must be divisible by the mesh axis size.
        displacement: (naxis, *points) control grid (replicated).
        max_displacement: static bound on |displacement| along axis 0, in
            voxels — sizes the halo exchange.
        order/mode/cval/prefilter: as in :func:`elasticdeform_tpu.deform`;
            all five boundary modes are supported (one shared mode; ``cval``
            may be a list per input).
        crop: optional list of ``slice(start, stop)`` per volume axis —
            compute only that output window, in full-volume deformation
            coordinates (the semantics of ``deform_grid``'s ``crop``). The
            cropped extent of axis 0 must divide over the mesh; the source
            window is replicated per rank via one ``all_gather`` (memory =
            window size, not volume size). Not supported with
            ``mode='wrap'``.
        validate: check ``max_displacement`` against the exact dense field
            before running (eager calls only; raises on violation).

    Restrictions vs the single-device path: ``affine``/``rotate``/``zoom``
    are not available here — an affine mixes axes, so the slab a rank needs
    is no longer local to its shard (for rotated crops of a sharded volume,
    run :func:`elasticdeform_tpu.deform` on a replicated copy, or
    batch-parallelize with :func:`batched_deform` instead). Per-input
    ``order``/``mode`` are also not supported (one shared deformation
    geometry per call).

    Returns the deformed volume(s), sharded like the input.
    """
    if crop is not None:
        return _spatial_crop_impl(mesh, x, displacement, max_displacement,
                                  order, mode, cval, prefilter, axis_name,
                                  validate, crop)
    return _spatial_impl(mesh, x, displacement, max_displacement, order,
                         mode, cval, prefilter, axis_name, validate, None)


def sharded_deform_batched_spatial(mesh: Mesh, x, displacement, *,
                                   max_displacement: float, order: int = 3,
                                   mode: str = 'mirror', cval=0.0,
                                   prefilter: bool = True,
                                   batch_axis: str = "batch",
                                   shard_axis: str = "shard",
                                   validate: bool = False):
    """Hybrid data-parallel + spatially-sharded deformation over a 2-D mesh.

    The full parallelism matrix for large-volume training: samples are
    data-parallel over ``batch_axis`` while EACH sample's volume is
    spatially sharded over ``shard_axis`` with ring halo exchange — the
    configuration for volumes too large for one chip at batch > 1.

    Args:
        mesh: 2-D mesh with axes ``batch_axis`` and ``shard_axis``.
        x: (B, S0, ...) array (or list of same-shaped arrays); B must
            divide over ``batch_axis``, S0 over ``shard_axis``.
        displacement: (B, naxis, *points) per-sample control grids.
        Remaining arguments as in :func:`sharded_deform_spatial`
        (``validate`` checks every sample's grid).

    Returns the deformed batch, sharded like the input.
    """
    return _spatial_impl(mesh, x, displacement, max_displacement, order,
                         mode, cval, prefilter, shard_axis, validate,
                         batch_axis)


def sharded_deform_field_spatial(mesh: Mesh, x, field, *,
                                 max_displacement: float, order: int = 3,
                                 mode: str = 'mirror', cval=0.0,
                                 prefilter: bool = True,
                                 axis_name: str = "shard",
                                 validate: bool = False):
    """Warp a spatially-sharded volume with a dense displacement field.

    The sharded counterpart of :func:`elasticdeform_tpu.deform_field`:
    ``field`` has shape ``(naxis, *x.shape)`` and is sharded along the
    volume axis *with* the volume (each rank holds the field slab for its
    own output voxels, so no interpolation or gathering of the field is
    needed) — output voxel ``v`` takes the input interpolated at
    ``v + field[:, v]``. Registration-style warps of volumes too large
    for one chip. ``max_displacement`` bounds ``|field[0]|`` (the sharded
    axis) and sizes the halo exchange; other parameters and the
    restrictions (no affine, one shared mode) follow
    :func:`sharded_deform_spatial`.

    Returns the warped volume(s), sharded like the input.
    """
    return _spatial_impl(mesh, x, field, max_displacement, order, mode,
                         cval, prefilter, axis_name, validate, None,
                         dense_field=True)


def sharded_deform_field_batched_spatial(mesh: Mesh, x, field, *,
                                         max_displacement: float,
                                         order: int = 3,
                                         mode: str = 'mirror', cval=0.0,
                                         prefilter: bool = True,
                                         batch_axis: str = "batch",
                                         shard_axis: str = "shard",
                                         validate: bool = False):
    """Hybrid batched + spatially-sharded dense-field warp over a 2-D mesh.

    ``x``: (B, S0, ...) with B over ``batch_axis`` and S0 over
    ``shard_axis``; ``field``: (B, naxis, S0, ...) per-sample dense
    fields, sharded along the volume axis with the volume. The batched
    registration warp for volumes too large for one chip — cf.
    :func:`sharded_deform_batched_spatial`.
    """
    return _spatial_impl(mesh, x, field, max_displacement, order, mode,
                         cval, prefilter, shard_axis, validate, batch_axis,
                         dense_field=True)


def sharded_deform_spatial_nd(mesh: Mesh, x, displacement, *,
                              max_displacement: float, order: int = 3,
                              mode: str = 'mirror', cval=0.0,
                              prefilter: bool = True,
                              axis_names=("shard0", "shard1"),
                              validate: bool = False):
    """Deform one volume sharded along its first ``len(axis_names)`` axes.

    Multi-axis volume decomposition: volume axis ``k`` is sharded over mesh
    axis ``axis_names[k]``. Halo exchange runs one bidirectional ring
    ``ppermute`` per sharded axis, each on the tile already extended by the
    previous axes' halos — so corner halos arrive without extra
    communication steps. All five boundary modes are supported;
    ``wrap`` concatenates per-axis cross-volume seam strips (head/tail of
    each sharded axis) that ride the same ring exchanges, with corner seam
    blocks arriving by two-hop relay — each of the ``3^K`` blocks is
    prefiltered and window-padded separately so the IIR never leaks across
    unrelated content.

    Args:
        mesh: mesh containing every name in ``axis_names``.
        x: volume (or list of same-shaped volumes sharing the deformation);
            axis ``k`` must divide over ``axis_names[k]``.
        displacement: (naxis, *points) control grid (replicated).
        max_displacement: static bound on |displacement| along EVERY
            sharded axis — sizes the halos.
        validate: check the bound against the exact dense field for every
            sharded component (eager calls only).

    Returns the deformed volume(s), sharded like the input.
    """
    return _spatial_nd_impl(mesh, x, displacement, max_displacement, order,
                            mode, cval, prefilter, axis_names, validate,
                            None)


def sharded_deform_batched_spatial_nd(mesh: Mesh, x, displacement, *,
                                      max_displacement: float,
                                      order: int = 3, mode: str = 'mirror',
                                      cval=0.0, prefilter: bool = True,
                                      batch_axis: str = "batch",
                                      axis_names=("shard0", "shard1"),
                                      validate: bool = False):
    """Hybrid data-parallel + multi-axis spatially-sharded deformation.

    The 3-D mesh generalization of :func:`sharded_deform_batched_spatial`:
    samples are data-parallel over ``batch_axis`` while each sample's
    volume is sharded along its first ``len(axis_names)`` axes with the
    multi-axis halo machinery of :func:`sharded_deform_spatial_nd` (all
    five modes, corner seams by two-hop relay).

    Args:
        mesh: mesh containing ``batch_axis`` and every name in
            ``axis_names``.
        x: (B, *volume_shape) array (or list of same-shaped arrays); B must
            divide over ``batch_axis``, volume axis ``k`` over
            ``axis_names[k]``.
        displacement: (B, naxis, *points) per-sample control grids.
        Remaining arguments as in :func:`sharded_deform_spatial_nd`
        (``validate`` checks every sample's grid on every sharded axis).

    Returns the deformed batch, sharded like the input.
    """
    return _spatial_nd_impl(mesh, x, displacement, max_displacement, order,
                            mode, cval, prefilter, axis_names, validate,
                            batch_axis)


def _spatial_nd_impl(mesh, x, displacement, max_displacement, order, mode,
                     cval, prefilter, axis_names, validate, batch_axis):
    batched = batch_axis is not None
    mode_code = _modes.mode_to_code(mode)
    wrap = mode_code == _modes.MODE_WRAP
    is_list = isinstance(x, (list, tuple))
    xs = [jnp.asarray(a) for a in (x if is_list else [x])]
    cvals = list(cval) if isinstance(cval, (list, tuple)) \
        else [cval] * len(xs)
    assert len(cvals) == len(xs)
    for a in xs[1:]:
        _check(a.shape == xs[0].shape,
               "all inputs must share the (deformed) shape")

    K = len(axis_names)
    global_shape = tuple(int(d) for d in
                         (xs[0].shape[1:] if batched else xs[0].shape))
    naxis = len(global_shape)
    assert K <= naxis
    assert displacement.shape[1 if batched else 0] == naxis
    ns = [mesh.shape[a] for a in axis_names]
    ss = []
    halo = int(math.ceil(max_displacement)) + order + 2
    if prefilter and order > 1:
        halo += _PREFILTER_HALO[order]
    for k in range(K):
        _check(global_shape[k] % ns[k] == 0,
               f"axis {k} must divide evenly over mesh axis "
               f"{axis_names[k]}")
        s_k = global_shape[k] // ns[k]
        _check(halo + 1 <= s_k,
               f"halo ({halo}) + 1 must fit in one axis-{k} shard ({s_k}); "
               "use fewer shards or a smaller max_displacement")
        ss.append(s_k)

    if validate:
        if isinstance(displacement, jax.core.Tracer):
            raise ValueError(
                "validate=True needs a concrete displacement; under jit "
                "call validate_max_displacement(...) outside the trace")
        disp_np = np.asarray(displacement)
        for d_s in (disp_np if batched else [disp_np]):
            for k in range(K):
                # check component k over the full volume (the helper checks
                # component 0 of what it is given)
                validate_max_displacement(d_s[k:k + 1], max_displacement,
                                          global_shape)

    cdt = default_compute_dtype(*([a.dtype for a in xs]
                                  + [displacement.dtype]))
    plan = window_plan(naxis, order)
    assert plan is not None
    n_lead, widths, strides = plan
    pad = pad_amount(order)

    def _pp_block(block):
        return _prefilter_pad_block(block, naxis, order, prefilter,
                                    plan, pad)

    def local_fn(disp, *x_locals):
        rs = [jax.lax.axis_index(a) for a in axis_names]
        row0s = [(rs[k] * ss[k]).astype(jnp.int32) for k in range(K)]

        slabs = []
        for x_local in x_locals:
            tile = x_local.astype(cdt)
            # one ring exchange per sharded axis, each on the tile already
            # extended by the previous axes (corners ride along). For wrap,
            # each step also appends the volume's head/tail seam strips
            # along that axis: they arrive on the exchange itself (the ring
            # delivers rank 0's head to the last rank and the tail to rank
            # 0 — elsewhere the strip content is unused), and because later
            # steps concatenate BEFORE slicing, earlier axes' strips pick
            # up later axes' halos and strips — corner seam blocks arrive
            # by two-hop relay without extra collectives.
            for k in range(K):
                nk = ns[k]
                fwd = [(i, (i + 1) % nk) for i in range(nk)]
                bwd = [(i, (i - 1) % nk) for i in range(nk)]
                t = jnp.moveaxis(tile, k, 0)
                from_left = jax.lax.ppermute(t[-halo:], axis_names[k], fwd)
                from_right = jax.lax.ppermute(t[:halo], axis_names[k], bwd)
                mirror_left = t[1:halo + 1][::-1]
                mirror_right = t[-halo - 1:-1][::-1]
                left = jnp.where(rs[k] == 0, mirror_left, from_left)
                right = jnp.where(rs[k] == nk - 1, mirror_right, from_right)
                parts = [left, t, right]
                if wrap:
                    parts += [from_right, from_left]  # head, tail strips
                tile = jnp.moveaxis(jnp.concatenate(parts, axis=0), 0, k)
            if not wrap:
                slabs.append(_pp_block(tile[..., None]))
                continue
            # wrap: the sharded axes now carry the raw layout
            # [left|main|right|head|tail]; prefilter + window-pad each of
            # the 3^K seam blocks SEPARATELY (the IIR must not leak across
            # unrelated blocks) and reassemble the padded block grid
            ranges = [[(0, ss[k] + 2 * halo),
                       (ss[k] + 2 * halo, ss[k] + 3 * halo),
                       (ss[k] + 3 * halo, ss[k] + 4 * halo)]
                      for k in range(K)]

            def build(k, slicer):
                if k == K:
                    blk = tile[tuple(slicer)]
                    return _pp_block(blk[..., None])
                return jnp.concatenate(
                    [build(k + 1, slicer + [slice(a, b)])
                     for a, b in ranges[k]], axis=k)
            slabs.append(build(0, []))
        disp_f = _prefilter_displacement(disp, cdt)

        out_spatial = tuple(ss) + global_shape[K:]
        row0s_full = row0s + [None] * (naxis - K)
        displ = _dense_displacement_offsets(disp_f, out_spatial,
                                            global_shape, row0s_full, cdt)

        coords = [jax.lax.broadcasted_iota(cdt, out_spatial, h)
                  for h in range(naxis)]
        cc = [coords[h] + displ[h] for h in range(naxis)]
        for k in range(K):
            cc[k] = cc[k] + row0s[k].astype(cdt)
        mapped = []
        inside = None
        for h in range(naxis):
            m, ins = _modes.map_coordinate(cc[h], global_shape[h], mode_code)
            mapped.append(m)
            if mode_code == _modes.MODE_CONSTANT:
                inside = ins if inside is None else inside & ins
        for k in range(K):
            local_k = mapped[k] - row0s[k].astype(cdt) + halo
            coord_k = jnp.clip(local_k, 0, ss[k] + 2 * halo - 1)
            if wrap:
                # route wrap-folded samples to the seam blocks — selected
                # by the fold condition on the unfolded coordinate (see the
                # single-axis version for why slab bounds don't work)
                extra_k = widths[k - n_lead] if k >= n_lead else 0
                L_main = ss[k] + 2 * halo + 2 * pad + extra_k
                L_strip = halo + 2 * pad + extra_k
                head_c = L_main + mapped[k]
                tail_c = L_main + L_strip + (mapped[k]
                                             - (global_shape[k] - halo))
                coord_k = jnp.where(cc[k] > global_shape[k] - 1, head_c,
                                    jnp.where(cc[k] < 0, tail_c, coord_k))
            mapped[k] = coord_k

        ys = []
        for xp, cv in zip(slabs, cvals):
            y = resample_windows(xp, mapped, inside, order, out_spatial,
                                 cdt, pad)[..., 0]
            if inside is not None:
                y = y + jnp.where(inside, jnp.zeros((), cdt),
                                  jnp.asarray(cv, cdt))
            ys.append(y)
        return tuple(ys)

    from jax import shard_map
    if batched:
        # per-sample grids: vmap the single-volume body over the local
        # batch; every ppermute/all_gather batches through vmap, so one
        # exchange moves every local sample's halos
        body = jax.vmap(local_fn)
        spec_x = P(batch_axis, *axis_names, *([None] * (naxis - K)))
        spec_d = P(batch_axis, *([None] * (naxis + 1)))
    else:
        body = local_fn
        spec_x = P(*axis_names, *([None] * (naxis - K)))
        spec_d = P(*([None] * (naxis + 1)))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec_d,) + (spec_x,) * len(xs),
                   out_specs=(spec_x,) * len(xs))
    outs = fn(jnp.asarray(displacement), *xs)
    outs = [cast_output(o, np.dtype(a.dtype)) for o, a in zip(outs, xs)]
    return list(outs) if is_list else outs[0]
