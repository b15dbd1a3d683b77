"""Deformation orchestration: the fused forward map and its exact adjoint.

This is the TPU-native counterpart of the reference's ``DeformGrid`` C entry
point (reference deform.c:340-1043) plus the Python-side prefilter
orchestration (reference deform_grid.py:154-174). Everything here is pure,
static-shaped, and traceable under ``jit`` / ``vmap`` / ``shard_map``.

Pipeline (forward), matching reference call stack §3.2 of SURVEY.md:
  1. prefilter the displacement grid at order 3 over its control-point axes
     (reference deform_grid.py:165-169) — MXU matmuls,
  2. interpolate it to a dense per-voxel displacement field — MXU matmuls
     (reference deform.c:639-758),
  3. per input: optional input prefilter (deform_grid.py:154-164), affine
     transform of the output coordinates (deform.c:771-777), crop offset +
     displacement, boundary-mode mapping (deform.c:781), separable
     (order+1)^naxis gather with spline weights (deform.c:818-901), cval
     substitution for constant-mode outside voxels (deform.c:902-903), and
     dtype cast (deform.c:906-924).

The adjoint (reference gradient path, deform.c:926-997 + the transpose
prefilter deform.c:1049-1168) is obtained by reverse-differentiating the
linear part of the same pipeline — the window table build and gather stage
carry hand-written custom adjoints (ops/windows.py), everything else
transposes through XLA — guaranteeing exact consistency with the forward.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from elasticdeform_tpu.ops import modes as _modes
from elasticdeform_tpu.ops.displacement import dense_displacement
from elasticdeform_tpu.ops.prefilter import (
    spline_filter1d, spline_filter1d_select,
    spline_filter1d_select_transpose, spline_filter1d_transpose,
    use_scan_filter,
)
from elasticdeform_tpu.ops.resample import (
    resample_linear, cast_output, cast_int_c, pad_amount,
)
from elasticdeform_tpu.ops.windows import (
    can_fuse_filter_build, window_plan, window_pad_axis, window_pad_indices,
    window_unpad_axis, resample_windows, resample_windows_transpose,
)

_DISPLACEMENT_ORDER = 3  # reference deform.c:375


@dataclasses.dataclass(frozen=True)
class InputSpec:
    """Static per-input configuration (hashable for jit caching)."""
    shape: Tuple[int, ...]        # full (uncropped) input shape
    dtype: str                    # numpy dtype name of the input
    axis: Tuple[int, ...]         # deformed axes, sorted
    order: int                    # 0-5
    mode: int                     # boundary mode code
    cval: float
    out_shape: Tuple[int, ...]    # full output shape


@dataclasses.dataclass(frozen=True)
class DeformSpec:
    """Static call configuration shared by all inputs."""
    inputs: Tuple[InputSpec, ...]
    deform_shape: Tuple[int, ...]   # uncropped extent over deformed axes
    out_spatial: Tuple[int, ...]    # cropped output extent over deformed axes
    offsets: Tuple[int, ...]        # crop offsets per deformed axis
    prefilter: bool
    compute_dtype: str
    has_affine: bool
    # resampling strategy: 'auto' (windows where supported), 'windows'
    # (overlapping-row gather fast path, ops/windows.py), or 'gather'
    # (per-tap element gathers, ops/resample.py)
    strategy: str = "auto"
    # opt-in fast-augmentation mode: window-table values stored/gathered
    # in this narrower dtype ('' = compute dtype; see core.deform docs)
    table_dtype: str = ""


def default_compute_dtype(*dtypes) -> str:
    """float64 when x64 is enabled and any operand is 64-bit, else float32.

    Complex operands count by component width: complex128 is a 64-bit
    computation (its real/imag parts are float64), complex64 a 32-bit one.
    """
    if jax.config.jax_enable_x64 and any(
            (np.dtype(d).itemsize >= 8 and np.dtype(d).kind in "fiu")
            or (np.dtype(d).kind == "c" and np.dtype(d).itemsize >= 16)
            for d in dtypes):
        return "float64"
    return "float32"


def _is_complex(dtype) -> bool:
    return np.dtype(dtype).kind == "c"


def _complex_to_channels(xt):
    """(*s, C) complex -> (*s, 2C) real: real block then imag block.

    The whole resampling pipeline is linear in the input with *real*
    coefficients (spline weights, prefilter, fold), so deforming the real
    and imaginary parts independently is exact — and it doubles the
    existing channel axis instead of running the pipeline twice, so the
    displacement interpolation, coordinate mapping, and window indices are
    all computed once. This is also the only TPU-viable formulation: the
    TPU backend has no complex arithmetic.
    """
    return jnp.concatenate([jnp.real(xt), jnp.imag(xt)], axis=-1)


def _channels_to_complex(y):
    """Inverse of :func:`_complex_to_channels` on the last axis."""
    C = y.shape[-1] // 2
    return jax.lax.complex(y[..., :C], y[..., C:])


def _cval_term(cval, nchan, cdt, cplx: bool):
    """Constant-mode fill value, broadcast over the channel axis.

    For complex inputs the channels are the split real/imag blocks, so the
    fill is a (2C,) vector carrying ``cval.real`` in the first half and
    ``cval.imag`` in the second (scipy.ndimage casts cval to the input
    dtype; the reference supports float cvals only, deform_grid.py:376).
    """
    if not cplx:
        return jnp.asarray(cval, dtype=cdt)
    cv = complex(cval)
    C = nchan // 2
    return jnp.concatenate([jnp.full((C,), cv.real, cdt),
                            jnp.full((C,), cv.imag, cdt)])


def _prefilter_displacement(displacement, cdt):
    """Order-3 prefilter over control-point axes (deform_grid.py:165-169)."""
    disp = jnp.asarray(displacement).astype(cdt)
    for d in range(1, disp.ndim):
        disp = spline_filter1d(disp, _DISPLACEMENT_ORDER, d)
    return disp


def _output_coordinates(spec: DeformSpec, displ, affine, cdt):
    """Sample coordinates per deformed axis: affine(out) + offset + displ.

    Matches reference deform.c:768-781 — the affine acts on the *output*
    voxel coordinates (without the crop offset); the crop offset and the
    dense displacement are added afterwards, and the displacement itself was
    evaluated at the offset output position (handled in dense_displacement).
    """
    naxis = len(spec.out_spatial)
    coords = [jax.lax.broadcasted_iota(cdt, spec.out_spatial, h)
              for h in range(naxis)]
    if affine is not None:
        A = jnp.asarray(affine).astype(cdt)
        cc = []
        for h in range(naxis):
            acc = A[h, naxis]
            for l in range(naxis):
                acc = acc + A[h, l] * coords[l]
            cc.append(acc)
    else:
        cc = coords
    return [cc[h] + spec.offsets[h] + displ[h] for h in range(naxis)]


def _split_axes(ispec: InputSpec):
    """Deformed-axes-first permutation and channel info for one input."""
    ndim = len(ispec.shape)
    channels = tuple(d for d in range(ndim) if d not in ispec.axis)
    perm = tuple(ispec.axis) + channels
    inv_perm = tuple(np.argsort(perm))
    chan_shape = tuple(ispec.shape[d] for d in channels)
    return perm, inv_perm, chan_shape


def _to_spatial_channels(x, ispec: InputSpec):
    """Transpose/reshape input to (*deform_spatial, C)."""
    perm, _, chan_shape = _split_axes(ispec)
    spatial = tuple(ispec.shape[d] for d in ispec.axis)
    xt = jnp.transpose(x, perm)
    return xt.reshape(*spatial, max(math.prod(chan_shape), 1))


def _from_spatial_channels(y, ispec: InputSpec, out_spatial):
    """Inverse of :func:`_to_spatial_channels` for the output."""
    perm, inv_perm, chan_shape = _split_axes(ispec)
    y = y.reshape(*out_spatial, *chan_shape)
    return jnp.transpose(y, inv_perm)


def _prefilter_input(xt, ispec: InputSpec, spec: DeformSpec, cdt,
                     exact_int: bool):
    """Per-axis input prefilter (reference deform_grid.py:154-164).

    The reference writes each per-axis filter result into an array of the
    *input* dtype (``numpy.zeros_like``), so integer inputs are C-cast
    (truncate toward zero + wrap modulo 2**bits, see
    :func:`~elasticdeform_tpu.ops.resample.cast_int_c`) after every axis;
    ``exact_int`` replicates that (forward path). The linear/gradient path
    skips it to stay linear.
    """
    naxis = len(ispec.axis)
    xf = xt.astype(cdt)
    if spec.prefilter and ispec.order > 1:
        int_like = np.dtype(ispec.dtype).kind in "bui"
        for d in range(naxis):
            xf = spline_filter1d(xf, ispec.order, d)
            if exact_int and int_like:
                xf = cast_int_c(xf, ispec.dtype)
    return xf


def _prefilter_pad_input(xt, ispec: InputSpec, spec: DeformSpec, cdt,
                         exact_int: bool, plan, bo: int = 0):
    """Prefilter + window-pad for the windows fast path, fused per axis.

    When an axis runs a prefilter matmul, the window mirror-padding of that
    axis folds into it as a row selection of the filter matrix
    (:func:`spline_filter1d_select`) — one kernel instead of matmul +
    concat, bit-identical: duplicated rows compute the same inner
    products, later-axis filters act per-slice (so they commute with the
    duplication), and the integer writeback cast is elementwise. Axes
    without a filter keep the concat-based :func:`window_pad_axis`.
    ``bo`` is the leading-batch axis offset (0 single, 1 batched).
    """
    n_lead, widths, _ = plan
    naxis = len(ispec.axis)
    pad = pad_amount(ispec.order)
    xf = xt.astype(cdt)
    filtered = spec.prefilter and ispec.order > 1
    int_like = np.dtype(ispec.dtype).kind in "bui"
    for d in range(naxis):
        extra = widths[d - n_lead] if d >= n_lead else 0
        if filtered and not use_scan_filter(xf.shape[d + bo], ispec.order):
            idx = window_pad_indices(xf.shape[d + bo], pad, extra)
            xf = spline_filter1d_select(xf, ispec.order, d + bo, idx)
            if exact_int and int_like:
                xf = cast_int_c(xf, ispec.dtype)
        elif filtered:
            # huge axis: O(log n) scan filter + concat pad instead of the
            # O(n^2) fused filter-matrix row selection
            xf = spline_filter1d(xf, ispec.order, d + bo)
            if exact_int and int_like:
                xf = cast_int_c(xf, ispec.dtype)
            xf = window_pad_axis(xf, d + bo, pad, extra)
        else:
            xf = window_pad_axis(xf, d + bo, pad, extra)
    return xf


def _map_input_coordinates(cc, ispec: InputSpec, spec: DeformSpec):
    """Boundary-map coordinates for one input; returns (mapped, inside)."""
    naxis = len(ispec.axis)
    mapped = []
    inside = None
    for h in range(naxis):
        m, ins = _modes.map_coordinate(cc[h], spec.deform_shape[h], ispec.mode)
        mapped.append(m)
        if ispec.mode == _modes.MODE_CONSTANT:
            inside = ins if inside is None else (inside & ins)
    return mapped, inside


def _deform_one_linear(xt, cc, ispec: InputSpec, spec: DeformSpec, cdt,
                       exact_int: bool):
    """Linear part of the per-input pipeline: prefilter + masked resample.

    Input/output in (*spatial, C) layout; no cval constant, no output cast.
    Dispatches between the window-gather fast path (ops/windows.py) and the
    per-tap gather path (ops/resample.py) — numerically identical taps and
    weights, different memory layout.
    """
    mapped, inside = _map_input_coordinates(cc, ispec, spec)
    naxis = len(mapped)
    plan = window_plan(naxis, ispec.order, spec.deform_shape) \
        if spec.strategy in ("auto", "windows") else None
    if plan is None:
        xf = _prefilter_input(xt, ispec, spec, cdt, exact_int)
        y = resample_linear(xf, mapped, inside, ispec.order,
                            spec.out_spatial, cdt)
    else:
        pad = pad_amount(ispec.order)
        # the fused build is illegal only under the reference's per-axis
        # integer writeback (nonlinear); scipy-semantics int callers
        # (exact_int=False, map_coordinates) filter in float and may fuse
        int_cast = (np.dtype(ispec.dtype).kind in "bui" and spec.prefilter
                    and ispec.order > 1 and exact_int)
        if not int_cast and can_fuse_filter_build(
                spec.deform_shape, xt.shape[-1], plan, pad, ispec.order,
                cdt, spec.prefilter):
            # whole input side (prefilter + window pad + patch expand) as
            # one matmul per axis inside the windows op; int inputs with a
            # prefilter keep the staged path (the reference's per-axis
            # integer writeback cast is nonlinear and cannot compose)
            order_f = ispec.order if (spec.prefilter and ispec.order > 1) \
                else 0
            y = resample_windows(xt.astype(cdt), mapped, inside, ispec.order,
                                 spec.out_spatial, cdt, pad, plan=plan,
                                 fuse_filter=order_f,
                                 table_dtype=spec.table_dtype)
        else:
            xp = _prefilter_pad_input(xt, ispec, spec, cdt, exact_int, plan)
            y = resample_windows(xp, mapped, inside, ispec.order,
                                 spec.out_spatial, cdt, pad, plan=plan,
                                 table_dtype=spec.table_dtype)
    return y, inside


def _deform_one_linear_batched(xt, cc, ispec: InputSpec, spec: DeformSpec,
                               cdt, exact_int: bool):
    """Batched twin of :func:`_deform_one_linear`.

    ``xt``: (B, *spatial, C); ``cc``: list of (B, *out_spatial). Requires
    the windows strategy (the caller guarantees the plan exists): the batch
    folds into the window-table rows so the resampling gather stays 2-D.
    """
    mapped, inside = _map_input_coordinates(cc, ispec, spec)
    naxis = len(mapped)
    plan = window_plan(naxis, ispec.order, spec.deform_shape)
    pad = pad_amount(ispec.order)
    int_cast = (np.dtype(ispec.dtype).kind in "bui" and spec.prefilter
                and ispec.order > 1 and exact_int)
    if not int_cast and can_fuse_filter_build(
            spec.deform_shape, xt.shape[-1], plan, pad, ispec.order,
            cdt, spec.prefilter, nbatch=xt.shape[0]):
        order_f = ispec.order if (spec.prefilter and ispec.order > 1) else 0
        y = resample_windows(xt.astype(cdt), mapped, inside, ispec.order,
                             spec.out_spatial, cdt, pad, batched=True,
                             plan=plan, fuse_filter=order_f,
                             table_dtype=spec.table_dtype)
    else:
        xp = _prefilter_pad_input(xt, ispec, spec, cdt, exact_int, plan,
                                  bo=1)
        y = resample_windows(xp, mapped, inside, ispec.order,
                             spec.out_spatial, cdt, pad, batched=True,
                             plan=plan, table_dtype=spec.table_dtype)
    return y, inside


def deform_apply(xs, displacement, affine, spec: DeformSpec):
    """Forward deformation for all inputs. Returns a list of outputs."""
    cdt = spec.compute_dtype
    displ = dense_displacement(jnp.asarray(displacement).astype(cdt),
                               spec.out_spatial, spec.deform_shape,
                               spec.offsets, cdt, prefilter_grid=True)
    cc = _output_coordinates(spec, displ, affine, cdt)

    ys = []
    for x, ispec in zip(xs, spec.inputs):
        cplx = _is_complex(ispec.dtype)
        xt = _to_spatial_channels(jnp.asarray(x), ispec)
        if cplx:
            xt = _complex_to_channels(xt)
        y, inside = _deform_one_linear(xt, cc, ispec, spec, cdt,
                                       exact_int=True)
        if inside is not None:
            # constant-mode outside voxels take cval (deform.c:902-903)
            mask = inside[..., None]
            y = y + jnp.where(mask, jnp.zeros((), cdt),
                              _cval_term(ispec.cval, y.shape[-1], cdt, cplx))
        if cplx:
            y = _channels_to_complex(y)
        y = cast_output(y, ispec.dtype)
        ys.append(_from_spatial_channels(y, ispec, spec.out_spatial))
    return ys


def _batched_coordinates(spec: DeformSpec, displ, affine, cdt):
    """Batched sample coordinates: displ is (B, naxis, *out_spatial);
    affine (if any) is shared (naxis, naxis+1) or per-sample (B, ...)."""
    naxis = len(spec.out_spatial)
    B = displ.shape[0]
    coords = [jax.lax.broadcasted_iota(cdt, spec.out_spatial, h)
              for h in range(naxis)]
    if affine is not None:
        A = jnp.asarray(affine).astype(cdt)
        per_sample = A.ndim == 3
        cc = []
        for h in range(naxis):
            if per_sample:
                acc = A[:, h, naxis].reshape((B,) + (1,) * naxis)
                for l in range(naxis):
                    acc = acc + (A[:, h, l].reshape((B,) + (1,) * naxis)
                                 * coords[l])
            else:
                acc = A[h, naxis]
                for l in range(naxis):
                    acc = acc + A[h, l] * coords[l]
            cc.append(acc)
    else:
        cc = coords
    return [cc[h] + spec.offsets[h] + displ[:, h] for h in range(naxis)]


def deform_apply_batched(xs, displacement, affine, spec: DeformSpec):
    """Forward deformation over a leading batch axis with per-sample
    displacement grids — the high-throughput augmentation path.

    ``xs[i]``: (B, *per_sample_shape); ``displacement``: (B, naxis, *points).
    Per-sample semantics identical to :func:`deform_apply`; the batch is
    woven natively through every stage (matmuls batch on the MXU, the
    window table folds the batch into its rows) instead of ``vmap`` so the
    resampling gather keeps its fast 2-D row form.
    """
    cdt = spec.compute_dtype
    displ = jax.vmap(lambda d: dense_displacement(
        jnp.asarray(d).astype(cdt), spec.out_spatial, spec.deform_shape,
        spec.offsets, cdt, prefilter_grid=True))(displacement)
    cc = _batched_coordinates(spec, displ, affine, cdt)

    ys = []
    for x, ispec in zip(xs, spec.inputs):
        cplx = _is_complex(ispec.dtype)
        x = jnp.asarray(x)
        xt = jax.vmap(lambda a, _i=ispec: _to_spatial_channels(a, _i))(x)
        if cplx:
            xt = _complex_to_channels(xt)
        y, inside = _deform_one_linear_batched(xt, cc, ispec, spec, cdt,
                                               exact_int=True)
        if inside is not None:
            mask = inside[..., None]
            y = y + jnp.where(mask, jnp.zeros((), cdt),
                              _cval_term(ispec.cval, y.shape[-1], cdt, cplx))
        if cplx:
            y = _channels_to_complex(y)
        y = cast_output(y, ispec.dtype)
        ys.append(jax.vmap(lambda a, _i=ispec: _from_spatial_channels(
            a, _i, spec.out_spatial))(y))
    return ys


def _deform_one_linear_transpose(dyt, cc, ispec: InputSpec, spec: DeformSpec,
                                 cdt):
    """Exact transpose of :func:`_deform_one_linear`'s linear map.

    Hand-written backward-only pipeline (reference deform_grid.py:274-286 is
    backward-only too): scatter the output cotangent into the window table,
    fold it onto the padded volume, un-pad, and run the transpose prefilter
    in reverse axis order (deform.c:953-995 + deform.c:1049-1168). Unlike
    ``jax.vjp`` on a zeros primal, no forward pass is executed.
    """
    spatial = tuple(ispec.shape[d] for d in ispec.axis)
    naxis = len(spatial)
    mapped, inside = _map_input_coordinates(cc, ispec, spec)
    plan = window_plan(naxis, ispec.order, spec.deform_shape) \
        if spec.strategy in ("auto", "windows") else None
    if plan is None:
        # the gather path has no custom_vjp inside, so linear_transpose
        # works and XLA turns the gathers into scatter-adds; the channel
        # count comes from the cotangent (complex inputs arrive with their
        # real/imag parts split into doubled channels)
        nchan = dyt.shape[-1]
        xt_struct = jax.ShapeDtypeStruct((*spatial, nchan), jnp.dtype(cdt))

        def lin(xt):
            xf = _prefilter_input(xt, ispec, spec, cdt, exact_int=False)
            return resample_linear(xf, mapped, inside, ispec.order,
                                   spec.out_spatial, cdt)

        (dxt,) = jax.linear_transpose(lin, xt_struct)(dyt)
        return dxt

    n_lead, widths, strides = plan
    pad = pad_amount(ispec.order)
    padded_spatial = tuple(
        n + 2 * pad + (widths[h - n_lead] if h >= n_lead else 0)
        for h, n in enumerate(spatial))
    d_xp = resample_windows_transpose(dyt, mapped, inside, ispec.order,
                                      spec.out_spatial, cdt, pad,
                                      padded_spatial, plan=plan)
    # transpose of the fused prefilter+pad forward (_prefilter_pad_input):
    # per filtered axis, un-pad + transpose-prefilter is ONE matmul with
    # the row-selected filter matrix transposed; unfiltered axes keep the
    # slice-add un-pad (reverse axis order, reference deform_grid.py:276-286)
    filtered = spec.prefilter and ispec.order > 1
    d_xf = d_xp
    for d in range(naxis - 1, -1, -1):
        extra = widths[d - n_lead] if d >= n_lead else 0
        if filtered and not use_scan_filter(spatial[d], ispec.order):
            idx = window_pad_indices(spatial[d], pad, extra)
            d_xf = spline_filter1d_select_transpose(
                d_xf, ispec.order, d, idx, spatial[d])
        elif filtered:
            # mirror of the forward's scan-filter + pad on huge axes:
            # slice-add un-pad, then the scan's machine transpose
            d_xf = window_unpad_axis(d_xf, d, spatial[d], pad, extra)
            d_xf = spline_filter1d_transpose(d_xf, ispec.order, d)
        else:
            d_xf = window_unpad_axis(d_xf, d, spatial[d], pad, extra)
    return d_xf


def deform_gradient_apply(dys, displacement, affine, spec: DeformSpec):
    """Exact adjoint: gradients w.r.t. the (uncropped) inputs.

    Equivalent to the reference's ``deform_grid_grad`` + transpose prefilter
    pipeline (reference deform_grid.py:274-286): for each input the linear
    forward map (prefilter ∘ resample, without cval constant) is transposed
    by the hand-written backward-only pipeline
    (:func:`_deform_one_linear_transpose`) — no forward pass is paid.
    """
    cdt = spec.compute_dtype
    displ = dense_displacement(jnp.asarray(displacement).astype(cdt),
                               spec.out_spatial, spec.deform_shape,
                               spec.offsets, cdt, prefilter_grid=True)
    cc = _output_coordinates(spec, displ, affine, cdt)

    dxs = []
    for dy, ispec in zip(dys, spec.inputs):
        cplx = _is_complex(ispec.dtype)
        spatial = tuple(ispec.shape[d] for d in ispec.axis)
        # bring the incoming gradient into (*out_spatial, C) layout
        out_ispec = dataclasses.replace(ispec, shape=ispec.out_shape)
        dyt = _to_spatial_channels(jnp.asarray(dy), out_ispec)
        dyt = _complex_to_channels(dyt).astype(cdt) if cplx \
            else dyt.astype(cdt)
        dxt = _deform_one_linear_transpose(dyt, cc, ispec, spec, cdt)
        if cplx:
            dxt = _channels_to_complex(dxt)
        dx = cast_output(dxt, ispec.dtype)
        # back to the input's original axis order, at the uncropped shape
        in_ispec = dataclasses.replace(ispec, out_shape=ispec.shape)
        dxs.append(_from_spatial_channels(dx, in_ispec, spatial))
    return dxs


def map_coordinates_apply(x, coordinates, spec: DeformSpec):
    """Resample one input at explicit per-voxel sample coordinates.

    The general-resampler entry (``scipy.ndimage.map_coordinates``
    analogue with the reference's pre-SciPy-1.6 boundary semantics):
    ``coordinates`` has shape ``(naxis, *out_spatial)`` in voxel units of
    the deformed axes. Reuses the full deform resampling pipeline
    (prefilter, boundary mapping, windows fast path, cval substitution,
    dtype cast) with the caller's dense coordinates in place of
    ``affine(output) + offset + displacement`` — the special case the
    reference hard-codes (deform.c:768-781), generalized.
    """
    cdt = spec.compute_dtype
    ispec = spec.inputs[0]
    cplx = _is_complex(ispec.dtype)
    coords = jnp.asarray(coordinates).astype(cdt)
    cc = [coords[h] for h in range(len(ispec.axis))]
    xt = _to_spatial_channels(jnp.asarray(x), ispec)
    if cplx:
        xt = _complex_to_channels(xt)
    # exact_int=False: scipy's map_coordinates prefilters integer inputs
    # in float (verified vs scipy 1.17) — the per-axis integer writeback
    # is a deform_grid-only reference quirk (deform_grid.py:154-164)
    y, inside = _deform_one_linear(xt, cc, ispec, spec, cdt,
                                   exact_int=False)
    if inside is not None:
        mask = inside[..., None]
        y = y + jnp.where(mask, jnp.zeros((), cdt),
                          _cval_term(ispec.cval, y.shape[-1], cdt, cplx))
    if cplx:
        y = _channels_to_complex(y)
    y = cast_output(y, ispec.dtype)
    _, _, chan_shape = _split_axes(ispec)
    if chan_shape:
        return _from_spatial_channels(y, ispec, spec.out_spatial)
    # pure case: the output rank may differ from the input rank
    # (scipy semantics: output shape == coordinates.shape[1:])
    return y.reshape(spec.out_spatial)


def map_coordinates_apply_batched(x, coordinates, spec: DeformSpec):
    """Batched twin of :func:`map_coordinates_apply`.

    ``x``: (B, *per_sample_shape); ``coordinates``: (B, naxis,
    *out_spatial) — per-sample coordinates. The batch is woven natively
    through the window machinery (folded into the table rows) like
    :func:`deform_apply_batched`; requires the windows plan (the caller
    guarantees it, falling back to ``vmap`` otherwise).
    """
    cdt = spec.compute_dtype
    ispec = spec.inputs[0]
    cplx = _is_complex(ispec.dtype)
    coords = jnp.asarray(coordinates).astype(cdt)
    cc = [coords[:, h] for h in range(len(ispec.axis))]
    x = jnp.asarray(x)
    xt = jax.vmap(lambda a: _to_spatial_channels(a, ispec))(x)
    if cplx:
        xt = _complex_to_channels(xt)
    # exact_int=False: scipy prefilter semantics, cf. map_coordinates_apply
    y, inside = _deform_one_linear_batched(xt, cc, ispec, spec, cdt,
                                           exact_int=False)
    if inside is not None:
        mask = inside[..., None]
        y = y + jnp.where(mask, jnp.zeros((), cdt),
                          _cval_term(ispec.cval, y.shape[-1], cdt, cplx))
    if cplx:
        y = _channels_to_complex(y)
    y = cast_output(y, ispec.dtype)
    _, _, chan_shape = _split_axes(ispec)
    if chan_shape:
        return jax.vmap(lambda a: _from_spatial_channels(
            a, ispec, spec.out_spatial))(y)
    return y.reshape(y.shape[0], *spec.out_spatial)


def map_coordinates_gradient_apply(dy, coordinates, spec: DeformSpec):
    """Backward-only adjoint of :func:`map_coordinates_apply` w.r.t. ``x``.

    Maps an output cotangent to an input cotangent through the
    hand-written transpose pipeline (no forward pass is paid), mirroring
    :func:`deform_gradient_apply`.
    """
    cdt = spec.compute_dtype
    ispec = spec.inputs[0]
    cplx = _is_complex(ispec.dtype)
    coords = jnp.asarray(coordinates).astype(cdt)
    cc = [coords[h] for h in range(len(ispec.axis))]
    spatial = tuple(ispec.shape[d] for d in ispec.axis)
    _, _, chan_shape = _split_axes(ispec)
    if chan_shape:
        out_ispec = dataclasses.replace(ispec, shape=ispec.out_shape)
        dyt = _to_spatial_channels(jnp.asarray(dy), out_ispec)
    else:
        dyt = jnp.asarray(dy).reshape(*spec.out_spatial, 1)
    dyt = _complex_to_channels(dyt).astype(cdt) if cplx else dyt.astype(cdt)
    dxt = _deform_one_linear_transpose(dyt, cc, ispec, spec, cdt)
    if cplx:
        dxt = _channels_to_complex(dxt)
    dx = cast_output(dxt, ispec.dtype)
    if chan_shape:
        in_ispec = dataclasses.replace(ispec, out_shape=ispec.shape)
        return _from_spatial_channels(dx, in_ispec, spatial)
    return dx.reshape(spatial)
