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


@functools.lru_cache(maxsize=512)
def _jitted_batch_forward(spec, use_native):
    from elasticdeform_tpu.ops.deform import deform_apply, \
        deform_apply_batched

    def fn(xs, displacement, affine):
        if use_native:
            return deform_apply_batched(list(xs), displacement, affine, spec)
        per = lambda xs_s, d, a: deform_apply(list(xs_s), d, a, spec)
        return jax.vmap(per, in_axes=(0, 0, None))(xs, displacement, affine)
    return jax.jit(fn)


@functools.lru_cache(maxsize=512)
def _jitted_map_forward(spec):
    from elasticdeform_tpu.ops.deform import map_coordinates_apply

    def fn(x, coords):
        return map_coordinates_apply(x, coords, spec)
    return jax.jit(fn)


@functools.lru_cache(maxsize=512)
def _jitted_map_gradient(spec):
    from elasticdeform_tpu.ops.deform import map_coordinates_gradient_apply

    def fn(dy, coords):
        return map_coordinates_gradient_apply(dy, coords, spec)
    return jax.jit(fn)


@functools.lru_cache(maxsize=512)
def _jitted_batch_gradient(spec, use_native=True):
    # native: batch-folded custom-vjp backward via jax.vjp of the batched
    # forward at a zero primal — exact (the pipeline is affine in X, so the
    # linearization is primal-independent) and measured 1.42x the vmapped
    # per-sample adjoint on 64x 64^3 (277 vs 393 ms, 1x v5e); the unused
    # forward gather is dead-code-eliminated (tests/test_dce.py).
    if use_native:
        from elasticdeform_tpu.ops.deform import deform_apply_batched

        def fn(dys, displacement, affine):
            B = dys[0].shape[0]
            xs0 = tuple(jnp.zeros((B, *i.shape), i.dtype)
                        for i in spec.inputs)
            _, vjp_fn = jax.vjp(
                lambda xs: tuple(deform_apply_batched(
                    list(xs), displacement, affine, spec)), xs0)
            (dxs,) = vjp_fn(tuple(dys))
            return list(dxs)
    else:
        def fn(dys, displacement, affine):
            per = lambda dys_s, d, a: deform_gradient_apply(
                list(dys_s), d, a, spec)
            return jax.vmap(per, in_axes=(0, 0, None))(dys, displacement,
                                                       affine)
    return jax.jit(fn)


def _is_complex_array(x) -> bool:
    return np.dtype(np.asarray(x).dtype).kind == "c"


def _expand_param(p, positions, n, split=None, tuple_is_per_input=True):
    """Duplicate a per-input parameter at the complex positions.

    Non-list parameters broadcast to every input already, so they pass
    through unchanged — except when ``split`` is given (cval), where the
    scalar must become a per-input list so the real/imag entries can
    carry different components. Lists of the wrong length also pass
    through so the inner call raises the reference's count error.
    """
    if tuple_is_per_input and isinstance(p, tuple) and len(p) == n:
        # tuples are accepted as per-input lists by the order/mode/cval
        # normalizers; for axis a tuple means ONE shared selection and
        # must pass through untouched
        p = list(p)
    if not isinstance(p, list):
        if split is None:
            return p
        p = [p] * n
    if len(p) != n:
        return p
    out = []
    for i, v in enumerate(p):
        if i in positions:
            out.extend(split(v) if split is not None else (v, v))
        else:
            out.append(v)
    return out


def _expand_complex_call(fn, X, args, kwargs, shape_key=None):
    """Run a numpy-API function with complex inputs expanded host-side.

    The TPU backend stores complex arrays but cannot execute any op on
    them, so complex values must never reach the device: each complex
    input becomes two real inputs (its real and imaginary parts) sharing
    the deformation — the multi-input machinery computes the displacement
    field and sample coordinates once — and the outputs are recombined on
    the host. ``cval`` splits into per-component fills; per-input lists
    (order/mode/axis/X_shape) duplicate at the complex positions.
    """
    Xs = X if isinstance(X, list) else [np.asarray(X)]
    positions = {i for i, x in enumerate(Xs) if _is_complex_array(x)}
    n = len(Xs)
    Xs2 = []
    for i, x in enumerate(Xs):
        x = np.asarray(x)
        if i in positions:
            Xs2.append(np.ascontiguousarray(x.real))
            Xs2.append(np.ascontiguousarray(x.imag))
        else:
            Xs2.append(x)
    kw = dict(kwargs)
    # wrong-length per-input lists must raise the reference's count error
    # HERE: after expansion the input count grows, so a wrong length
    # could otherwise coincidentally match and be silently misassigned
    for name, label in (("order", "order"), ("mode", "mode"),
                        ("cval", "cval")):
        p = kw.get(name)
        if isinstance(p, (list, tuple)) and len(p) != n:
            raise AssertionError(
                f"Number of {label} parameters should be equal to "
                "number of inputs.")
    if isinstance(kw.get("axis"), list) and len(kw["axis"]) != n:
        raise AssertionError(
            "Number of axis tuples should match number of inputs.")
    for name in ("order", "mode"):
        if name in kw:
            kw[name] = _expand_param(kw[name], positions, n)
    if "axis" in kw:
        kw["axis"] = _expand_param(kw["axis"], positions, n,
                                   tuple_is_per_input=False)
    if "cval" in kw:
        kw["cval"] = _expand_param(
            kw["cval"], positions, n,
            split=lambda v: (complex(v).real, complex(v).imag))
    if shape_key and kw.get(shape_key) is not None:
        s = kw[shape_key]
        kw[shape_key] = _expand_param(
            [s] * n if isinstance(s, tuple) else s, positions, n)
    outs = fn(Xs2, *args, **kw)
    merged = []
    j = 0
    for i, x in enumerate(Xs):
        if i in positions:
            dt = np.dtype(np.asarray(x).dtype)
            merged.append((outs[j] + 1j * outs[j + 1]).astype(dt))
            j += 2
        else:
            merged.append(outs[j])
            j += 1
    return merged if isinstance(X, list) else merged[0]


def _to_device(arrays):
    return tuple(jnp.asarray(a) for a in arrays)


def _to_host(ys, dtypes):
    # preserve the reference's dtype contract even when x64 is disabled
    return [np.asarray(y).astype(dt, copy=False) for y, dt in zip(ys, dtypes)]


def deform_random_grid(X, sigma=25, points=3, order=3, mode='constant',
                       cval=0.0, crop=None, prefilter=True, axis=None,
                       affine=None, rotate=None, zoom=None):
    """Elastic deformation of an image with a random displacement grid.

    Samples a coarse grid of normally distributed displacement vectors,
    ``displacement = numpy.random.randn(naxis, *points) * sigma``, and
    applies :func:`deform_grid` with it. This matches the behaviour of the
    reference ``deform_random_grid`` (reference deform_grid.py:6-49),
    including its use of the *global* numpy RNG — seed with
    ``numpy.random.seed`` for reproducibility, or use
    :func:`elasticdeform_tpu.deform_random` for device-side randomness with
    an explicit PRNG key.

    Parameters
    ----------
    X : numpy array or list of arrays
        Image to deform, or a list of images that are deformed with the
        same random grid (e.g. an image and its segmentation). All inputs
        must agree on the shape of the deformed axes.
    sigma : float
        Standard deviation, in voxels, of the normal distribution the
        control-point displacement vectors are drawn from.
    points : int or tuple of ints
        Number of control points of the coarse displacement grid along
        each deformed axis; a scalar is used for every axis. The grid
        spans the full image extent, so larger ``points`` gives
        higher-frequency deformations.
    order, mode, cval, crop, prefilter, axis, affine, rotate, zoom
        Passed through to :func:`deform_grid`; see there for the full
        semantics.

    Returns
    -------
    numpy array or list of arrays
        The deformed image(s), matching the input form and dtypes.
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
    """Elastic deformation of an image with a displacement grid.

    The coarse grid of per-axis displacement vectors is interpolated to a
    dense per-voxel displacement field with cubic B-splines; the image is
    then resampled at the displaced coordinates with a B-spline of the
    requested ``order``. Numpy-compatible twin of the reference
    ``deform_grid`` (reference deform_grid.py:52-179): numpy in, numpy
    out, with the computation jit-compiled on the default JAX device. Each
    static configuration (shapes, axes, orders, modes, crop) compiles once
    and is cached. For a traceable/differentiable JAX-native version use
    :func:`elasticdeform_tpu.deform`.

    Parameters
    ----------
    X : numpy array or list of arrays
        Image to deform, or a list of images deformed with the same
        displacement grid. The inputs may differ in dtype and in their
        non-deformed (channel) axes, but must agree on the shape of the
        deformed axes.
    displacement : numpy array
        Displacement vectors of the control-point grid, with shape
        ``(naxis, *points)`` where ``naxis`` is the number of deformed
        axes and ``points`` the per-axis control-point counts. Values are
        in voxels of the full (uncropped) image. The grid is stretched
        over the full image extent: control point ``i`` along an axis of
        length ``n`` sits at coordinate ``i * (n - 1) / (points - 1)``.
    order : int or list of ints
        B-spline interpolation order for the image resampling, 0 to 5
        (0 = nearest neighbour, 1 = linear, 3 = cubic, ...). A list gives
        a per-input order. The displacement grid itself is always
        interpolated with cubic (order 3) B-splines.
    mode : str or list of str
        Border behaviour when a displaced coordinate falls outside the
        image: one of ``'nearest'`` (repeat the edge value), ``'wrap'``
        (periodic), ``'reflect'`` (mirror about the edge value's center),
        ``'mirror'`` (mirror about the edge value), or ``'constant'``
        (fill with ``cval``). Semantics match the reference C kernel,
        which keeps the pre-SciPy-1.6 formulas (reference deform.c:47-128).
        A list gives a per-input mode.
    cval : float or list of floats
        Fill value used by ``mode='constant'``; per-input when a list.
    crop : None or list of slices
        One ``slice(start, stop)`` per deformed axis (``slice(None)`` for
        a full axis). Only the cropped output window is computed — the
        deformation is still evaluated in full-image coordinates, so a
        crop of a deformed image equals the deformed full image cropped.
        Slices must have non-negative ``start``/``stop`` and no step.
    prefilter : bool
        If True (default), apply the B-spline prefilter to the inputs
        (for ``order > 1``) so the resampling interpolates the image
        values exactly; set False if the inputs already are B-spline
        coefficients. The displacement grid is always prefiltered.
    axis : None, int, tuple, or list of tuples
        The axes to deform, per input. Default: all axes. With e.g. a
        ``(H, W, C)`` RGB image, ``axis=(0, 1)`` deforms the image plane
        and applies the same deformation to every channel. Per-input
        tuples (a list) let inputs of different rank share a deformation;
        every tuple must be sorted and the selected axes must agree in
        shape across inputs.
    affine : None or numpy array
        Affine transform composed with the deformation, given as the
        ``(naxis, naxis)`` linear part, an ``(naxis, naxis + 1)`` matrix
        with a translation column, or the ``(naxis + 1, naxis + 1)``
        homogeneous form (homogeneous input is 2-D only). The output
        coordinate is mapped through the *inverse* of the matrix before
        the displacement is added (a pull-back, like the reference,
        deform_grid.py:392-399).
    rotate : None or float
        Rotation in degrees around the center of the (cropped) output,
        2-D images only (rank-2 deformation). Composed into ``affine``.
    zoom : None or float
        Scale factor around the same center, 2-D only. ``zoom > 1``
        magnifies the image. Composed into ``affine``.
    strategy : str, keyword-only
        Kernel selection: ``'auto'`` (default) uses the windowed row-gather
        TPU fast path when the (naxis, order) combination supports it,
        ``'windows'`` forces it, ``'gather'`` forces the plain
        element-gather fallback. Results are identical to 1e-12; this only
        affects performance.

    Returns
    -------
    numpy array or list of arrays
        The deformed image(s) with the input dtypes (integer outputs are
        rounded and clamped like the reference, deform.c:287-306).
    """
    if any(_is_complex_array(x)
           for x in (X if isinstance(X, list) else [X])):
        return _expand_complex_call(
            deform_grid, X, (displacement,),
            dict(order=order, mode=mode, cval=cval, crop=crop,
                 prefilter=prefilter, axis=axis, affine=affine,
                 rotate=rotate, zoom=zoom, strategy=strategy))
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
    """Gradient of :func:`deform_grid` w.r.t. the input image.

    Given the gradient ``dY`` of a scalar loss w.r.t. the *output* of
    :func:`deform_grid`, returns the gradient w.r.t. its *input*: the
    exact analytic adjoint of the whole forward operation (scatter-add of
    the interpolation stencils followed by the transpose spline
    prefilter), matching the reference ``deform_grid_gradient``
    (reference deform_grid.py:182-291). Use it to make the deformation a
    differentiable layer; the ``elasticdeform_tpu.tf`` / ``.torch`` shims
    and the JAX-native :func:`elasticdeform_tpu.deform` wire it up
    automatically.

    Parameters
    ----------
    dY : numpy array or list of arrays
        Gradient(s) w.r.t. the deformed output(s), with the output
        shape(s) of the forward call (i.e. the cropped shape when ``crop``
        was used).
    displacement, order, mode, cval, crop, prefilter, axis, affine, \
rotate, zoom, strategy
        Must be the same values that were passed to the forward
        :func:`deform_grid` call; see there for semantics.
    X_shape : None, tuple, or list of tuples
        Shape(s) of the original forward input(s). Required when ``crop``
        is used (the gradient is returned at the full uncropped shape,
        which cannot be inferred from ``dY`` alone); otherwise defaults
        to the shape(s) of ``dY``.

    Returns
    -------
    numpy array or list of arrays
        Gradient(s) w.r.t. the input(s), with shape ``X_shape`` and the
        dtype(s) of ``dY``. There is no gradient w.r.t. ``displacement``
        here (reference parity); the JAX-native path supports it.
    """
    if any(_is_complex_array(x)
           for x in (dY if isinstance(dY, list) else [dY])):
        return _expand_complex_call(
            deform_grid_gradient, dY, (displacement,),
            dict(order=order, mode=mode, cval=cval, crop=crop,
                 prefilter=prefilter, axis=axis, X_shape=X_shape,
                 affine=affine, rotate=rotate, zoom=zoom,
                 strategy=strategy), shape_key="X_shape")
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


def map_coordinates(X, coordinates, order=3, mode='constant', cval=0.0,
                    prefilter=True, axis=None, *, strategy="auto",
                    table_dtype=None):
    """Resample ``X`` at explicit per-voxel coordinates: numpy in, numpy
    out, jit-cached.

    TPU-accelerated ``scipy.ndimage.map_coordinates`` with the library's
    reference-parity (pre-SciPy-1.6) boundary modes: ``coordinates`` has
    shape ``(naxis, *out_shape)`` giving the input position to interpolate
    for every output voxel; the output has shape ``out_shape`` (any rank).
    With ``axis``, the remaining (channel) axes are carried along. Each
    static configuration compiles once and is cached, so this is safe to
    call per step from host code. Wrapper over the JAX-native
    :func:`elasticdeform_tpu.map_coordinates`, which also gives gradients
    w.r.t. the coordinates; see :func:`deform_grid` for parameter
    semantics shared with the deformation API.
    """
    from elasticdeform_tpu.core import _prepare_map

    X = np.asarray(X)
    if _is_complex_array(X):
        # host-side split: complex never reaches the device (the TPU
        # backend cannot execute complex ops); two real passes share the
        # jit cache entry
        cv = complex(cval)
        parts = [map_coordinates(np.ascontiguousarray(p), coordinates,
                                 order, mode, c, prefilter, axis,
                                 strategy=strategy, table_dtype=table_dtype)
                 for p, c in ((X.real, cv.real), (X.imag, cv.imag))]
        return (parts[0] + 1j * parts[1]).astype(X.dtype)
    coordinates, spec = _prepare_map(
        X, jnp.asarray(np.asarray(coordinates)), order, mode,
        cval, prefilter, axis, strategy, table_dtype)
    fn = _jitted_map_forward(spec)
    y = fn(jnp.asarray(X), coordinates)
    # astype preserves the numpy dtype contract when x64 is disabled
    # (the device path computes/casts in f32 then; cf. _to_host)
    return np.asarray(y).astype(X.dtype, copy=False)


def geometric_transform(X, mapping, output_shape=None, order=3,
                        mode='constant', cval=0.0, prefilter=True,
                        extra_arguments=(), extra_keywords=None, *,
                        strategy="auto"):
    """Resample through an arbitrary coordinate mapping: numpy in, numpy
    out (``scipy.ndimage.geometric_transform`` equivalent).

    ``mapping`` receives a tuple of output coordinate arrays (each of
    shape ``output_shape``) and returns a tuple of ``X.ndim`` input
    coordinate arrays — evaluated once on the host with numpy (not per
    voxel like scipy, so it must be vectorized arithmetic); the
    resampling itself runs jit-compiled on the device via
    :func:`map_coordinates`. See the JAX-native
    :func:`elasticdeform_tpu.geometric_transform` for a version that
    traces the mapping into the compiled program.
    """
    X = np.asarray(X)
    out_shape = tuple(int(s) for s in output_shape) \
        if output_shape is not None else X.shape
    idx = np.indices(out_shape, dtype=np.float64)
    coords = mapping(tuple(idx), *extra_arguments, **(extra_keywords or {}))
    coordinates = np.stack(
        [np.broadcast_to(np.asarray(c, dtype=np.float64), out_shape)
         for c in coords])
    return map_coordinates(X, coordinates, order, mode, cval, prefilter,
                           None, strategy=strategy)


def map_coordinates_gradient(dY, coordinates, order=3, mode='constant',
                             cval=0.0, prefilter=True, axis=None,
                             X_shape=None, *, strategy="auto"):
    """Backward-only adjoint of :func:`map_coordinates` w.r.t. ``X``:
    numpy in, numpy out, jit-cached.

    Maps an output cotangent ``dY`` to an input cotangent of shape
    ``X_shape`` (required) without paying a forward pass — mirroring
    :func:`deform_grid_gradient`; all other parameters must match the
    forward call.
    """
    from elasticdeform_tpu.core import _Shaped, _prepare_map

    if X_shape is None:
        raise ValueError("X_shape is required (the input shape cannot be "
                         "inferred from dY).")
    dY = np.asarray(dY)
    if _is_complex_array(dY):
        cv = complex(cval)
        parts = [map_coordinates_gradient(
            np.ascontiguousarray(p), coordinates, order, mode, c,
            prefilter, axis, X_shape, strategy=strategy)
            for p, c in ((dY.real, cv.real), (dY.imag, cv.imag))]
        return (parts[0] + 1j * parts[1]).astype(dY.dtype)
    shaped = _Shaped(tuple(int(s) for s in X_shape), dY.dtype)
    coordinates, spec = _prepare_map(
        shaped, jnp.asarray(np.asarray(coordinates)), order, mode, cval,
        prefilter, axis, strategy, None)
    fn = _jitted_map_gradient(spec)
    dx = fn(jnp.asarray(dY), coordinates)
    return np.asarray(dx).astype(dY.dtype, copy=False)


def deform_batch(X, displacement, order=3, mode='constant', cval=0.0,
                 crop=None, prefilter=True, axis=None, affine=None,
                 rotate=None, zoom=None, *, strategy="auto",
                 batch_impl="auto", table_dtype=None):
    """Batched :func:`deform_grid`: numpy in, numpy out, jit-cached.

    ``X``: ``(B, *image_shape)`` array (or list of such arrays sharing the
    deformation); ``displacement``: ``(B, naxis, *points)`` per-sample
    control grids. All other parameters are shared across the batch and
    follow :func:`deform_grid` (``axis``/``crop`` indices refer to the
    per-sample shape). Numpy wrapper over the JAX-native
    :func:`elasticdeform_tpu.deform_batch` — each static configuration
    compiles once and is cached, so this is safe to call per training
    step from host frameworks (the ``elasticdeform_tpu.torch`` / ``.tf``
    batched shims route here).
    """
    from elasticdeform_tpu.core import _prepare_batch

    if any(_is_complex_array(x)
           for x in (X if isinstance(X, list) else [X])):
        return _expand_complex_call(
            deform_batch, X, (displacement,),
            dict(order=order, mode=mode, cval=cval, crop=crop,
                 prefilter=prefilter, axis=axis, affine=affine,
                 rotate=rotate, zoom=zoom, strategy=strategy,
                 batch_impl=batch_impl, table_dtype=table_dtype))
    Xs, inv_affine, spec, use_native, _ = _prepare_batch(
        X, displacement, order, mode, cval, crop, prefilter, axis, affine,
        rotate, zoom, strategy, table_dtype, batch_impl)
    fn = _jitted_batch_forward(spec, use_native)
    ys = fn(_to_device(Xs), jnp.asarray(displacement),
            None if inv_affine is None else jnp.asarray(inv_affine))
    outputs = _to_host(ys, [np.dtype(x.dtype) for x in Xs])
    return outputs if isinstance(X, list) else outputs[0]


def deform_batch_gradient(dY, displacement, order=3, mode='constant',
                          cval=0.0, crop=None, prefilter=True, axis=None,
                          X_shape=None, affine=None, rotate=None, zoom=None,
                          *, strategy="auto", batch_impl="auto"):
    """Batched :func:`deform_grid_gradient`: numpy in, numpy out.

    Backward-only exact adjoint of :func:`deform_batch` w.r.t. the
    inputs: maps batched output cotangents ``dY`` (``(B, *output_shape)``
    or a list) to batched input cotangents given the per-sample
    ``displacement`` grids of the forward call. ``X_shape`` is the
    *per-sample* uncropped input shape(s), required when ``crop`` was
    used; all other parameters must match the forward call (see
    :func:`deform_grid_gradient` for their semantics).
    """
    from elasticdeform_tpu.core import _native_grad_ok, \
        _prepare_batch_gradient

    if any(_is_complex_array(x)
           for x in (dY if isinstance(dY, list) else [dY])):
        return _expand_complex_call(
            deform_batch_gradient, dY, (displacement,),
            dict(order=order, mode=mode, cval=cval, crop=crop,
                 prefilter=prefilter, axis=axis, X_shape=X_shape,
                 affine=affine, rotate=rotate, zoom=zoom,
                 strategy=strategy, batch_impl=batch_impl),
            shape_key="X_shape")
    dYs, inv_affine, spec, _, use_native = _prepare_batch_gradient(
        dY, displacement, order, mode, cval, crop, prefilter, axis,
        X_shape, affine, rotate, zoom, strategy, batch_impl)
    fn = _jitted_batch_gradient(spec, use_native and _native_grad_ok(spec))
    dxs = fn(_to_device(dYs), jnp.asarray(displacement),
             None if inv_affine is None else jnp.asarray(inv_affine))
    outputs = _to_host(dxs, [np.dtype(dy.dtype) for dy in dYs])
    return outputs if isinstance(dY, list) else outputs[0]
