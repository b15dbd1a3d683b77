"""Native (C++) host tier: ctypes bindings + reference-compatible wrappers.

The reference's native tier is a CPython extension (reference
_deform_grid.c / deform.c); ours is split in two:

* the TPU compute path lives in XLA (ops/), where the hardware wants it,
* this module provides the *host* native kernel — a self-contained C++
  implementation (ed_host.cpp) bound via ctypes, serving as

  1. a JAX-free CPU fast path (``elasticdeform_tpu.native.deform_grid``),
     useful for one-off host-side augmentation without compile overhead,
  2. an independent differential-testing oracle for the JAX tier
     (tests/test_native.py) — three-way agreement: scipy oracle, C++ host
     kernel, XLA kernels.

The shared library is compiled on demand with the system C++ compiler and
cached next to the package (or in a temp dir if the package is read-only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from pathlib import Path

import numpy as np

from elasticdeform_tpu import _normalize as _n
from elasticdeform_tpu.ops.prefilter import filter_matrix

_SRC = Path(__file__).with_name("ed_host.cpp")
_LOCK = threading.Lock()
_LIB = None
_LIB_ERR = None


def _build_library() -> Path:
    """Compile ed_host.cpp to a shared library (cached)."""
    cache_dir = Path(os.environ.get(
        "ELASTICDEFORM_TPU_NATIVE_CACHE",
        str(_SRC.parent)))
    out = cache_dir / "_ed_host.so"
    if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
        return out
    if not os.access(cache_dir, os.W_OK):
        cache_dir = Path(tempfile.gettempdir()) / "elasticdeform_tpu_native"
        cache_dir.mkdir(parents=True, exist_ok=True)
        out = cache_dir / "_ed_host.so"
        if out.exists() and out.stat().st_mtime >= _SRC.stat().st_mtime:
            return out
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", str(out), str(_SRC)]
    try:
        subprocess.run(cmd + ["-fopenmp"], check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # toolchains without OpenMP: build single-threaded
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib():
    global _LIB, _LIB_ERR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _LIB_ERR is not None:
            raise _LIB_ERR
        try:
            path = _build_library()
            lib = ctypes.CDLL(str(path))
        except Exception as e:  # compiler missing etc.
            _LIB_ERR = RuntimeError(
                f"native host kernel unavailable: {e}")
            raise _LIB_ERR from e
        lib.ed_deform_grid.restype = ctypes.c_int
        lib.ed_deform_grid.argtypes = [
            ctypes.c_int,                      # gradient
            ctypes.POINTER(ctypes.c_double),   # x
            ctypes.POINTER(ctypes.c_int64),    # S
            ctypes.c_int,                      # nd
            ctypes.c_int64,                    # C
            ctypes.POINTER(ctypes.c_double),   # disp
            ctypes.POINTER(ctypes.c_int64),    # ncp
            ctypes.POINTER(ctypes.c_double),   # y
            ctypes.POINTER(ctypes.c_int64),    # O
            ctypes.POINTER(ctypes.c_int64),    # offsets
            ctypes.c_int,                      # order
            ctypes.c_int,                      # mode
            ctypes.c_double,                   # cval
            ctypes.POINTER(ctypes.c_double),   # affine (nullable)
        ]
        lib.ed_spline_filter1d.restype = None
        lib.ed_spline_filter1d.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int]
        lib.ed_map_coordinates.restype = ctypes.c_int
        lib.ed_map_coordinates.argtypes = [
            ctypes.c_int,                      # gradient
            ctypes.POINTER(ctypes.c_double),   # x
            ctypes.POINTER(ctypes.c_int64),    # S
            ctypes.c_int,                      # nd
            ctypes.c_int64,                    # C
            ctypes.POINTER(ctypes.c_double),   # coords (nd, P)
            ctypes.c_int64,                    # P
            ctypes.POINTER(ctypes.c_double),   # y (P, C)
            ctypes.c_int,                      # order
            ctypes.c_int,                      # mode
            ctypes.c_double,                   # cval
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    try:
        _lib()
        return True
    except RuntimeError:
        return False


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def spline_filter1d(x: np.ndarray, order: int, axis: int) -> np.ndarray:
    """Host prefilter along ``axis`` via the C++ kernel (float64)."""
    lib = _lib()
    moved = np.moveaxis(np.asarray(x, dtype=np.float64), axis, 0)
    # the C++ filter runs in place — always copy so the caller's array
    # survives (ascontiguousarray would alias an already-contiguous input)
    buf = np.array(moved, dtype=np.float64, order="C", copy=True)
    n = buf.shape[0]
    m = int(buf.size // max(n, 1))
    lib.ed_spline_filter1d(_dptr(buf), n, m, int(order))
    return np.moveaxis(buf.reshape(moved.shape), 0, axis)


def _cast_output_np(t: np.ndarray, dtype) -> np.ndarray:
    """Numpy twin of ops.resample.cast_output (reference deform.c:287-306)."""
    dtype = np.dtype(dtype)
    if dtype.kind in "fc":
        return t.astype(dtype)
    if dtype.kind == "b":
        return np.trunc(t) != 0
    info = np.iinfo(dtype)
    if dtype.kind == "u":
        r = np.where(t > 0, t + 0.5, 0.0)
    else:
        r = np.where(t > 0, t + 0.5, t - 0.5)
    return np.trunc(np.clip(r, info.min, info.max)).astype(dtype)


def _cast_int_c_np(t: np.ndarray, dtype) -> np.ndarray:
    """Numpy twin of ops.resample.cast_int_c: C truncating/wrapping cast
    of floats into an integer dtype, kept as float64 (the reference's
    per-axis prefilter writeback, deform_grid.py:157-161)."""
    dtype = np.dtype(dtype)
    if dtype.kind == "b":
        dtype = np.dtype(np.uint8)
    info = np.iinfo(dtype)
    tr = np.trunc(t)
    span = 2.0 ** info.bits
    return tr - np.floor((tr - float(info.min)) / span) * span


def _prep_spatial(x: np.ndarray, axis):
    """Transpose to (deformed..., channels...) and flatten channels."""
    ndim = x.ndim
    channels = tuple(d for d in range(ndim) if d not in axis)
    perm = tuple(axis) + channels
    xt = np.ascontiguousarray(np.transpose(x, perm), dtype=np.float64)
    spatial = xt.shape[:len(axis)]
    chan_shape = xt.shape[len(axis):]
    C = int(np.prod(chan_shape)) if chan_shape else 1
    return xt.reshape(*spatial, C), perm, chan_shape


def _unprep(y: np.ndarray, perm, chan_shape, out_spatial):
    y = y.reshape(*out_spatial, *chan_shape)
    inv = np.argsort(perm)
    return np.transpose(y, inv)


def _prefilter_displacement_np(displacement):
    disp = np.asarray(displacement, dtype=np.float64).copy()
    for d in range(1, disp.ndim):
        disp = spline_filter1d(disp, 3, d)
    return np.ascontiguousarray(disp)


def deform_grid(X, displacement, order=3, mode='constant', cval=0.0,
                crop=None, prefilter=True, axis=None, affine=None,
                rotate=None, zoom=None):
    """Reference-compatible ``deform_grid`` on the native host kernel.

    Same semantics as :func:`elasticdeform_tpu.deform_grid` but computed on
    the CPU in float64 with zero JAX involvement.
    """
    from elasticdeform_tpu.api import _expand_complex_call, _is_complex_array
    if any(_is_complex_array(x)
           for x in (X if isinstance(X, list) else [X])):
        # complex inputs expand into real/imag pairs sharing the
        # deformation, exactly like the numpy API (the kernel is f64-only)
        return _expand_complex_call(
            deform_grid, X, (displacement,),
            dict(order=order, mode=mode, cval=cval, crop=crop,
                 prefilter=prefilter, axis=axis, affine=affine,
                 rotate=rotate, zoom=zoom))
    lib = _lib()
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
    disp_f = _prefilter_displacement_np(displacement)
    ncp = np.asarray(disp_f.shape[1:], dtype=np.int64)

    outputs = []
    for x, ax, o, m, cv, oshape in zip(Xs, axis_n, orders, modes, cvals,
                                       output_shapes):
        xt, perm, chan_shape = _prep_spatial(np.asarray(x), ax)
        int_like = np.dtype(x.dtype).kind in "bui"
        if prefilter and o > 1:
            for d in range(len(ax)):
                xt = spline_filter1d(xt, o, d)
                if int_like:
                    xt = _cast_int_c_np(xt, x.dtype)
        xt = np.ascontiguousarray(xt)
        naxis = len(ax)
        S = np.asarray(xt.shape[:naxis], dtype=np.int64)
        out_spatial = tuple(oshape[d] for d in ax)
        O = np.asarray(out_spatial, dtype=np.int64)
        offs = np.asarray(output_offset, dtype=np.int64)
        y = np.zeros((*out_spatial, xt.shape[-1]), dtype=np.float64)
        aff = None
        if inv_affine is not None:
            aff = np.ascontiguousarray(inv_affine, dtype=np.float64)
        rc = lib.ed_deform_grid(
            0, _dptr(xt), _iptr(S), naxis, xt.shape[-1],
            _dptr(disp_f), _iptr(ncp), _dptr(y), _iptr(O), _iptr(offs),
            int(o), int(m), float(cv),
            _dptr(aff) if aff is not None else None)
        if rc != 0:
            raise RuntimeError("native deform kernel failed")
        out = _unprep(y, perm, chan_shape, out_spatial)
        outputs.append(_cast_output_np(out, x.dtype))
    return outputs if isinstance(X, list) else outputs[0]


def deform_grid_gradient(dY, displacement, order=3, mode='constant',
                         cval=0.0, crop=None, prefilter=True, axis=None,
                         X_shape=None, affine=None, rotate=None, zoom=None):
    """Reference-compatible exact adjoint on the native host kernel."""
    from elasticdeform_tpu.api import _expand_complex_call, _is_complex_array
    if any(_is_complex_array(x)
           for x in (dY if isinstance(dY, list) else [dY])):
        return _expand_complex_call(
            deform_grid_gradient, dY, (displacement,),
            dict(order=order, mode=mode, cval=cval, crop=crop,
                 prefilter=prefilter, axis=axis, X_shape=X_shape,
                 affine=affine, rotate=rotate, zoom=zoom),
            shape_key="X_shape")
    lib = _lib()
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
    dXs_s = [_Shaped(s, dy.dtype) for s, dy in zip(X_shape, dYs)]

    axis_n, deform_shape = _n.normalize_axis_list(axis, dXs_s)
    output_shapes, output_offset = _n.compute_output_shapes(
        dXs_s, axis_n, deform_shape, crop)
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
    disp_f = _prefilter_displacement_np(displacement)
    ncp = np.asarray(disp_f.shape[1:], dtype=np.int64)

    outputs = []
    for dy, xs_shape, ax, o, m, cv in zip(dYs, X_shape, axis_n, orders,
                                          modes, cvals):
        dyt, perm, chan_shape = _prep_spatial(np.asarray(dy), ax)
        naxis = len(ax)
        out_spatial = dyt.shape[:naxis]
        spatial = tuple(int(xs_shape[d]) for d in ax)
        S = np.asarray(spatial, dtype=np.int64)
        O = np.asarray(out_spatial, dtype=np.int64)
        offs = np.asarray(output_offset, dtype=np.int64)
        dx = np.zeros((*spatial, dyt.shape[-1]), dtype=np.float64)
        aff = None
        if inv_affine is not None:
            aff = np.ascontiguousarray(inv_affine, dtype=np.float64)
        dyt = np.ascontiguousarray(dyt)
        rc = lib.ed_deform_grid(
            1, _dptr(dx), _iptr(S), naxis, dx.shape[-1],
            _dptr(disp_f), _iptr(ncp), _dptr(dyt), _iptr(O), _iptr(offs),
            int(o), int(m), float(cv),
            _dptr(aff) if aff is not None else None)
        if rc != 0:
            raise RuntimeError("native deform kernel failed")
        # transpose prefilter (adjoint of the forward per-axis filters):
        # multiplication by the transposed filter matrices
        if prefilter and o > 1:
            for d in range(naxis):
                F = filter_matrix(dx.shape[d], o).T
                dx = np.moveaxis(
                    np.tensordot(F, dx, axes=[[1], [d]]), 0, d)
        # reshape channels back and restore the original axis order, with
        # the full (uncropped) spatial shape
        dx_full = _unprep(dx, perm, chan_shape, spatial)
        outputs.append(_cast_output_np(dx_full, dy.dtype))
    return outputs if isinstance(dY, list) else outputs[0]


def deform_batch(X, displacement, **kwargs):
    """Batched host-native deform: per-sample displacement grids.

    JAX-free twin of :func:`elasticdeform_tpu.deform_batch` — ``X`` is
    ``(B, *image_shape)`` (or a list of such arrays sharing the
    deformation), ``displacement`` is ``(B, naxis, *points)``. Samples run
    sequentially; each call is already OpenMP-parallel inside the C++
    kernel (ed_host.cpp), so a thread pool here would only oversubscribe
    cores.
    """
    is_list = isinstance(X, list)
    Xs = X if is_list else [X]
    B = int(np.asarray(Xs[0]).shape[0])
    displacement = np.asarray(displacement)
    assert int(displacement.shape[0]) == B, \
        'displacement must have a leading batch axis matching X.'
    per_input = [[] for _ in Xs]
    for b in range(B):
        ys = deform_grid([np.asarray(x)[b] for x in Xs], displacement[b],
                         **kwargs)
        for acc, y in zip(per_input, ys):
            acc.append(y)
    outs = [np.stack(acc) for acc in per_input]
    return outs if is_list else outs[0]


def deform_batch_gradient(dY, displacement, **kwargs):
    """Batched host-native exact adjoint (per-sample loop over
    :func:`deform_grid_gradient`); ``X_shape`` follows the per-sample
    semantics of :func:`elasticdeform_tpu.deform_batch_gradient`."""
    is_list = isinstance(dY, list)
    dYs = dY if is_list else [dY]
    B = int(np.asarray(dYs[0]).shape[0])
    displacement = np.asarray(displacement)
    assert int(displacement.shape[0]) == B, \
        'displacement must have a leading batch axis matching dY.'
    per_input = [[] for _ in dYs]
    for b in range(B):
        dxs = deform_grid_gradient(
            [np.asarray(d)[b] for d in dYs], displacement[b], **kwargs)
        for acc, dx in zip(per_input, dxs):
            acc.append(dx)
    outs = [np.stack(acc) for acc in per_input]
    return outs if is_list else outs[0]


def map_coordinates(X, coordinates, order=3, mode='constant', cval=0.0,
                    prefilter=True, axis=None):
    """General resampler on the native host kernel (float64, no JAX).

    Host twin of :func:`elasticdeform_tpu.map_coordinates` with the same
    scipy semantics (integer inputs prefilter in float); ``coordinates``
    has shape ``(naxis, *out_shape)``, any output rank when no channel
    axes are carried.
    """
    X = np.asarray(X)
    if np.dtype(X.dtype).kind == "c":
        cv = complex(cval)
        parts = [map_coordinates(np.ascontiguousarray(p), coordinates,
                                 order, mode, c, prefilter, axis)
                 for p, c in ((X.real, cv.real), (X.imag, cv.imag))]
        return (parts[0] + 1j * parts[1]).astype(X.dtype)
    lib = _lib()
    axis_n, _ = _n.normalize_axis_list(axis, [X])
    ax = axis_n[0]
    naxis = len(ax)
    coords = np.asarray(coordinates, dtype=np.float64)
    if coords.ndim < 1 or coords.shape[0] != naxis:
        raise ValueError(
            "coordinates should have shape (naxis, *out_shape) with one "
            f"row per deformed axis; got {tuple(coords.shape)} for "
            f"{naxis} deformed axes.")
    out_spatial = tuple(coords.shape[1:])
    channels = tuple(d for d in range(X.ndim) if d not in ax)
    if channels and len(out_spatial) != naxis:
        raise ValueError(
            "with non-deformed (channel) axes, the output rank must equal "
            f"the number of deformed axes ({naxis}); got "
            f"{len(out_spatial)}.")
    (o,) = _n.normalize_order(order, [X])
    m = _n.normalize_mode(mode, [X])[0]
    xt, perm, chan_shape = _prep_spatial(X, ax)
    if prefilter and o > 1:
        for d in range(naxis):
            xt = spline_filter1d(xt, o, d)
    xt = np.ascontiguousarray(xt)
    S = np.asarray(xt.shape[:naxis], dtype=np.int64)
    P = int(np.prod(out_spatial)) if out_spatial else 1
    cflat = np.ascontiguousarray(coords.reshape(naxis, P))
    y = np.zeros((P, xt.shape[-1]), dtype=np.float64)
    rc = lib.ed_map_coordinates(
        0, _dptr(xt), _iptr(S), naxis, xt.shape[-1],
        _dptr(cflat), P, _dptr(y), int(o), int(m), float(cval))
    if rc != 0:
        raise RuntimeError("native map_coordinates kernel failed")
    if chan_shape:
        out = _unprep(y, perm, chan_shape, out_spatial)
    else:
        out = y.reshape(out_spatial)
    return _cast_output_np(out, X.dtype)


def map_coordinates_gradient(dY, coordinates, order=3, mode='constant',
                             cval=0.0, prefilter=True, axis=None,
                             X_shape=None):
    """Backward-only adjoint of :func:`map_coordinates` on the host
    kernel: scatter-add of the interpolation stencils followed by the
    transpose prefilter. ``X_shape`` is required."""
    lib = _lib()
    if X_shape is None:
        raise ValueError("X_shape is required (the input shape cannot be "
                         "inferred from dY).")
    dY = np.asarray(dY)
    if np.dtype(dY.dtype).kind == "c":
        cv = complex(cval)
        parts = [map_coordinates_gradient(
            np.ascontiguousarray(p), coordinates, order, mode, c,
            prefilter, axis, X_shape)
            for p, c in ((dY.real, cv.real), (dY.imag, cv.imag))]
        return (parts[0] + 1j * parts[1]).astype(dY.dtype)

    class _Shaped:
        def __init__(self, shape, dtype):
            self.shape = tuple(int(s) for s in shape)
            self.ndim = len(self.shape)
            self.dtype = dtype
    shaped = _Shaped(X_shape, dY.dtype)
    axis_n, _ = _n.normalize_axis_list(axis, [shaped])
    ax = axis_n[0]
    naxis = len(ax)
    coords = np.asarray(coordinates, dtype=np.float64)
    if coords.ndim < 1 or coords.shape[0] != naxis:
        raise ValueError(
            "coordinates should have shape (naxis, *out_shape) with one "
            f"row per deformed axis; got {tuple(coords.shape)} for "
            f"{naxis} deformed axes.")
    out_spatial = tuple(coords.shape[1:])
    (o,) = _n.normalize_order(order, [shaped])
    m = _n.normalize_mode(mode, [shaped])[0]
    channels = tuple(d for d in range(shaped.ndim) if d not in ax)
    if channels:
        # bring dY into (out_spatial..., channels...) layout matching the
        # forward's output axes
        dyt, perm, chan_shape = _prep_spatial(
            np.asarray(dY, dtype=np.float64), ax)
    else:
        dyt = np.asarray(dY, dtype=np.float64).reshape(*out_spatial, 1)
        perm, chan_shape = tuple(range(len(out_spatial))), ()
    C = dyt.shape[-1]
    spatial = tuple(shaped.shape[d] for d in ax)
    P = int(np.prod(out_spatial)) if out_spatial else 1
    cflat = np.ascontiguousarray(coords.reshape(naxis, P))
    dyt = np.ascontiguousarray(dyt.reshape(P, C))
    dx = np.zeros((*spatial, C), dtype=np.float64)
    S = np.asarray(spatial, dtype=np.int64)
    rc = lib.ed_map_coordinates(
        1, _dptr(dx), _iptr(S), naxis, C,
        _dptr(cflat), P, _dptr(dyt), int(o), int(m), float(cval))
    if rc != 0:
        raise RuntimeError("native map_coordinates kernel failed")
    # transpose prefilter (adjoint of the forward per-axis filters):
    # multiplication by the transposed filter matrices
    if prefilter and o > 1:
        for d in range(naxis):
            F = filter_matrix(dx.shape[d], o).T
            dx = np.moveaxis(
                np.tensordot(F, dx, axes=[[1], [d]]), 0, d)
    if chan_shape:
        out = _unprep(dx, perm, chan_shape, spatial)
    else:
        out = dx.reshape(spatial)
    return _cast_output_np(out, dY.dtype)
