"""Fourier-domain filters (``scipy.ndimage.fourier_*`` parity).

These operate on an already-FFT'd array (``jnp.fft.fftn`` /
``rfftn`` output) and multiply by the transfer function of the
corresponding spatial filter — the multipliers are *data-independent*,
so they are precomputed in numpy float64 at trace time (exactly like
the library's filter/prefilter matrices) and applied as one broadcast
multiply; everything stays traceable and exactly differentiable.

Transfer functions (verified numerically against scipy to <1e-15,
tests/test_fourier.py):

* gaussian:  ``prod_i exp(-2 pi^2 sigma_i^2 f_i^2)``
* uniform:   ``prod_i sinc(size_i f_i)``
* ellipsoid: ``1``/``2 J1(r)/r``/``3 (sin r / r - cos r)/r^2`` for
  1/2/3-D with ``r = pi * sqrt(sum (size_i f_i)^2)``
* shift:     ``exp(-2 pi i f . shift)``

``f_i`` is the normalized frequency ``fftfreq(n_i)``, except along the
``axis`` of a real transform (``n >= 0``): ``arange(m)/n`` (scipy's
rfft convention).

Note complex arithmetic is unavailable on the axon TPU backend (see
docs/source/design.rst) — on TPU keep these in a CPU-jitted stage or
apply the (real) gaussian/uniform/ellipsoid multipliers to the real
and imaginary parts separately.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from elasticdeform_tpu.ops.filters import normalize_sequence


def _freq_grids(shape, n, axis):
    """Per-axis normalized frequency vectors, broadcastable to shape."""
    ndim = len(shape)
    axis = axis % ndim
    grids = []
    for ax, m in enumerate(shape):
        if ax == axis and n >= 0:
            f = np.arange(m, dtype=np.float64) / float(n)
        else:
            f = np.fft.fftfreq(m)
        view = [1] * ndim
        view[ax] = m
        grids.append(f.reshape(view))
    return grids


def _apply_multiplier(X, mult):
    X = jnp.asarray(X)
    if jnp.issubdtype(X.dtype, jnp.complexfloating):
        real = jnp.float64 if X.dtype == jnp.complex128 else jnp.float32
    elif X.dtype in (jnp.float32, jnp.float64):
        real = X.dtype
    else:
        real = jnp.float32
    if np.iscomplexobj(mult):
        ctype = jnp.complex128 if real == jnp.float64 else jnp.complex64
        return X * jnp.asarray(mult, ctype)
    return X * jnp.asarray(mult, real)


def fourier_gaussian_multiplier(shape, sigma, n, axis):
    sigmas = [float(s) for s in
              normalize_sequence(sigma, len(shape), "sigma")]
    grids = _freq_grids(shape, n, axis)
    out = np.float64(1.0)
    for s, f in zip(sigmas, grids):
        out = out * np.exp(-2.0 * np.pi ** 2 * s * s * f * f)
    return np.broadcast_to(out, shape)


def fourier_uniform_multiplier(shape, size, n, axis):
    sizes = [float(s) for s in
             normalize_sequence(size, len(shape), "size")]
    grids = _freq_grids(shape, n, axis)
    out = np.float64(1.0)
    for s, f in zip(sizes, grids):
        out = out * np.sinc(s * f)
    return np.broadcast_to(out, shape)


def fourier_ellipsoid_multiplier(shape, size, n, axis):
    ndim = len(shape)
    if ndim > 3:
        raise NotImplementedError(
            "Only 1d, 2d and 3d inputs are supported")
    sizes = [float(s) for s in normalize_sequence(size, ndim, "size")]
    grids = _freq_grids(shape, n, axis)
    rr = np.float64(0.0)
    for s, f in zip(sizes, grids):
        rr = rr + (s * f) ** 2
    r = np.pi * np.sqrt(rr)
    r = np.broadcast_to(r, shape)
    with np.errstate(invalid="ignore", divide="ignore"):
        if ndim == 1:
            out = np.where(r == 0, 1.0, np.sin(r) / r)
        elif ndim == 2:
            from scipy.special import j1
            out = np.where(r == 0, 1.0, 2.0 * j1(r) / r)
        else:
            out = np.where(r == 0, 1.0,
                           3.0 * (np.sin(r) / r - np.cos(r)) / r ** 2)
    return out


def fourier_shift_multiplier(shape, shift, n, axis):
    shifts = [float(s) for s in
              normalize_sequence(shift, len(shape), "shift")]
    grids = _freq_grids(shape, n, axis)
    phase = np.float64(0.0)
    for s, f in zip(shifts, grids):
        phase = phase + s * f
    return np.broadcast_to(np.exp(-2j * np.pi * phase), shape)


def apply_fourier_filter(X, params, n, axis, kind):
    X = jnp.asarray(X)
    builder = {
        "gaussian": fourier_gaussian_multiplier,
        "uniform": fourier_uniform_multiplier,
        "ellipsoid": fourier_ellipsoid_multiplier,
        "shift": fourier_shift_multiplier,
    }[kind]
    mult = builder(tuple(int(s) for s in X.shape), params, int(n), axis)
    return _apply_multiplier(X, mult)
