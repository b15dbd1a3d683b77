"""Gaussian filtering as MXU matmuls (``scipy.ndimage.gaussian_filter``
parity).

Registration pipelines need Gaussian smoothing next to the resampler —
demons-style methods regularize their update/deformation fields by
Gaussian convolution every iteration, and multi-scale similarity pyramids
blur before downsampling. scipy computes these with a recursive per-line
``correlate1d``; the TPU-native formulation follows the library's
prefilter design (ops/prefilter.py): the 1-D correlation with any
boundary mode is a static, data-independent linear map of the axis, so it
is precomputed (numpy, trace time) as an ``(n, n)`` matrix — the
truncated kernel banded along the diagonal with the boundary extension
*folded* into the edge columns — and applied as one
``Precision.HIGHEST`` tensordot per axis. Constant-mode boundary mass
becomes an affine bias (``cval *`` the out-of-range weight sum).

Kernel values replicate ``scipy.ndimage._filters._gaussian_kernel1d``
(including derivative orders via the Hermite-polynomial recursion and
scipy's ``correlate1d`` tap reversal), so outputs match scipy to fp
precision for every ``sigma`` / ``order`` / ``truncate`` / ``radius``;
differential-tested in tests/test_gaussian.py. Everything is linear in
the input, so autodiff provides the exact adjoint (the transpose
matmuls) with no custom VJP needed.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma, order, radius):
    """The scipy Gaussian (derivative-)kernel: ``order`` is the
    derivative order (0 = plain smoothing); ``radius`` taps each side.
    Matches scipy.ndimage._filters._gaussian_kernel1d (f64 numpy)."""
    if order < 0:
        raise ValueError("order must be non-negative")
    sigma2 = sigma * sigma
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi_x = np.exp(-0.5 / sigma2 * x ** 2)
    phi_x = phi_x / phi_x.sum()
    if order == 0:
        return phi_x
    # f(x) = q(x) phi(x) with q a Hermite-style polynomial:
    # q' picks up d/dx, and multiplying by p'(x) = -x/sigma2 shifts
    # coefficients — iterate the combined operator `order` times
    q = np.zeros(order + 1)
    q[0] = 1
    D = np.diag(np.arange(1, order + 1), 1)      # q -> q'
    P = np.diag(np.ones(order), -1) / -sigma2    # q -> q * p'
    for _ in range(order):
        q = (D + P).dot(q)
    return (x[:, None] ** np.arange(order + 1)).dot(q) * phi_x


def _fold_index(j, n, mode):
    """Filter-style boundary extension index (scipy.ndimage correlate1d
    conventions — note these are the FILTER modes, which scipy 1.6 did
    not change; the interpolation grid modes elsewhere in this library
    keep the pre-1.6 semantics the reference C uses)."""
    if mode == "nearest":
        return min(max(j, 0), n - 1)
    if mode == "wrap":
        return j % n
    if mode == "reflect":                        # (d c b a | a b c d |
        period = 2 * n
        j = j % period
        return j if j < n else period - 1 - j
    if mode == "mirror":                         # (d c b | a b c d |
        if n == 1:
            return 0
        period = 2 * n - 2
        j = j % period
        return j if j < n else period - j
    raise ValueError(f"unsupported filter mode: {mode}")


@functools.lru_cache(maxsize=None)
def filter_matrix(n, weights_key, mode):
    """``(M, b)``: correlation along an axis of length ``n`` with the
    tap tuple ``weights_key`` under boundary ``mode``, as a dense matrix
    plus the constant-mode bias weight per row (multiply by cval)."""
    weights = np.asarray(weights_key, dtype=np.float64)
    r = (len(weights) - 1) // 2
    M = np.zeros((n, n))
    b = np.zeros((n,))
    for k, w in enumerate(weights):
        off = k - r
        for i in range(n):
            j = i + off
            if 0 <= j < n:
                M[i, j] += w
            elif mode == "constant":
                b[i] += w
            else:
                M[i, _fold_index(j, n, mode)] += w
    return M, b


def gaussian_filter1d_matrix(n, sigma, order, mode, truncate, radius):
    """Filter matrix + bias for scipy's ``gaussian_filter1d`` semantics:
    kernel reversed as correlate1d's origin-0 application does."""
    sigma = float(sigma)
    if sigma <= 0:
        raise ValueError("sigma must be positive")
    if radius is None:
        radius = int(truncate * sigma + 0.5)
    radius = int(radius)
    if radius < 0:
        raise ValueError("radius must be a nonnegative integer")
    weights = gaussian_kernel1d(sigma, int(order), radius)[::-1]
    return filter_matrix(int(n), tuple(weights.tolist()), mode)


def apply_filter1d(X, axis, sigma, order, mode, cval, truncate, radius):
    """Apply the Gaussian (derivative-)filter along one axis of a jax
    array via the precomputed matrix; exact-adjoint by linearity."""
    X = jnp.asarray(X)
    axis = axis % X.ndim
    n = int(X.shape[axis])
    M, b = gaussian_filter1d_matrix(n, sigma, order, mode, truncate,
                                    radius)
    dtype = X.dtype if X.dtype in (jnp.float32, jnp.float64) else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    out = jnp.moveaxis(
        jnp.tensordot(jnp.asarray(M, dtype=dtype), X.astype(dtype),
                      axes=[[1], [axis]],
                      precision=jax.lax.Precision.HIGHEST),
        0, axis)
    if mode == "constant" and float(np.abs(b).max()) > 0.0:
        shape = [1] * X.ndim
        shape[axis] = n
        out = out + jnp.asarray(b * float(cval), dtype=dtype).reshape(shape)
    return out
