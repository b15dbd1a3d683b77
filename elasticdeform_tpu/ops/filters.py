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
import os

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
def filter_matrix(n, weights_key, mode, center=None):
    """``(M, b)``: correlation along an axis of length ``n`` with the
    tap tuple ``weights_key`` under boundary ``mode``, as a dense matrix
    plus the constant-mode bias weight per row (multiply by cval).
    ``center`` is the tap index aligned with the output position
    (scipy correlate1d: ``len(weights) // 2 + origin``); default is the
    symmetric center of an odd-length kernel."""
    weights = np.asarray(weights_key, dtype=np.float64)
    r = (len(weights) - 1) // 2 if center is None else int(center)
    if not 0 <= r < len(weights):
        raise ValueError("origin shifts the filter off its support "
                         f"(center {r} for {len(weights)} taps).")
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


def apply_matrix1d(X, axis, M, b, mode, cval):
    """Apply a precomputed ``(n, n)`` filter matrix (+ constant-mode
    bias) along one axis of a jax array as a HIGHEST-precision matmul;
    exact-adjoint by linearity."""
    X = jnp.asarray(X)
    axis = axis % X.ndim
    n = int(X.shape[axis])
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


def apply_filter1d(X, axis, sigma, order, mode, cval, truncate, radius,
                   int_exact=False):
    """Apply the Gaussian (derivative-)filter along one axis of a jax
    array via the precomputed matrix; exact-adjoint by linearity.
    ``int_exact`` requests scipy's paired summation order (see
    :func:`apply_paired1d`) for integer-writeback callers."""
    X = jnp.asarray(X)
    axis = axis % X.ndim
    n = int(X.shape[axis])
    if sigma is not None and float(sigma) <= 0:
        raise ValueError("sigma must be positive")
    if radius is None:
        radius = int(float(truncate) * float(sigma) + 0.5)
    radius = int(radius)
    if radius < 0:
        raise ValueError("radius must be a nonnegative integer")
    weights = gaussian_kernel1d(float(sigma), int(order), radius)[::-1]
    if int_exact:
        out = apply_paired1d(X, weights, axis, mode, cval,
                             len(weights) // 2)
        if out is not None:
            return out
    M, b = filter_matrix(n, tuple(weights.tolist()), mode)
    return apply_matrix1d(X, axis, M, b, mode, cval)


_DBL_EPS = float(np.finfo(np.float64).eps)


def _scipy_pair_class(weights):
    """scipy ``NI_Correlate1D``'s kernel-symmetry detection
    (scipy/ndimage/src/ni_filters.c): odd length and taps equal (+1,
    symmetric) or negated (-1, antisymmetric) across the center within
    DBL_EPSILON; 0 selects the general left-to-right branch."""
    L = len(weights)
    if not L & 1:
        return 0
    s1 = L // 2
    fw = np.asarray(weights, np.float64)
    if all(abs(fw[s1 + i] - fw[s1 - i]) <= _DBL_EPS
           for i in range(1, s1 + 1)):
        return 1
    if all(abs(fw[s1 + i] + fw[s1 - i]) <= _DBL_EPS
           for i in range(1, s1 + 1)):
        return -1
    return 0


def apply_paired1d(X, weights, axis, mode, cval, center):
    """Evaluate ``correlate1d`` in scipy's paired summation order, or
    return None when the kernel takes scipy's general branch.

    scipy's C core special-cases symmetric/antisymmetric odd kernels:
    ``sum = x[c]*w[c]; for ii=s1..1: sum += (x[c-ii] ± x[c+ii])*w[c-ii]``
    (outermost pair first). The banded-matmul path sums the same taps in
    a different association, and for INTEGER outputs a 1-ulp difference
    at a truncation edge becomes a visible off-by-one (a fuzzed int32
    gaussian landed at 2.9999999999999996 vs 3.0000000000000004 —
    trunc 2 vs 3). Integer-writeback callers route here so the float
    value is bit-identical to scipy's before the cast. Linear in X, so
    autodiff stays exact."""
    pair = _scipy_pair_class(weights)
    if pair == 0:
        return None
    fw = np.asarray(weights, np.float64)
    L = len(fw)
    s1 = L // 2
    dtype = X.dtype if X.dtype in (jnp.float32, jnp.float64) else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    Xf = X.astype(dtype)
    # pad so padded[i + k] is the input sample tap k reads at output i
    Xp = pad_axis(Xf, axis, int(center), L - 1 - int(center), mode, cval)
    n = int(X.shape[axis])

    def sl(k):
        return jax.lax.slice_in_dim(Xp, k, k + n, axis=axis)

    acc = sl(s1) * float(fw[s1])
    for ii in range(s1, 0, -1):
        if pair > 0:
            t = sl(s1 - ii) + sl(s1 + ii)
        else:
            t = sl(s1 - ii) - sl(s1 + ii)
        acc = acc + t * float(fw[s1 - ii])
    return acc


def apply_correlate1d(X, weights, axis, mode, cval, origin,
                      int_exact=False):
    """scipy ``correlate1d`` semantics: tap ``len(weights)//2 + origin``
    aligns with the output position. ``int_exact`` requests scipy's
    paired summation order for symmetric/antisymmetric kernels (see
    :func:`apply_paired1d`)."""
    X = jnp.asarray(X)
    axis = axis % X.ndim
    weights = np.asarray(weights, dtype=np.float64)
    if weights.ndim != 1 or weights.size == 0:
        raise ValueError("weights must be a non-empty 1-D sequence")
    center = len(weights) // 2 + int(origin)
    if not 0 <= center < len(weights):
        raise ValueError("origin shifts the filter off its support "
                         f"(center {center} for {len(weights)} taps).")
    if int_exact:
        out = apply_paired1d(X, weights, axis, mode, cval, center)
        if out is not None:
            return out
    M, b = filter_matrix(int(X.shape[axis]), tuple(weights.tolist()),
                         mode, center)
    return apply_matrix1d(X, axis, M, b, mode, cval)


# ---------------------------------------------------------------------------
# shared boundary-extension helpers (used here and by ops/morphology.py)

_FILTER_MODES = ("reflect", "constant", "nearest", "mirror", "wrap")
_MODE_ALIASES = {"grid-mirror": "reflect", "grid-wrap": "wrap",
                 "grid-constant": "constant"}


def normalize_sequence(value, n, name):
    """Broadcast a scalar to ``n`` entries; validate sequence length
    (scipy ``_normalize_sequence`` semantics)."""
    if isinstance(value, (list, tuple, np.ndarray)):
        seq = list(value)
        if len(seq) != n:
            raise RuntimeError(
                f"{name} must have length equal to input rank ({n}); "
                f"got {len(seq)}")
        return seq
    return [value] * n


def check_mode(mode):
    mode = _MODE_ALIASES.get(mode, mode)
    if mode not in _FILTER_MODES:
        raise RuntimeError(f"boundary mode not supported: {mode!r}")
    return mode


def pad_axis(X, axis, lo, hi, mode, cval):
    """Extend one axis by (lo, hi) under a scipy *filter* boundary mode:
    a single static ``jnp.take`` with fold indices precomputed in numpy
    (constant mode pads with cval instead). Any pad width works — the
    fold repeats exactly like scipy's."""
    if lo == 0 and hi == 0:
        return X
    n = int(X.shape[axis])
    if mode == "constant":
        pads = [(0, 0)] * X.ndim
        pads[axis] = (int(lo), int(hi))
        return jnp.pad(X, pads, constant_values=jnp.asarray(cval, X.dtype))
    idx = np.array([_fold_index(j, n, mode)
                    for j in range(-int(lo), n + int(hi))], dtype=np.int32)
    return jnp.take(X, jnp.asarray(idx), axis=axis)


def pad_all(X, pads, modes, cval):
    for ax, ((lo, hi), mode) in enumerate(zip(pads, modes)):
        X = pad_axis(X, ax, lo, hi, mode, cval)
    return X


# The matmul path stacks prod(kernel.shape[:-1]) banded (n, n) filter
# matrices and a (lead taps x volume) slice stack; cap both footprints
# (bytes, float32) so huge last axes / kernels / volumes fall back to
# the unrolled tap-stack path instead of blowing HBM.
_CORRELATE_MATMUL_BYTES = 64 << 20
_CORRELATE_STACK_BYTES = 1 << 30
_CORRELATE_UNROLL_TAPS = 4096


def apply_correlate(X, weights, mode, cval, origin, convolution=False):
    """N-D correlation/convolution with an arbitrary kernel
    (``scipy.ndimage.correlate`` / ``convolve`` equivalent), as MXU
    matmuls: the last kernel axis folds into a banded ``filter_matrix``
    per leading tap offset (boundary extension folded into the edge
    columns, like the Gaussian tier), the leading axes become static
    shifted slices of the index-padded input, and the whole thing
    contracts as ONE ``Precision.HIGHEST`` dot over (leading taps x
    last axis). A C_in=1 N-D ``conv_general_dilated`` uses ~1/128 of
    the systolic array and measured 0.5x scipy-CPU on a 5^3 kernel —
    this formulation is the one that earns the Gaussian family its
    throughput. ``convolve`` reverses the kernel and mirrors the origin
    (scipy ``_correlate_or_convolve``). Linear => exact adjoint by
    autodiff (slice transposes to zero-pad, matmul to its transpose).

    Fallback for kernels whose matrix stack would exceed
    ``_CORRELATE_MATMUL_BYTES``: an unrolled weighted sum of static
    shifted slices (fused elementwise pass)."""
    X = jnp.asarray(X)
    w = np.asarray(weights, dtype=np.float64)
    if w.ndim != X.ndim:
        raise RuntimeError("filter weights array has incorrect shape.")
    if w.size == 0:
        raise ValueError("weights must not be empty")
    origins = [int(o) for o in
               normalize_sequence(origin, X.ndim, "origin")]
    if convolution:
        w = w[tuple(slice(None, None, -1) for _ in range(w.ndim))]
        origins = [-o if k & 1 else -o - 1
                   for o, k in zip(origins, w.shape)]
    mode = check_mode(mode)
    pads = []
    for k, o in zip(w.shape, origins):
        c = k // 2 + o
        if not 0 <= c < k:
            raise ValueError("invalid origin")
        pads.append((c, k - 1 - c))
    dtype = X.dtype if X.dtype in (jnp.float32, jnp.float64) else (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

    n_last = int(X.shape[-1])
    k_lead = int(np.prod(w.shape[:-1], dtype=np.int64))
    lead_taps = [t for t in np.ndindex(*w.shape[:-1])
                 if np.any(w[t])]
    mat_bytes = len(lead_taps) * n_last * n_last * 4
    stack_bytes = len(lead_taps) * int(X.size) * 4
    if (lead_taps and mat_bytes <= _CORRELATE_MATMUL_BYTES
            and stack_bytes <= _CORRELATE_STACK_BYTES):
        # pad the leading axes only; the last axis boundary is folded
        # into the filter matrices
        Xp = pad_all(X.astype(dtype), pads[:-1],
                     [mode] * (X.ndim - 1), cval)
        shape_lead = X.shape[:-1]
        slices = []
        mats = []
        bias = np.zeros((n_last,))
        c_last = w.shape[-1] // 2 + origins[-1]
        for t in lead_taps:
            start = [int(v) for v in t] + [0]
            limit = [s + d for s, d in zip(start, shape_lead)] + [n_last]
            slices.append(jax.lax.slice(Xp, start, limit))
            M, b = filter_matrix(n_last, tuple(w[t].tolist()), mode,
                                 c_last)
            mats.append(M)
            bias += b
        if os.environ.get("ELASTICDEFORM_TPU_CORRELATE_ONEDOT") == "1":
            # single stacked dot: same flops as the separated sum below
            # but materializes a (lead taps x volume) stack; measured
            # equal-throughput-within-dispatch-floor on v5e
            # (bench_artifacts/probe_correlate_20260819_182708.json:
            # 274 vs 324 Mvox/s streamed K=4) — kept behind an env flag
            # for A/Bs
            S = jnp.stack(slices, axis=-2)     # (*lead, k_nz, n_last)
            S = S.reshape(X.shape[:-1] + (len(lead_taps) * n_last,))
            W = jnp.asarray(np.concatenate(mats, axis=1).T, dtype)
            out = jnp.matmul(S, W, precision=jax.lax.Precision.HIGHEST)
        else:
            out = None
            for sl, M in zip(slices, mats):
                term = jnp.matmul(sl, jnp.asarray(M.T, dtype),
                                  precision=jax.lax.Precision.HIGHEST)
                out = term if out is None else out + term
        if mode == "constant" and float(np.abs(bias).max()) > 0.0:
            out = out + jnp.asarray(bias * float(cval), dtype)
        return out
    del k_lead
    Xp = pad_all(X.astype(dtype), pads, [mode] * X.ndim, cval)
    taps = list(zip(*np.nonzero(w)))
    if not taps:                         # all-zero kernel
        return jnp.zeros(X.shape, dtype)
    if len(taps) <= _CORRELATE_UNROLL_TAPS:
        shape = X.shape
        out = None
        for tap in taps:                 # kernel raster order, like scipy
            start = [int(t) for t in tap]
            limit = [s + d for s, d in zip(start, shape)]
            term = jnp.asarray(float(w[tap]), dtype) * jax.lax.slice(
                Xp, start, limit)
            out = term if out is None else out + term
        return out
    out = jax.lax.conv_general_dilated(
        Xp[None, None], jnp.asarray(w, dtype)[None, None],
        window_strides=(1,) * X.ndim, padding="VALID",
        precision=jax.lax.Precision.HIGHEST)
    return out[0, 0]
