"""B-spline prefilter (sample values -> spline coefficients) and its adjoint.

The reference runs ``scipy.ndimage.spline_filter1d`` on the host for the
forward prefilter (reference deform_grid.py:154-169) and a hand-written
transpose IIR recursion for the gradient (``NI_SplineFilter1DGrad``,
reference deform.c:1049-1168, poles at deform.c:1063-1084).

TPU-native design: the prefilter along an axis of length ``n`` is a *linear*
map, so it equals multiplication by a dense ``n x n`` matrix. We precompute
that matrix once per ``(n, order)`` on the host (float64, cached) by running
the causal/anti-causal recursions on the identity matrix, then apply it on
device as a single ``tensordot`` — which XLA places on the MXU. This replaces
a length-``n`` sequential scan (the least TPU-friendly construct) with one
matmul, and makes the exact adjoint trivially available as multiplication by
the transposed matrix (machine-precision agreement with the reference's
transpose recursion, which is the transpose of the same linear map).
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Truncation tolerance of the recursion initialization, matching both SciPy
# and the reference (deform.c:1046 ``TOLERANCE 1e-15``).
_TOLERANCE = 1e-15


def spline_poles(order: int):
    """IIR filter poles per order (reference deform.c:1063-1084)."""
    if order in (0, 1):
        return ()
    if order == 2:
        return (math.sqrt(8.0) - 3.0,)
    if order == 3:
        return (math.sqrt(3.0) - 2.0,)
    if order == 4:
        return (
            math.sqrt(664.0 - math.sqrt(438976.0)) + math.sqrt(304.0) - 19.0,
            math.sqrt(664.0 + math.sqrt(438976.0)) - math.sqrt(304.0) - 19.0,
        )
    if order == 5:
        return (
            math.sqrt(67.5 - math.sqrt(4436.25)) + math.sqrt(26.25) - 6.5,
            math.sqrt(67.5 + math.sqrt(4436.25)) - math.sqrt(26.25) - 6.5,
        )
    raise ValueError("order should be 0, 1, 2, 3, 4 or 5.")


def _filter_lines(lines: np.ndarray, order: int) -> np.ndarray:
    """Apply the 1-D spline prefilter along axis 0 of ``lines`` (float64).

    Vectorized over the remaining axes. This is the classic
    causal/anti-causal recursive filter with mirror ("reflect about the edge
    sample") boundary initialization — the algorithm behind
    ``scipy.ndimage.spline_filter1d(mode='mirror')``, which is what the
    reference invokes at deform_grid.py:160,168.
    """
    poles = spline_poles(order)
    if not poles:
        return lines
    n = lines.shape[0]
    if n <= 1:
        return lines
    ln = np.array(lines, dtype=np.float64, copy=True)
    weight = 1.0
    for p in poles:
        weight *= (1.0 - p) * (1.0 - 1.0 / p)
    ln *= weight
    for p in poles:
        # causal initialization (mirror boundary), truncated at _TOLERANCE
        horizon = int(np.ceil(np.log(_TOLERANCE) / np.log(abs(p))))
        if horizon < n:
            zn = p
            acc = ln[0].copy()
            for k in range(1, horizon):
                acc += zn * ln[k]
                zn *= p
            ln[0] = acc
        else:
            zn = p
            iz = 1.0 / p
            z2n = p ** (n - 1)
            acc = ln[0] + z2n * ln[n - 1]
            z2n *= z2n * iz
            for k in range(1, n - 1):
                acc += (zn + z2n) * ln[k]
                zn *= p
                z2n *= iz
            ln[0] = acc / (1.0 - p ** (2 * n - 2))
        # causal recursion
        for k in range(1, n):
            ln[k] += p * ln[k - 1]
        # anti-causal initialization (mirror boundary)
        ln[n - 1] = (p / (p * p - 1.0)) * (ln[n - 1] + p * ln[n - 2])
        # anti-causal recursion
        for k in range(n - 2, -1, -1):
            ln[k] = p * (ln[k + 1] - ln[k])
    return ln


@functools.lru_cache(maxsize=None)
def filter_matrix(n: int, order: int) -> np.ndarray:
    """Dense ``n x n`` prefilter matrix ``F`` with ``coeffs = F @ samples``.

    Built by filtering the identity matrix column-by-column (vectorized).
    Cached per ``(n, order)``; float64.
    """
    if order <= 1 or n <= 1:
        return np.eye(n, dtype=np.float64)
    return np.ascontiguousarray(_filter_lines(np.eye(n, dtype=np.float64), order))


# B-spline kernel values at integer offsets, per order (the row the
# sampling matrix places around its diagonal). Closed forms from the
# centered cardinal B-splines; order 0/1 are identities.
_BSPLINE_INT_KERNEL = {
    2: (6 / 8, 1 / 8),
    3: (4 / 6, 1 / 6),
    4: (230 / 384, 76 / 384, 1 / 384),
    5: (66 / 120, 26 / 120, 1 / 120),
}


def _fold_index_bc(q: int, n: int, bc: str) -> int:
    """Fold integer index ``q`` into ``[0, n)`` under a boundary
    condition: 'mirror' (symmetric about the edge SAMPLES, period
    ``2n-2``), 'reflect' (symmetric about the half-sample edges, period
    ``2n``), or 'wrap' (periodic)."""
    if n == 1:
        return 0
    if bc == "mirror":
        m = q % (2 * n - 2)
        return 2 * n - 2 - m if m >= n else m
    if bc == "reflect":
        m = q % (2 * n)
        return 2 * n - 1 - m if m >= n else m
    if bc == "wrap":
        return q % n
    raise ValueError(f"unknown boundary condition {bc!r}")


@functools.lru_cache(maxsize=None)
def filter_matrix_bc(n: int, order: int, bc: str = "mirror") -> np.ndarray:
    """Exact ``n x n`` prefilter matrix for a spline boundary condition.

    Built as the inverse of the B-spline *sampling* matrix
    ``S[i, fold(i+k)] += B(k)`` — interpolating the coefficients
    ``F @ x`` with the matching index extension reproduces ``x`` at the
    sample points exactly, which is the mathematical object behind
    ``scipy.ndimage.spline_filter1d``'s per-mode exact boundary inits.
    Empirically pinned mode->bc map (vs scipy 1.16, all orders 2-5 at
    float64 round-off): interpolation modes 'mirror'/'constant'/'wrap'/
    'grid-constant' -> ``'mirror'``; 'reflect'/'grid-mirror'/'nearest'
    -> ``'reflect'``; 'grid-wrap' -> ``'wrap'``. ``'mirror'`` delegates
    to the IIR-built :func:`filter_matrix` (identical to 1e-15).
    """
    if order <= 1 or n <= 1:
        return np.eye(n, dtype=np.float64)
    if bc == "mirror":
        return filter_matrix(n, order)
    ks = _BSPLINE_INT_KERNEL[order]
    r = len(ks) - 1
    S = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for k in range(-r, r + 1):
            S[i, _fold_index_bc(i + k, n, bc)] += ks[abs(k)]
    return np.ascontiguousarray(np.linalg.inv(S))


def _apply_matrix(x, mat: np.ndarray, axis: int):
    """Contract ``mat`` (n_out, n_in) with ``x`` along ``axis`` on device.

    Precision.HIGHEST is required: TPU matmuls default to bfloat16 inputs,
    and the filter matrix has gain ~6 with cancellation — bf16 noise there
    breaks the 1e-5 parity contract.
    """
    x = jnp.asarray(x)
    m = jnp.asarray(mat, dtype=x.dtype)
    out = jnp.tensordot(m, x, axes=[[1], [axis]],
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(out, 0, axis)


# ---------------------------------------------------------------------------
# associative_scan IIR path for very large axes
#
# The dense filter matrix costs O(n) flops per voxel per axis and O(n^2)
# memory for the matrix itself — fine for the sizes this library targets
# (<= ~2K per axis, where one MXU matmul beats everything), but wrong
# asymptotics for 8K+ axes. The recursion itself is first-order linear
# with a CONSTANT coefficient per pole, so it maps onto
# ``lax.associative_scan`` over affine maps (a, b) with composition
# ``(a1*a2, a2*b1 + b2)``: O(log n) depth, O(n) memory, identical
# mathematics to the reference recursion (deform.c:1087-1115) including
# the truncated-horizon mirror boundary initializations. SURVEY.md §7
# names exactly this formulation for the scan-unfriendly IIR.

def _scan_min_n() -> int:
    """Axis length from which the prefilter switches to associative_scan.

    Default 8192: below that the dense HIGHEST matmul is competitive on
    the MXU and bit-stable, and the n x n matrix stays small; above, the
    matrix itself becomes the problem (8192^2 f32 = 256 MiB per (n,
    order) cache entry). Override with
    ``ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN`` (0 disables the scan path).
    """
    v = int(os.environ.get("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "8192"))
    return v if v > 0 else (1 << 62)


@functools.lru_cache(maxsize=None)
def _max_horizon(order: int) -> int:
    """Largest truncated-init horizon over the order's poles."""
    return max((int(np.ceil(np.log(_TOLERANCE) / np.log(abs(p))))
                for p in spline_poles(order)), default=0)


def use_scan_filter(n: int, order: int) -> bool:
    """True when the (order>1) prefilter along an axis of length ``n``
    should run as an associative scan instead of a dense matmul. Callers
    that fuse the filter matrix with selections (window padding, patch
    expansion) must fall back to staged pipelines when this is set.

    The scan formulation requires the truncated-horizon boundary inits
    (``n > horizon``, up to 42 samples for order 5), so even with the
    ``ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN`` gate lowered below that, a
    short axis keeps the matrix path (whose full-boundary branch is
    exact at any length)."""
    return order > 1 and n >= _scan_min_n() and n > _max_horizon(order) + 1


def _first_order_scan(b, p: float, reverse: bool):
    """Solve ``y[k] = b[k] + p * y[k +/- 1]`` along axis 0 (zero init).

    ``reverse=False``: causal, y[0] = b[0]; ``reverse=True``:
    anti-causal, y[n-1] = b[n-1]. Linear in ``b`` (``p`` is static), so
    ``jax.linear_transpose`` of the caller yields the exact adjoint.
    """
    a = jnp.full((b.shape[0],) + (1,) * (b.ndim - 1), p, dtype=b.dtype)

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    _, y = lax.associative_scan(combine, (a, b), reverse=reverse)
    return y


def _filter_axis0_scan(x, order: int):
    """Scan-formulated prefilter along axis 0 (same math as
    :func:`_filter_lines`; requires ``n > horizon``, which the
    :func:`use_scan_filter` gate guarantees by a wide margin)."""
    poles = spline_poles(order)
    n = x.shape[0]
    weight = 1.0
    for p in poles:
        weight *= (1.0 - p) * (1.0 - 1.0 / p)
    y = x * x.dtype.type(weight)
    for p in poles:
        horizon = int(np.ceil(np.log(_TOLERANCE) / np.log(abs(p))))
        # causal init (mirror boundary, truncated): y0 = sum p^k y[k]
        coef = jnp.asarray(p ** np.arange(horizon), y.dtype)
        y0 = jnp.tensordot(coef, y[:horizon], axes=[[0], [0]],
                           precision=jax.lax.Precision.HIGHEST)
        y = _first_order_scan(y.at[0].set(y0), p, reverse=False)
        # anti-causal init + recursion y[k] = -p*y[k] + p*y[k+1]
        last = (p / (p * p - 1.0)) * (y[n - 1] + p * y[n - 2])
        b = (-p) * y
        y = _first_order_scan(b.at[n - 1].set(last), p, reverse=True)
    return y


def _apply_scan(x, order: int, axis: int):
    x = jnp.asarray(x)
    xm = jnp.moveaxis(x, axis, 0)
    return jnp.moveaxis(_filter_axis0_scan(xm, order), 0, axis)


def _filter_axis0_scan_transpose(ct, order: int):
    """Exact adjoint of :func:`_filter_axis0_scan`, written stage by
    stage (jax.linear_transpose over the scan hit a fatal abort in eager
    XLA-CPU in this environment; the explicit form is also cheaper —
    no partial-eval residuals).

    Per pole the forward is ``A @ C`` with
    ``C = L E`` (E: identity with row 0 the truncated-horizon init row;
    L: causal scan, lower-triangular Toeplitz ``p^(i-j)``) and
    ``A = U G`` (G: ``-p I`` except the anti-causal init row n-1;
    U: reverse scan, upper-triangular Toeplitz ``p^(j-i)``). The adjoint
    runs poles in reverse, each as ``Cᵀ Aᵀ = (Eᵀ Lᵀ)(Gᵀ Uᵀ)`` — the same
    two associative scans with directions swapped plus the transposed
    init rows.
    """
    poles = spline_poles(order)
    n = ct.shape[0]
    weight = 1.0
    for p in poles:
        weight *= (1.0 - p) * (1.0 - 1.0 / p)
    y = jnp.asarray(ct)
    for p in reversed(poles):
        c = p / (p * p - 1.0)
        # Aᵀ: Uᵀ is the causal scan; then Gᵀ
        z = _first_order_scan(y, p, reverse=False)
        g = (-p) * z
        g = g.at[n - 2].add(c * p * z[n - 1])
        g = g.at[n - 1].set(c * z[n - 1])
        # Cᵀ: Lᵀ is the reverse scan; then Eᵀ
        z = _first_order_scan(g, p, reverse=True)
        horizon = int(np.ceil(np.log(_TOLERANCE) / np.log(abs(p))))
        coef = jnp.asarray(p ** np.arange(1, horizon), z.dtype)
        bshape = (horizon - 1,) + (1,) * (z.ndim - 1)
        y = z.at[1:horizon].add(coef.reshape(bshape) * z[0])
    return y * y.dtype.type(weight)


def _apply_scan_transpose(ct, order: int, axis: int):
    """Exact adjoint of :func:`_apply_scan` (same shape in and out);
    forward/backward pairs satisfy the adjoint identity at machine
    precision (tests/test_prefilter_scan.py)."""
    ct = jnp.asarray(ct)
    cm = jnp.moveaxis(ct, axis, 0)
    return jnp.moveaxis(_filter_axis0_scan_transpose(cm, order), 0, axis)


def spline_filter1d(x, order: int, axis: int):
    """Device-side equivalent of ``scipy.ndimage.spline_filter1d`` (mirror).

    Forward prefilter used before interpolation for ``order > 1``
    (reference deform_grid.py:154-169). Runs as one MXU matmul, or as an
    O(log n)-depth associative scan past the :func:`use_scan_filter`
    axis-length gate.
    """
    if order <= 1:
        return jnp.asarray(x)
    n = x.shape[axis]
    if use_scan_filter(n, order):
        return _apply_scan(x, order, axis)
    return _apply_matrix(x, filter_matrix(n, order), axis)


def spline_filter1d_select(x, order: int, axis: int, sel_idx: np.ndarray):
    """Fused prefilter + static row-selection: ``take(spline_filter1d(x),
    sel_idx, axis)`` as ONE matmul with the row-selected filter matrix.

    ``sel_idx`` is a static (host) integer vector; selecting rows of ``F``
    only duplicates/reorders them, so every output row is the same inner
    product the staged filter-then-take computes — the fusion is exact.
    Used to fold the window mirror-padding (ops/windows.py
    ``window_pad_indices``) into the prefilter matmul, saving a concat
    kernel per axis in the forward and a slice-add chain in the backward
    (the transpose of the fused matmul is again one matmul).
    """
    n = x.shape[axis]
    F = filter_matrix(n, order)[np.asarray(sel_idx)]
    return _apply_matrix(x, F, axis)


def spline_filter1d_select_transpose(x, order: int, axis: int,
                                     sel_idx: np.ndarray, n: int):
    """Exact adjoint of :func:`spline_filter1d_select`: contracts the
    selected-and-padded axis (length ``len(sel_idx)``) back to length ``n``
    with the transposed row-selected filter matrix — the un-pad overlap-add
    and the transpose prefilter in one matmul."""
    F = filter_matrix(n, order)[np.asarray(sel_idx)].T
    return _apply_matrix(x, F, axis)


def spline_filter1d_transpose(x, order: int, axis: int):
    """Exact adjoint of :func:`spline_filter1d`.

    TPU-native equivalent of ``NI_SplineFilter1DGrad`` (reference
    deform.c:1049-1168, exposed as ``spline_filter1d_grad`` at
    _deform_grid.c:61-92): multiplication by the transposed filter matrix.
    """
    if order <= 1:
        return jnp.asarray(x)
    n = x.shape[axis]
    if use_scan_filter(n, order):
        return _apply_scan_transpose(x, order, axis)
    return _apply_matrix(x, filter_matrix(n, order).T, axis)


def spline_filter1d_np(x: np.ndarray, order: int, axis: int) -> np.ndarray:
    """Host (numpy, float64) forward prefilter — used for oracle checks."""
    if order <= 1:
        return np.asarray(x, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    moved = np.moveaxis(x, axis, 0)
    out = _filter_lines(moved.reshape(moved.shape[0], -1), order)
    return np.moveaxis(out.reshape(moved.shape), 0, axis)
