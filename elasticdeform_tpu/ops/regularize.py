"""Analytic regularization energies of B-spline displacement fields.

Registration pipelines penalize non-smooth deformations with integral
energies of the dense displacement field — most commonly the *bending
energy* (squared Frobenius norm of the Hessian, the thin-plate term of
Rueckert-style free-form registration) and the *membrane energy* (squared
gradient / diffusion term). For a field parameterized by a uniform cubic
B-spline control grid — exactly what :func:`elasticdeform_tpu.deform`
interpolates (reference deform.c:639-758: order-3 interpolation of the
prefiltered grid, control point ``i`` at voxel ``i*(n-1)/(points-1)``) —
these integrals have a *closed form*: a quadratic form in the spline
coefficients whose per-axis Gram matrices are exact integrals of B-spline
basis derivative products (cf. "A Generalized Framework for Analytic
Regularization of Uniform Cubic B-spline Displacement Fields",
arXiv:2010.02400). No dense field is ever materialized: the cost is a few
``points``-sized matmuls, so the regularizer is effectively free next to
the deformation itself and exactly differentiable w.r.t. the grid.

Exactness contract: the energies integrate the *actual* field the library
reconstructs — including the mirror boundary extension the grid prefilter
implies (so e.g. a linear-ramp grid has nonzero bending energy near the
boundary, where the mirror-symmetric reconstruction genuinely flattens).
The per-interval Gauss-Legendre rule (4 points, polynomials of degree
<= 6) makes the 1-D Gram integrals exact to machine precision; verified
against densely sampled finite-difference integration in
tests/test_regularize.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


from elasticdeform_tpu.ops.bspline import bspline3_np as _b3d  # noqa: E402


def _reflect_index(j: int, p: int) -> int:
    """Mirror (reflect-about-samples) index for the coefficient extension
    the mirror prefilter implies: period 2(p-1), c[-j] == c[j]."""
    if p == 1:
        return 0
    period = 2 * (p - 1)
    j = j % period
    return period - j if j >= p else j


@functools.lru_cache(maxsize=128)
def _gram_matrices(p: int):
    """Exact (p, p) Gram matrices G^(d)[k,l] = integral over t in [0,p-1]
    of beta3^(d)(t-k) beta3^(d)(t-l) dt for d = 0, 1, 2, with the mirror
    coefficient fold applied (extended indices -2..p+1 folded onto the p
    true control points).

    4-point Gauss-Legendre per unit knot interval is exact: the integrand
    is piecewise polynomial of degree <= 6 < 2*4.
    """
    if p < 2:
        raise ValueError("regularization energies need at least 2 control "
                         "points per axis (got %d)" % p)
    T = p - 1
    ks = np.arange(-2, p + 2)
    gl_x, gl_w = np.polynomial.legendre.leggauss(4)
    grams = []
    for d in (0, 1, 2):
        G = np.zeros((len(ks), len(ks)))
        for m in range(T):
            t = (gl_x + 1.0) * 0.5 + m
            w = gl_w * 0.5
            B = _b3d(t[None, :] - ks[:, None], d)     # (K, 4)
            G += (B * w) @ B.T
        grams.append(G)
    F = np.zeros((len(ks), p))
    for row, j in enumerate(ks):
        F[row, _reflect_index(int(j), p)] = 1.0
    return tuple(F.T @ G @ F for G in grams)


def _coefficients(disp, cdt):
    """Spline coefficients of the control grid: the same order-3 mirror
    prefilter :func:`dense_displacement` applies (reference
    deform_grid.py:165-169), so the energies integrate the field the
    deformation actually uses."""
    from elasticdeform_tpu.ops.prefilter import spline_filter1d
    c = jnp.asarray(disp).astype(cdt)
    for d in range(1, c.ndim):
        c = spline_filter1d(c, 3, d)
    return c


def _quad_form(c, mats):
    """c^T (A_0 kron A_1 kron ...) c for one component grid c."""
    t = c
    for A in mats:
        # contract the leading axis; the result's new axis lands last, so
        # after ndim steps the axes are back in the original order.
        # HIGHEST: TPU matmuls default to bf16 operands, which would cost
        # ~2^-8 on an exactness-contract energy
        t = jnp.tensordot(t, A, axes=[[0], [0]],
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(c * t)


def _energy(displacement, shape, derivative_orders, cdt):
    """Shared driver: sum of separable quadratic forms.

    ``derivative_orders`` yields (axis_orders, scale_power_axes) pairs —
    for each term, the per-axis basis-derivative order and the axes whose
    control spacing divides the derivative.
    """
    disp = jnp.asarray(displacement)
    naxis = disp.shape[0]
    points = tuple(int(s) for s in disp.shape[1:])
    if len(points) != naxis or len(shape) != naxis:
        raise ValueError(
            "displacement must have shape (naxis, *points) with one point "
            f"axis per image axis; got {tuple(disp.shape)} for image rank "
            f"{len(shape)}.")
    if any(int(s) < 2 for s in shape):
        raise ValueError("image axes must have length >= 2 (got %r)"
                         % (tuple(shape),))
    spacings = [(int(shape[k]) - 1) / (points[k] - 1) if points[k] > 1
                else float(int(shape[k]) - 1) for k in range(naxis)]
    grams = [_gram_matrices(points[k]) for k in range(naxis)]
    grams = [tuple(jnp.asarray(G, dtype=cdt) for G in g) for g in grams]
    vol = float(np.prod(spacings))

    c = _coefficients(disp, cdt)
    total = jnp.zeros((), cdt)
    for axis_orders in derivative_orders:
        mats = [grams[k][axis_orders[k]] for k in range(naxis)]
        scale = vol / float(np.prod(
            [spacings[k] ** (2 * axis_orders[k]) for k in range(naxis)]))
        for h in range(naxis):
            total = total + scale * _quad_form(c[h], mats)
    return total


def _terms_bending(naxis):
    """All ordered second-derivative pairs (i, j): d2/dxi dxj — the mixed
    terms appear twice, giving the squared Frobenius norm of the Hessian."""
    terms = []
    for i in range(naxis):
        for j in range(naxis):
            orders = [0] * naxis
            if i == j:
                orders[i] = 2
            else:
                orders[i] = 1
                orders[j] = 1
            terms.append(tuple(orders))
    return terms


def _terms_membrane(naxis):
    terms = []
    for i in range(naxis):
        orders = [0] * naxis
        orders[i] = 1
        terms.append(tuple(orders))
    return terms


def _dispatch(displacement, shape, terms_fn):
    cdt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    disp = jnp.asarray(displacement)
    naxis = len(shape)
    if disp.ndim == naxis + 2:
        return jax.vmap(
            lambda d: _energy(d, shape, terms_fn(naxis), cdt))(disp)
    return _energy(disp, shape, terms_fn(naxis), cdt)


def bending_energy(displacement, shape):
    """Exact bending energy of the displacement field a control grid
    applies: integral over the image domain of the squared Frobenius norm
    of each component's Hessian, summed over components.

    ``displacement``: ``(naxis, *points)`` control grid (a leading batch
    axis ``(B, naxis, *points)`` returns per-sample energies);
    ``shape``: the image shape the grid is stretched over (so spacings and
    the integration domain match :func:`elasticdeform_tpu.deform` /
    :func:`displacement_field` exactly). Closed form — a few
    ``points``-sized matmuls, no dense field — and exactly differentiable
    w.r.t. the grid; derivatives are taken w.r.t. *voxel* coordinates.
    """
    return _dispatch(displacement, shape, _terms_bending)


def membrane_energy(displacement, shape):
    """Exact membrane (diffusion) energy: integral of the squared gradient
    of each displacement component over the image domain. Same conventions
    as :func:`bending_energy`."""
    return _dispatch(displacement, shape, _terms_membrane)
