"""Tests for the analytic B-spline regularization energies.

Oracle: reconstruct the dense displacement field with scipy
(spline_filter + map_coordinates, mirror mode, prefilter=False — the
library's own field model, reference deform.c:639-758), differentiate it
numerically (np.gradient, 2nd order) and integrate with the trapezoid
rule on a fine grid. The analytic energies must match to the oracle's
discretization error (<~1e-3 relative at the step sizes used).
"""

import numpy as np
import pytest
import scipy.ndimage

import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

RNG = np.random.default_rng(7)


def _coeffs(grid):
    """Spline coefficients of one component grid (mirror, order 3)."""
    return scipy.ndimage.spline_filter(np.asarray(grid, np.float64),
                                       order=3, mode='mirror')


_MARGIN = 4  # extension samples so every in-domain derivative is centered


def _dense_component(grid_h, shape, n_sub):
    """Component field sampled on a uniform x-grid over the image domain
    [0, n_k-1]^D EXTENDED by _MARGIN samples per side (mirror mode covers
    the outside), plus the step per axis. Derivatives taken on the
    extended grid are centered everywhere inside the domain, so after
    cropping the margin the only oracle error is O(h^2) + trapezoid."""
    p = grid_h.shape
    c = _coeffs(grid_h)
    axes = []
    steps = []
    for n in shape:
        step = (n - 1.0) / (n_sub - 1)
        axes.append(np.arange(-_MARGIN, n_sub + _MARGIN) * step)
        steps.append(step)
    mesh = np.meshgrid(*axes, indexing='ij')
    coords = np.stack([m * (p[k] - 1) / (shape[k] - 1)
                       for k, m in enumerate(mesh)])
    u = scipy.ndimage.map_coordinates(c, coords.reshape(len(p), -1),
                                      order=3, mode='mirror',
                                      prefilter=False)
    return u.reshape(mesh[0].shape), steps


def _crop_margin(a, naxis):
    sl = (slice(_MARGIN, -_MARGIN),) * naxis
    return a[sl]


def _numeric_bending(displacement, shape, n_sub=400):
    naxis = len(shape)
    total = 0.0
    for h in range(naxis):
        u, steps = _dense_component(displacement[h], shape, n_sub)
        grads = np.gradient(u, *steps)
        if naxis == 1:
            grads = [grads]
        for i in range(naxis):
            hess_i = np.gradient(grads[i], *steps)
            if naxis == 1:
                hess_i = [hess_i]
            for j in range(naxis):
                sq = _crop_margin(hess_i[j], naxis) ** 2
                for s in steps:
                    sq = np.trapezoid(sq, dx=s, axis=0)
                total += float(sq)
    return total


def _numeric_membrane(displacement, shape, n_sub=400):
    naxis = len(shape)
    total = 0.0
    for h in range(naxis):
        u, steps = _dense_component(displacement[h], shape, n_sub)
        grads = np.gradient(u, *steps)
        if naxis == 1:
            grads = [grads]
        for g in grads:
            sq = _crop_margin(g, naxis) ** 2
            for s in steps:
                sq = np.trapezoid(sq, dx=s, axis=0)
            total += float(sq)
    return total


def test_bending_1d_matches_numeric():
    d = RNG.standard_normal((1, 6)) * 4
    got = float(ed.bending_energy(d, (41,)))
    want = _numeric_bending(d, (41,), n_sub=4001)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_membrane_1d_matches_numeric():
    d = RNG.standard_normal((1, 6)) * 4
    got = float(ed.membrane_energy(d, (41,)))
    want = _numeric_membrane(d, (41,), n_sub=4001)
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_bending_2d_matches_numeric():
    d = RNG.standard_normal((2, 4, 5)) * 3
    got = float(ed.bending_energy(d, (25, 30)))
    want = _numeric_bending(d, (25, 30), n_sub=500)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_membrane_2d_matches_numeric():
    d = RNG.standard_normal((2, 4, 5)) * 3
    got = float(ed.membrane_energy(d, (25, 30)))
    want = _numeric_membrane(d, (25, 30), n_sub=500)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_constant_displacement_has_zero_energy():
    d = np.full((2, 5, 5), 3.7)
    assert abs(float(ed.bending_energy(d, (30, 30)))) < 1e-8
    assert abs(float(ed.membrane_energy(d, (30, 30)))) < 1e-8


def test_energies_nonnegative_and_zero_only_for_constant():
    d = RNG.standard_normal((3, 3, 4, 5))
    for fn in (ed.bending_energy, ed.membrane_energy):
        assert float(fn(d, (16, 20, 24))) > 0


def test_gradient_matches_finite_differences():
    d = jnp.asarray(RNG.standard_normal((2, 4, 4)), jnp.float64)
    shape = (20, 22)
    g = jax.grad(lambda dd: ed.bending_energy(dd, shape))(d)
    eps = 1e-5
    for idx in [(0, 1, 2), (1, 3, 0), (0, 0, 3)]:
        dp = d.at[idx].add(eps)
        dm = d.at[idx].add(-eps)
        fd = (float(ed.bending_energy(dp, shape))
              - float(ed.bending_energy(dm, shape))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-5, atol=1e-8)


def test_batched_matches_per_sample():
    D = RNG.standard_normal((3, 2, 4, 5)) * 2
    shape = (18, 21)
    for fn in (ed.bending_energy, ed.membrane_energy):
        eb = np.asarray(fn(D, shape))
        assert eb.shape == (3,)
        for b in range(3):
            np.testing.assert_allclose(eb[b], float(fn(D[b], shape)),
                                       rtol=1e-10)


def test_jit_and_3d():
    d = jnp.asarray(RNG.standard_normal((3, 3, 3, 3)))
    e = jax.jit(lambda dd: ed.bending_energy(dd, (12, 13, 14)))(d)
    assert np.isfinite(float(e)) and float(e) > 0


def test_shape_validation():
    with pytest.raises(ValueError):
        ed.bending_energy(np.zeros((2, 3, 3)), (10,))
    with pytest.raises(ValueError):
        ed.bending_energy(np.zeros((1, 1)), (10,))
