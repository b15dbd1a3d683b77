"""Dimensionality coverage: 1-D and 4-D deformations vs the scipy oracle."""

import numpy as np
import pytest

import elasticdeform_tpu as ed
from oracle import deform_grid_oracle

RNG = np.random.default_rng(4242)


@pytest.mark.parametrize("order", [0, 1, 3])
def test_1d(order):
    X = RNG.random((80,))
    d = RNG.standard_normal((1, 4)) * 10
    res = ed.deform_grid(X, d, order=order, mode='mirror')
    ref = deform_grid_oracle(X, d, order=order, mode='mirror')
    np.testing.assert_allclose(ref, res, rtol=1e-5, atol=1e-8)


def test_4d():
    X = RNG.random((10, 9, 8, 7))
    d = RNG.standard_normal((4, 3, 3, 3, 3)) * 2
    res = ed.deform_grid(X, d, order=3, mode='mirror')
    ref = deform_grid_oracle(X, d, order=3, mode='mirror')
    np.testing.assert_allclose(ref, res, rtol=1e-5, atol=1e-8)


def test_4d_strategy_equivalence():
    X = RNG.random((8, 8, 8, 8))
    d = RNG.standard_normal((4, 3, 3, 3, 3)) * 2
    a = ed.deform_grid(X, d, order=3, strategy='gather')
    b = ed.deform_grid(X, d, order=3, strategy='windows')
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_4d_gradient_adjoint():
    d = RNG.standard_normal((4, 3, 3, 3, 3)) * 2
    X = RNG.random((8, 8, 8, 8))
    y = ed.deform_grid(X, d, order=1, mode='mirror')
    gy = RNG.random(y.shape)
    gx = ed.deform_grid_gradient(gy, d, order=1, mode='mirror')
    np.testing.assert_allclose(np.vdot(y, gy), np.vdot(X, gx), rtol=1e-9)
