"""Resampling-strategy equivalence: windows fast path vs plain gather.

The window-gather path (ops/windows.py) must produce bit-near-identical
results to the per-tap gather path (ops/resample.py) for every supported
configuration — same taps, same weights, different memory layout.
"""

import numpy as np
import pytest

import elasticdeform_tpu as ed
from elasticdeform_tpu.ops.windows import window_plan

RNG = np.random.default_rng(2024)


@pytest.mark.parametrize("mode", ["nearest", "wrap", "reflect", "mirror",
                                  "constant"])
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_2d_equivalence(order, mode):
    X = RNG.random((40, 30))
    d = RNG.standard_normal((2, 3, 3)) * 8
    a = ed.deform_grid(X, d, order=order, mode=mode, strategy="gather")
    b = ed.deform_grid(X, d, order=order, mode=mode, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [0, 1, 3, 4, 5])
def test_3d_equivalence(order):
    X = RNG.random((18, 16, 14))
    d = RNG.standard_normal((3, 3, 3, 3)) * 5
    a = ed.deform_grid(X, d, order=order, strategy="gather")
    b = ed.deform_grid(X, d, order=order, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_1d_equivalence():
    X = RNG.random((50,))
    d = RNG.standard_normal((1, 4)) * 5
    a = ed.deform_grid(X, d, order=3, strategy="gather")
    b = ed.deform_grid(X, d, order=3, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_channels_crop_affine_equivalence():
    X = RNG.random((3, 40, 30))
    d = RNG.standard_normal((2, 3, 3)) * 8
    kw = dict(axis=(1, 2), crop=(slice(5, 30), slice(4, 20)),
              rotate=15, zoom=1.2)
    a = ed.deform_grid(X, d, strategy="gather", **kw)
    b = ed.deform_grid(X, d, strategy="windows", **kw)
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_gradient_equivalence():
    d = RNG.standard_normal((2, 3, 3)) * 8
    gy = RNG.random((40, 30))
    a = ed.deform_grid_gradient(gy, d, order=3, strategy="gather")
    b = ed.deform_grid_gradient(gy, d, order=3, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_window_plan_constraints():
    for naxis in (1, 2, 3, 4):
        for order in range(6):
            plan = window_plan(naxis, order)
            assert plan is not None
            n_lead, widths, strides = plan
            assert n_lead + len(widths) == min(naxis, n_lead + len(widths))
            # stencil containment: width >= stride + order
            for w, s in zip(widths, strides):
                assert w >= s + order
            # 128 lanes exactly
            total = 1
            for w in widths:
                total *= w
            assert total == 128
