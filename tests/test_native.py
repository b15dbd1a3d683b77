"""Native C++ host kernel: three-way differential tests vs the JAX tier."""

import numpy as np
import pytest

import elasticdeform_tpu as ed
from elasticdeform_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ compiler available")

RNG = np.random.default_rng(31337)


@pytest.mark.parametrize("mode", ["nearest", "wrap", "reflect", "mirror",
                                  "constant"])
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_native_matches_jax_2d(order, mode):
    X = RNG.random((40, 30))
    d = RNG.standard_normal((2, 3, 3)) * 10
    a = ed.deform_grid(X, d, order=order, mode=mode)
    b = native.deform_grid(X, d, order=order, mode=mode)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("order", [0, 1, 3])
def test_native_matches_jax_3d(order):
    X = RNG.random((14, 12, 10))
    d = RNG.standard_normal((3, 3, 3, 3)) * 4
    a = ed.deform_grid(X, d, order=order, mode='mirror')
    b = native.deform_grid(X, d, order=order, mode='mirror')
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)


def test_native_crop_affine_channels():
    X = RNG.random((3, 40, 30))
    d = RNG.standard_normal((2, 3, 3)) * 8
    kw = dict(axis=(1, 2), crop=(slice(5, 30), slice(4, 20)),
              rotate=20, zoom=0.8)
    a = ed.deform_grid(X, d, **kw)
    b = native.deform_grid(X, d, **kw)
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)


def test_native_multi_inputs():
    X = RNG.random((30, 25))
    Y = (RNG.random((30, 25)) * 100).astype(np.int32)
    d = RNG.standard_normal((2, 3, 3)) * 8
    a1, a2 = ed.deform_grid([X, Y], d, order=[3, 0])
    b1, b2 = native.deform_grid([X, Y], d, order=[3, 0])
    np.testing.assert_allclose(a1, b1, rtol=1e-9, atol=1e-10)
    np.testing.assert_array_equal(a2, b2)


def test_native_gradient_matches_jax():
    d = RNG.standard_normal((2, 3, 3)) * 8
    gy = RNG.random((30, 25))
    a = ed.deform_grid_gradient(gy, d, order=3, mode='mirror')
    b = native.deform_grid_gradient(gy, d, order=3, mode='mirror')
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)


def test_native_gradient_crop():
    d = RNG.standard_normal((2, 3, 3)) * 5
    gy = RNG.random((12, 10))
    crop = (slice(4, 16), slice(5, 15))
    a = ed.deform_grid_gradient(gy, d, crop=crop, X_shape=(20, 20))
    b = native.deform_grid_gradient(gy, d, crop=crop, X_shape=(20, 20))
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-10)


def test_native_adjoint_identity():
    # <A x, gy> == <x, A^T gy> entirely within the native tier
    d = RNG.standard_normal((2, 3, 3)) * 6
    X = RNG.random((25, 20))
    y = native.deform_grid(X, d, order=3, mode='mirror')
    gy = RNG.random(y.shape)
    gx = native.deform_grid_gradient(gy, d, order=3, mode='mirror')
    np.testing.assert_allclose(np.vdot(y, gy), np.vdot(X, gx), rtol=1e-10)


def test_native_spline_filter_matches_python():
    from elasticdeform_tpu.ops.prefilter import spline_filter1d_np
    x = RNG.standard_normal((17, 9))
    for order in (2, 3, 4, 5):
        a = native.spline_filter1d(x, order, 0)
        b = spline_filter1d_np(x, order, 0)
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_native_deform_batch_matches_jax():
    rng = np.random.default_rng(51)
    X = rng.random((3, 16, 14))
    D = rng.standard_normal((3, 2, 3, 3)) * 5
    got = native.deform_batch(X, D, order=3, mode='mirror')
    want = np.asarray(ed.deform_batch(X, D, order=3, mode='mirror'))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
    # multi-input list form
    got2 = native.deform_batch([X, X.astype(np.float32)], D,
                               order=[3, 1], mode='nearest')
    want2 = ed.deform_batch([X, X.astype(np.float32)], D,
                            order=[3, 1], mode='nearest')
    for g, w in zip(got2, want2):
        np.testing.assert_allclose(g, np.asarray(w), rtol=1e-5, atol=1e-6)


def test_native_deform_batch_gradient_matches_jax():
    rng = np.random.default_rng(52)
    D = rng.standard_normal((2, 2, 3, 3)) * 4
    gy = rng.random((2, 15, 12))
    got = native.deform_batch_gradient(gy, D, order=3, mode='reflect')
    want = np.asarray(ed.deform_batch_gradient(gy, D, order=3,
                                               mode='reflect'))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
