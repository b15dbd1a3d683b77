"""Differential tests for gaussian_filter / gaussian_filter1d vs
scipy.ndimage.

The TPU-native formulation (ops/filters.py) builds the truncated kernel
into a dense per-axis filter matrix with the boundary fold and applies it
as one HIGHEST-precision matmul, so outputs must match scipy's recursive
correlate1d to fp precision for every sigma / derivative order / mode /
truncate / radius. These are the scipy *filter* boundary modes
(unchanged across scipy versions), not the pre-1.6 interpolation grid
modes the resamplers keep.
"""
import hashlib

import numpy as np
import pytest
import scipy.ndimage

import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed


@pytest.fixture
def rng(request):
    seed = int(hashlib.sha256(request.node.nodeid.encode()).hexdigest()[:8],
               16)
    return np.random.default_rng(seed)


MODES = ['reflect', 'mirror', 'nearest', 'wrap', 'constant']


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('sigma', [0.7, 2.0, 5.5])
def test_1d_matches_scipy(rng, sigma, mode):
    x = rng.standard_normal(41)
    want = scipy.ndimage.gaussian_filter1d(x, sigma, mode=mode, cval=1.5)
    got = ed.gaussian_filter1d(jnp.asarray(x), sigma, mode=mode, cval=1.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize('order', [1, 2, 3])
@pytest.mark.parametrize('mode', ['reflect', 'constant'])
def test_derivative_orders_match_scipy(rng, order, mode):
    x = rng.standard_normal(37)
    want = scipy.ndimage.gaussian_filter1d(x, 1.8, order=order, mode=mode,
                                           cval=-0.5)
    got = ed.gaussian_filter1d(jnp.asarray(x), 1.8, order=order, mode=mode,
                               cval=-0.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11,
                               atol=1e-12)


def test_axis_and_radius_and_truncate(rng):
    x = rng.standard_normal((9, 23, 7))
    for kwargs in [dict(truncate=2.0), dict(radius=3), dict(radius=0)]:
        want = scipy.ndimage.gaussian_filter1d(x, 1.3, axis=1, **kwargs)
        got = ed.gaussian_filter1d(jnp.asarray(x), 1.3, axis=1, **kwargs)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-12)
    # negative axis
    want = scipy.ndimage.gaussian_filter1d(x, 0.9, axis=-1)
    got = ed.gaussian_filter1d(jnp.asarray(x), 0.9, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_kernel_longer_than_axis(rng):
    # radius > n exercises the multi-period boundary folds
    x = rng.standard_normal(5)
    for mode in MODES:
        want = scipy.ndimage.gaussian_filter1d(x, 4.0, mode=mode, cval=0.25)
        got = ed.gaussian_filter1d(jnp.asarray(x), 4.0, mode=mode, cval=0.25)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-12, err_msg=mode)


@pytest.mark.parametrize('mode', MODES)
def test_nd_matches_scipy(rng, mode):
    x = rng.standard_normal((12, 17, 9))
    want = scipy.ndimage.gaussian_filter(x, 1.4, mode=mode, cval=2.0)
    got = ed.gaussian_filter(jnp.asarray(x), 1.4, mode=mode, cval=2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_per_axis_sigma_order_and_zero_skip(rng):
    x = rng.standard_normal((14, 11))
    want = scipy.ndimage.gaussian_filter(x, (2.0, 0.8), order=(0, 1))
    got = ed.gaussian_filter(jnp.asarray(x), (2.0, 0.8), order=(0, 1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11, atol=1e-12)
    # sigma 0 skips the axis (scipy semantics)
    want = scipy.ndimage.gaussian_filter(x, (0.0, 1.5))
    got = ed.gaussian_filter(jnp.asarray(x), (0.0, 1.5))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_axes_subset_smooths_field_components_independently(rng):
    # the registration use: smooth a (naxis, *shape) field spatially
    field = rng.standard_normal((2, 13, 10))
    got = ed.gaussian_filter(jnp.asarray(field), 1.1, axes=(1, 2))
    want = np.stack([scipy.ndimage.gaussian_filter(field[k], 1.1)
                     for k in range(2)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_axes_validation_and_errors():
    x = jnp.zeros((4, 4))
    with pytest.raises(ValueError, match='one entry per'):
        ed.gaussian_filter(x, (1.0, 2.0, 3.0))
    with pytest.raises(ValueError, match='sigma must be positive'):
        ed.gaussian_filter1d(x, -1.0)
    with pytest.raises(ValueError, match='radius must be a nonnegative'):
        ed.gaussian_filter1d(x, 1.0, radius=-2)
    with pytest.raises(ValueError, match='order must be non-negative'):
        ed.gaussian_filter1d(x, 1.0, order=-1)
    with pytest.raises(ValueError, match='unsupported filter mode'):
        ed.gaussian_filter1d(x, 1.0, mode='grid-wrap')


def test_jit_and_vmap(rng):
    x = rng.standard_normal((3, 16, 12))
    f = jax.jit(lambda a: ed.gaussian_filter(a, 1.7, mode='nearest'))
    single = f(jnp.asarray(x[0]))
    want = scipy.ndimage.gaussian_filter(x[0], 1.7, mode='nearest')
    np.testing.assert_allclose(np.asarray(single), want, rtol=1e-12,
                               atol=1e-12)
    batched = jax.vmap(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(batched[0]), want, rtol=1e-12,
                               atol=1e-12)


def test_adjoint_identity(rng):
    # linearity => autodiff adjoint is the exact transpose:
    # <G x, y> == <x, G^T y>
    x = jnp.asarray(rng.standard_normal((11, 8)))
    y = jnp.asarray(rng.standard_normal((11, 8)))
    fwd = lambda a: ed.gaussian_filter(a, 1.9, mode='wrap')
    gx = fwd(x)
    (xt,) = jax.vjp(fwd, x)[1](y)
    np.testing.assert_allclose(float(jnp.vdot(gx, y)),
                               float(jnp.vdot(x, xt)), rtol=1e-12)


def test_float32_input_stays_float32(rng):
    x = jnp.asarray(rng.standard_normal((6, 6)), jnp.float32)
    out = ed.gaussian_filter1d(x, 1.0)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize('mode', ['reflect', 'constant', 'wrap'])
def test_gaussian_laplace_matches_scipy(rng, mode):
    x = rng.standard_normal((15, 18))
    want = scipy.ndimage.gaussian_laplace(x, 1.6, mode=mode, cval=0.4)
    got = ed.gaussian_laplace(jnp.asarray(x), 1.6, mode=mode, cval=0.4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_gaussian_laplace_per_axis_sigma_and_3d(rng):
    x = rng.standard_normal((9, 11, 8))
    want = scipy.ndimage.gaussian_laplace(x, (1.0, 1.5, 0.8))
    got = ed.gaussian_laplace(jnp.asarray(x), (1.0, 1.5, 0.8))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize('mode', ['reflect', 'nearest', 'mirror'])
def test_gaussian_gradient_magnitude_matches_scipy(rng, mode):
    x = rng.standard_normal((14, 17))
    want = scipy.ndimage.gaussian_gradient_magnitude(x, 1.2, mode=mode)
    got = ed.gaussian_gradient_magnitude(jnp.asarray(x), 1.2, mode=mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_gaussian_laplace_gradmag_axes_subset(rng):
    # per-component spatial LoG / gradient magnitude of a field
    field = rng.standard_normal((2, 12, 13))
    got = ed.gaussian_laplace(jnp.asarray(field), 1.3, axes=(1, 2))
    want = np.stack([scipy.ndimage.gaussian_laplace(field[k], 1.3)
                     for k in range(2)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)
    got = ed.gaussian_gradient_magnitude(jnp.asarray(field), 1.3, axes=(1, 2))
    want = np.stack(
        [scipy.ndimage.gaussian_gradient_magnitude(field[k], 1.3)
         for k in range(2)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10, atol=1e-12)


def test_gaussian_laplace_jit_grad(rng):
    x = jnp.asarray(rng.standard_normal((16, 12)))
    f = jax.jit(lambda a: jnp.sum(ed.gaussian_laplace(a, 1.1) ** 2))
    g = jax.grad(f)(x)
    # FD check on a random projection
    v = jnp.asarray(rng.standard_normal((16, 12)))
    eps = 1e-6
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd),
                               rtol=1e-5)


# ---------------------------------------------------------------------------
# generic correlation/convolution tier (correlate1d, convolve1d,
# uniform_filter, sobel, prewitt, laplace)


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('taps', [[1.0, 2.0, 3.0],
                                  [0.5, -1.0, 2.0, 0.25],      # even length
                                  [2.0],
                                  [1, 2, 3, 4, 5, 6, 7]])
def test_correlate1d_matches_scipy(rng, taps, mode):
    x = rng.standard_normal((13, 21))
    want = scipy.ndimage.correlate1d(x, taps, axis=1, mode=mode, cval=0.3)
    got = ed.correlate1d(jnp.asarray(x), taps, axis=1, mode=mode, cval=0.3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize('origin', [-1, 0, 1])
@pytest.mark.parametrize('taps', [[1.0, 2.0, 3.0], [0.5, -1.0, 2.0, 0.25]])
def test_correlate1d_convolve1d_origin(rng, taps, origin):
    x = rng.standard_normal(19)
    want = scipy.ndimage.correlate1d(x, taps, mode='nearest', origin=origin)
    got = ed.correlate1d(jnp.asarray(x), taps, mode='nearest', origin=origin)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)
    want = scipy.ndimage.convolve1d(x, taps, mode='nearest', origin=origin)
    got = ed.convolve1d(jnp.asarray(x), taps, mode='nearest', origin=origin)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_correlate1d_validation():
    x = jnp.zeros(8)
    with pytest.raises(ValueError, match='non-empty'):
        ed.correlate1d(x, [])
    with pytest.raises(ValueError, match='off its support'):
        ed.correlate1d(x, [1.0, 2.0, 3.0], origin=5)


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('size', [2, 3, 5])
def test_uniform_filter_matches_scipy(rng, size, mode):
    x = rng.standard_normal((11, 14))
    want = scipy.ndimage.uniform_filter(x, size, mode=mode, cval=0.8)
    got = ed.uniform_filter(jnp.asarray(x), size, mode=mode, cval=0.8)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_uniform_filter_per_axis_and_origin(rng):
    x = rng.standard_normal((10, 12))
    want = scipy.ndimage.uniform_filter(x, (3, 5), origin=(1, -1))
    got = ed.uniform_filter(jnp.asarray(x), (3, 5), origin=(1, -1))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)
    want = scipy.ndimage.uniform_filter1d(x, 4, axis=0, origin=1)
    got = ed.uniform_filter1d(jnp.asarray(x), 4, axis=0, origin=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)
    with pytest.raises(ValueError, match='at least 1'):
        ed.uniform_filter1d(x, 0)


@pytest.mark.parametrize('axis', [0, 1, -1])
@pytest.mark.parametrize('mode', ['reflect', 'constant'])
def test_sobel_prewitt_match_scipy(rng, axis, mode):
    x = rng.standard_normal((12, 15))
    for sp, ours in [(scipy.ndimage.sobel, ed.sobel),
                     (scipy.ndimage.prewitt, ed.prewitt)]:
        want = sp(x, axis=axis, mode=mode, cval=0.1)
        got = ours(jnp.asarray(x), axis=axis, mode=mode, cval=0.1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-12)


@pytest.mark.parametrize('mode', ['reflect', 'wrap', 'constant'])
def test_laplace_matches_scipy(rng, mode):
    x = rng.standard_normal((9, 8, 7))
    want = scipy.ndimage.laplace(x, mode=mode, cval=-0.2)
    got = ed.laplace(jnp.asarray(x), mode=mode, cval=-0.2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_filter_tier_jit_and_adjoint(rng):
    x = jnp.asarray(rng.standard_normal((10, 11)))
    y = jnp.asarray(rng.standard_normal((10, 11)))
    fwd = jax.jit(lambda a: ed.convolve1d(
        ed.uniform_filter(a, 3), [1.0, -2.0, 1.0], axis=0, mode='wrap'))
    gx = fwd(x)
    want = scipy.ndimage.convolve1d(
        scipy.ndimage.uniform_filter(np.asarray(x), 3),
        [1.0, -2.0, 1.0], axis=0, mode='wrap')
    np.testing.assert_allclose(np.asarray(gx), want, rtol=1e-12, atol=1e-12)
    (xt,) = jax.vjp(fwd, x)[1](y)
    np.testing.assert_allclose(float(jnp.vdot(gx, y)),
                               float(jnp.vdot(x, xt)), rtol=1e-12)
