"""Differential tests vs scipy.ndimage for the Fourier filter tier
(fourier_gaussian / fourier_uniform / fourier_ellipsoid /
fourier_shift). Complex math — CPU backend (conftest pins it)."""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize('sigma', [1.0, (1.3, 2.1)])
def test_fourier_gaussian_full_fft(rng, sigma):
    x = rng.standard_normal((12, 15))
    F = np.fft.fftn(x)
    want = scipy.ndimage.fourier_gaussian(F, sigma)
    got = ed.fourier_gaussian(jnp.asarray(F), sigma)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)
    # the round trip back to the spatial domain matches scipy's too
    # (the continuous transfer function differs from the *sampled*
    # truncated spatial kernel at small sigma, so compare to scipy's
    # fourier path, not gaussian_filter)
    back = np.fft.ifftn(np.asarray(got)).real
    np.testing.assert_allclose(back, np.fft.ifftn(want).real,
                               rtol=1e-12, atol=1e-12)


def test_fourier_gaussian_rfft(rng):
    x = rng.standard_normal((10, 16))
    F = np.fft.rfftn(x)
    want = scipy.ndimage.fourier_gaussian(F, 2.0, n=16, axis=-1)
    got = ed.fourier_gaussian(jnp.asarray(F), 2.0, n=16, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize('size', [3.0, (3.0, 4.5)])
def test_fourier_uniform(rng, size):
    F = np.fft.fftn(rng.standard_normal((9, 14)))
    want = scipy.ndimage.fourier_uniform(F, size)
    got = ed.fourier_uniform(jnp.asarray(F), size)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize('shape', [(17,), (9, 12), (6, 7, 8)])
def test_fourier_ellipsoid(rng, shape):
    F = np.fft.fftn(rng.standard_normal(shape))
    want = scipy.ndimage.fourier_ellipsoid(F, 3.0)
    got = ed.fourier_ellipsoid(jnp.asarray(F), 3.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)
    with pytest.raises(NotImplementedError):
        ed.fourier_ellipsoid(jnp.zeros((2, 2, 2, 2), jnp.complex128), 2.0)


def test_fourier_shift_matches_scipy_and_roll(rng):
    x = rng.standard_normal((8, 12))
    F = np.fft.fftn(x)
    want = scipy.ndimage.fourier_shift(F, (1.5, -2.25))
    got = ed.fourier_shift(jnp.asarray(F), (1.5, -2.25))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)
    # integer shift round-trips to np.roll
    got = ed.fourier_shift(jnp.asarray(F), (2, 3))
    back = np.fft.ifftn(np.asarray(got)).real
    np.testing.assert_allclose(back, np.roll(x, (2, 3), (0, 1)),
                               rtol=1e-10, atol=1e-10)


def test_fourier_jit_and_grad(rng):
    x = jnp.asarray(rng.standard_normal((8, 8)))

    def f(a):
        F = jnp.fft.fftn(a)
        return jnp.sum(jnp.abs(jnp.fft.ifftn(
            ed.fourier_gaussian(F, 1.5)).real) ** 2)

    g = jax.jit(jax.grad(f))(x)
    eps, v = 1e-5, jnp.asarray(rng.standard_normal((8, 8)))
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd),
                               rtol=1e-4)
