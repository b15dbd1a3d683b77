"""Differential tests vs scipy.ndimage for the generic-callable filter
family (generic_filter, generic_filter1d, generic_laplace,
generic_gradient_magnitude, vectorized_filter).

scipy calls the user callback per voxel/line from C; the TPU-native
adaptation traces ONE jax-compatible callable and ``vmap``s it over
every window/line at once — the numerical contract (window contents,
raster tap order, boundary handling, origins) is identical and is
pinned here against scipy's own callbacks.
"""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

MODES = ['reflect', 'constant', 'nearest', 'mirror', 'wrap']


@pytest.fixture
def rng():
    return np.random.default_rng(31)


# ---------------------------------------------------------------------------
# generic_filter


@pytest.mark.parametrize('mode', MODES)
def test_generic_filter_ptp(rng, mode):
    x = rng.standard_normal((11, 13))
    want = scipy.ndimage.generic_filter(x, np.ptp, size=3, mode=mode,
                                        cval=0.3)
    got = ed.generic_filter(jnp.asarray(x),
                            lambda v: jnp.max(v) - jnp.min(v),
                            size=3, mode=mode, cval=0.3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


def test_generic_filter_footprint_origin_extra(rng):
    x = rng.standard_normal((9, 10))
    fp = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool)
    want = scipy.ndimage.generic_filter(
        x, lambda v, w: float(np.dot(v, w)), footprint=fp,
        mode='nearest', origin=(1, -1),
        extra_arguments=(np.arange(5.0),))
    got = ed.generic_filter(
        jnp.asarray(x), lambda v, w: jnp.dot(v, w), footprint=fp,
        mode='nearest', origin=(1, -1),
        extra_arguments=(jnp.arange(5.0),))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                               atol=1e-6)


def test_generic_filter_tap_order_matches_scipy(rng):
    # the tap vector must arrive in scipy's raster order: a weighted
    # sum with distinct weights detects any permutation
    x = rng.standard_normal((8, 8))
    w = np.arange(9.0) ** 2 + 1
    want = scipy.ndimage.generic_filter(
        x, lambda v: float(np.dot(v, w)), size=3)
    got = ed.generic_filter(jnp.asarray(x),
                            lambda v: jnp.dot(v, jnp.asarray(w)),
                            size=3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                               atol=1e-6)


def test_generic_filter_jit_grad(rng):
    x = jnp.asarray(rng.standard_normal((7, 7)))
    f = jax.jit(lambda a: jnp.sum(
        ed.generic_filter(a, lambda v: jnp.sum(v ** 2), size=3) ** 2))
    g = jax.grad(f)(x)
    eps, v = 1e-5, jnp.asarray(rng.standard_normal((7, 7)))
    fd = (f(x + eps * v) - f(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd),
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# generic_filter1d


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('size', [3, 4])
def test_generic_filter1d(rng, size, mode):
    x = rng.standard_normal((9, 12))

    def sp_fn(line_in, line_out):       # scipy's in-place contract
        n = len(line_out)
        for i in range(n):
            line_out[i] = line_in[i:i + size].sum()

    def our_fn(line_in):                 # functional adaptation
        n = line_in.shape[0] - (size - 1)
        return sum(jax.lax.slice(line_in, [k], [k + n])
                   for k in range(size))

    want = scipy.ndimage.generic_filter1d(x, sp_fn, size, axis=1,
                                          mode=mode, cval=0.7)
    got = ed.generic_filter1d(jnp.asarray(x), our_fn, size, axis=1,
                              mode=mode, cval=0.7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


def test_generic_filter1d_origin(rng):
    x = rng.standard_normal(17)

    def sp_fn(line_in, line_out):
        for i in range(len(line_out)):
            line_out[i] = line_in[i:i + 3].max()

    def our_fn(line_in):
        n = line_in.shape[0] - 2
        return jnp.maximum(jnp.maximum(line_in[:n], line_in[1:n + 1]),
                           line_in[2:n + 2])

    for origin in (-1, 0, 1):
        want = scipy.ndimage.generic_filter1d(x, sp_fn, 3,
                                              origin=origin)
        got = ed.generic_filter1d(jnp.asarray(x), our_fn, 3,
                                  origin=origin)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-12)


def test_generic_filter1d_wrong_length_raises():
    with pytest.raises(ValueError, match='length'):
        ed.generic_filter1d(jnp.zeros(8), lambda l: l, 3)


# ---------------------------------------------------------------------------
# generic_laplace / generic_gradient_magnitude


def test_generic_laplace_reproduces_laplace(rng):
    x = rng.standard_normal((10, 11))

    def d2(a, axis, mode, cval):
        return ed.correlate1d(a, [1.0, -2.0, 1.0], axis, mode=mode,
                              cval=cval)

    got = ed.generic_laplace(jnp.asarray(x), d2, mode='wrap', cval=0.0)
    want = scipy.ndimage.laplace(x, mode='wrap')
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


def test_generic_gradient_magnitude_reproduces_sobel(rng):
    x = rng.standard_normal((10, 11))

    def d(a, axis, mode, cval):
        return ed.sobel(a, axis, mode=mode, cval=cval)

    got = ed.generic_gradient_magnitude(jnp.asarray(x), d,
                                        mode='reflect')
    want = scipy.ndimage.generic_gradient_magnitude(
        x, scipy.ndimage.sobel, mode='reflect')
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


def test_generic_laplace_gaussian_second_derivative(rng):
    # scipy's own gaussian_laplace is generic_laplace over gaussian
    # second derivatives — reproduce it through our generic_laplace
    x = rng.standard_normal((12, 12))

    def d2(a, axis, mode, cval, sigma):
        order = [0] * a.ndim
        order[axis] = 2
        return ed.gaussian_filter(a, sigma, order=tuple(order),
                                  mode=mode, cval=cval)

    got = ed.generic_laplace(jnp.asarray(x), d2, extra_arguments=(1.3,))
    want = scipy.ndimage.gaussian_laplace(x, 1.3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10,
                               atol=1e-10)


# ---------------------------------------------------------------------------
# vectorized_filter


@pytest.mark.parametrize('mode', MODES)
def test_vectorized_filter_mean(rng, mode):
    x = rng.standard_normal((10, 13))
    cval = 0.4 if mode == 'constant' else None
    want = scipy.ndimage.vectorized_filter(x, np.mean, size=3,
                                           mode=mode, cval=cval)
    got = ed.vectorized_filter(jnp.asarray(x), jnp.mean, size=3,
                               mode=mode, cval=cval)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)
    # cval with a non-constant mode is rejected like scipy
    with pytest.raises(ValueError, match='cval'):
        ed.vectorized_filter(jnp.asarray(x), jnp.mean, size=3,
                             mode='reflect', cval=1.0)


def test_vectorized_filter_valid_and_sizes(rng):
    x = rng.standard_normal((9, 11))
    want = scipy.ndimage.vectorized_filter(x, np.max, size=(2, 4),
                                           mode='valid')
    got = ed.vectorized_filter(jnp.asarray(x), jnp.max, size=(2, 4),
                               mode='valid')
    np.testing.assert_array_equal(np.asarray(got), want)


def test_vectorized_filter_footprint_origin(rng):
    x = rng.standard_normal((8, 9))
    fp = np.array([[1, 0, 1], [0, 1, 0], [1, 1, 0]], bool)
    want = scipy.ndimage.vectorized_filter(x, np.median, footprint=fp,
                                           origin=(1, 0))
    got = ed.vectorized_filter(jnp.asarray(x), jnp.median,
                               footprint=fp, origin=(1, 0))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_vectorized_filter_axes(rng):
    x = rng.standard_normal((6, 7, 8))
    want = scipy.ndimage.vectorized_filter(x, np.min, size=3,
                                           axes=(0, 2))
    got = ed.vectorized_filter(jnp.asarray(x), jnp.min, size=3,
                               axes=(0, 2))
    np.testing.assert_array_equal(np.asarray(got), want)


# ---------------------------------------------------------------------------
# numpy-consuming callables (scipy's usual case) and the output= kwarg


def test_generic_filter_numpy_callable_host_fallback(rng):
    # np.ptp on a traced row raises TracerArrayConversionError; eager
    # callers fall back to one host call per voxel like scipy itself
    x = rng.standard_normal((8, 9)).astype(np.float32)
    want = scipy.ndimage.generic_filter(x, np.ptp, size=3)
    got = ed.generic_filter(jnp.asarray(x), np.ptp, size=3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_generic_filter_numpy_callable_raises_under_jit(rng):
    import jax
    x = rng.standard_normal((6, 6)).astype(np.float32)
    f = jax.jit(lambda a: ed.generic_filter(a, np.ptp, size=3))
    with pytest.raises(jax.errors.TracerArrayConversionError):
        f(jnp.asarray(x))


def test_generic_filter_output_dtype_and_array(rng):
    x = (rng.standard_normal((7, 8)) * 20).astype(np.int32)
    want = scipy.ndimage.generic_filter(x, np.mean, size=3)
    got = ed.generic_filter(x, np.mean, size=3)
    assert np.asarray(got).dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), want)
    out = np.zeros((7, 8), np.float64)
    wantf = scipy.ndimage.generic_filter(
        x.astype(np.float32), np.mean, size=3, output=out.copy())
    ed.generic_filter(x.astype(np.float32), np.mean, size=3, output=out)
    np.testing.assert_allclose(out, wantf, atol=1e-6)


def test_generic_filter1d_numpy_callable_and_output(rng):
    x = rng.standard_normal((5, 9)).astype(np.float32)

    def ours(line):
        n = len(line) - 2
        return np.array([line[i:i + 3].sum() for i in range(n)])

    def sp_fn(line_in, line_out):
        line_out[...] = np.convolve(line_in, np.ones(3), 'valid')

    want = scipy.ndimage.generic_filter1d(x, sp_fn, 3, axis=1)
    got = ed.generic_filter1d(jnp.asarray(x), ours, 3, axis=1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    out = np.zeros_like(x)
    ed.generic_filter1d(x, ours, 3, axis=1, output=out)
    np.testing.assert_allclose(out, want, atol=1e-5)
