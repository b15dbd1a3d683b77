"""scipy output-dtype contract for the filter tier (r5, ADVICE fix).

scipy.ndimage filters return the INPUT dtype by default; integer
results are cast by C double->int truncation toward zero, applied per
1-D pass for the separable filters (each pass writes into the integer
output array that feeds the next axis). ``output=`` may select another
dtype or a numpy array to fill. These tests are differential against
scipy.ndimage itself.

The one documented deviation: scipy's NON-FLAT structuring-element
int path (NI_MinOrMaxFilter) truncates the structure per tap except
the raster-first tap — an accidental inconsistency we replace with
truncation of the double min/max (see docs/source/migration.rst), so
grey_* non-flat int cases are compared against that contract, not
bit-exactly against scipy.
"""

import numpy as np
import pytest
from scipy import ndimage

import elasticdeform_tpu as ed


def rand_int(shape, seed=0, lo=-20, hi=20, dtype=np.int32):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, shape).astype(dtype)


# ---------------------------------------------------------------------------
# default output: input dtype with truncation


@pytest.mark.parametrize("dtype", [np.int32, np.int16, np.uint8,
                                   np.int64])
def test_gaussian_filter_int_matches_scipy(dtype):
    x = rand_int((13, 11), seed=1, lo=0 if dtype == np.uint8 else -20,
                 hi=60 if dtype == np.uint8 else 20, dtype=dtype)
    got = np.asarray(ed.gaussian_filter(x, 1.3))
    want = ndimage.gaussian_filter(x, 1.3)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_gaussian_filter1d_int_matches_scipy():
    x = rand_int((17,), seed=2)
    got = np.asarray(ed.gaussian_filter1d(x, 2.0, 0))
    want = ndimage.gaussian_filter1d(x, 2.0, 0)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fn", ["correlate1d", "convolve1d"])
def test_correlate1d_int_matches_scipy(fn):
    x = rand_int((19,), seed=3)
    w = [0.4, -0.3, 0.25, 0.1]
    got = np.asarray(getattr(ed, fn)(x, w, 0))
    want = getattr(ndimage, fn)(x, w, 0)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("fn", ["correlate", "convolve"])
def test_correlate_nd_int_matches_scipy(fn):
    x = rand_int((9, 8), seed=4)
    w = np.array([[0.4, -0.3], [0.25, 0.1], [-0.7, 0.2]])
    got = np.asarray(getattr(ed, fn)(x, w))
    want = getattr(ndimage, fn)(x, w)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_uniform_filter_int_matches_scipy():
    x = rand_int((10, 9), seed=5)
    got = np.asarray(ed.uniform_filter(x, 3))
    want = ndimage.uniform_filter(x, 3)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)
    got2 = np.asarray(ed.uniform_filter1d(x, 4, 1))
    want2 = ndimage.uniform_filter1d(x, 4, 1)
    np.testing.assert_array_equal(got2, want2)


@pytest.mark.parametrize("fn", ["sobel", "prewitt"])
def test_edge_filters_int_matches_scipy(fn):
    x = rand_int((8, 9), seed=6)
    for axis in (0, 1):
        got = np.asarray(getattr(ed, fn)(x, axis))
        want = getattr(ndimage, fn)(x, axis)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want)


def test_laplace_int_matches_scipy():
    x = rand_int((8, 9), seed=7)
    np.testing.assert_array_equal(np.asarray(ed.laplace(x)),
                                  ndimage.laplace(x))


def test_gaussian_laplace_int_matches_scipy():
    x = rand_int((12, 11), seed=8)
    got = np.asarray(ed.gaussian_laplace(x, 1.1))
    want = ndimage.gaussian_laplace(x, 1.1)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_gaussian_gradient_magnitude_int_matches_scipy():
    x = rand_int((12, 11), seed=9)
    got = np.asarray(ed.gaussian_gradient_magnitude(x, 1.1))
    want = ndimage.gaussian_gradient_magnitude(x, 1.1)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)


def test_float_inputs_unchanged():
    # float paths keep their dtype and exact values (no new casts)
    x = np.random.default_rng(0).normal(size=(9, 9))
    got = np.asarray(ed.gaussian_filter(x, 1.0))
    want = ndimage.gaussian_filter(x, 1.0)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------------------
# output= dtype / array


def test_output_dtype_selects_result_dtype():
    x = rand_int((7, 7), seed=10)
    got = np.asarray(ed.uniform_filter(x, 2, output=np.float64))
    want = ndimage.uniform_filter(x, 2, output=np.float64)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_output_array_is_filled_and_returned():
    x = rand_int((7, 7), seed=11)
    out = np.empty((7, 7), np.float32)
    ret = ed.gaussian_filter(x, 1.0, output=out)
    assert ret is out
    want = ndimage.gaussian_filter(x, 1.0, output=np.float32)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_output_array_shape_checked():
    x = rand_int((7, 7), seed=12)
    with pytest.raises(RuntimeError):
        ed.gaussian_filter(x, 1.0, output=np.empty((3, 3)))


def test_output_on_rank_and_morphology():
    x = rand_int((9, 9), seed=13)
    got = np.asarray(ed.median_filter(x, 3, output=np.float64))
    want = ndimage.median_filter(x, 3, output=np.float64)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(got, want)
    got2 = np.asarray(ed.grey_dilation(x, size=3, output=np.int64))
    want2 = ndimage.grey_dilation(x, size=3, output=np.int64)
    assert got2.dtype == want2.dtype
    np.testing.assert_array_equal(got2, want2)


# ---------------------------------------------------------------------------
# per-axis mode sequences


def test_gaussian_filter_mode_sequence():
    x = np.random.default_rng(1).normal(size=(9, 11))
    got = np.asarray(ed.gaussian_filter(x, 1.2, mode=['nearest', 'wrap']))
    want = ndimage.gaussian_filter(x, 1.2, mode=['nearest', 'wrap'])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_uniform_filter_mode_sequence():
    x = np.random.default_rng(2).normal(size=(9, 11))
    got = np.asarray(ed.uniform_filter(x, 3, mode=['mirror', 'constant'],
                                       cval=2.5))
    want = ndimage.uniform_filter(x, 3, mode=['mirror', 'constant'],
                                  cval=2.5)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_minimum_filter_mode_sequence():
    x = rand_int((9, 11), seed=14)
    got = np.asarray(ed.minimum_filter(x, 3, mode=['nearest', 'wrap']))
    want = ndimage.minimum_filter(x, 3, mode=['nearest', 'wrap'])
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# grey morphology int contract (documented deviation for non-flat)


def test_grey_flat_int_exact():
    x = rand_int((9, 9), seed=15)
    got = np.asarray(ed.grey_erosion(x, size=3))
    want = ndimage.grey_erosion(x, size=3)
    np.testing.assert_array_equal(got, want)


def test_grey_nonflat_int_trunc_contract():
    # our contract: trunc toward zero of the double-precision min
    x = rand_int((9, 9), seed=16)
    s = np.round(np.random.default_rng(3).uniform(-2, 2, (3, 3)), 2)
    got = np.asarray(ed.grey_erosion(x, structure=s))
    want_f = ndimage.grey_erosion(x.astype(np.float64), structure=s)
    np.testing.assert_array_equal(got, np.trunc(want_f).astype(np.int32))


# ---------------------------------------------------------------------------
# measurements fixes (ADVICE r4)


def test_histogram_f64_bin_edges():
    vals = np.array([0.1, 0.999999999, 1.0, 2.5, 3.0 - 1e-12])
    got = np.asarray(ed.histogram(vals, 0, 3, 3))
    want = ndimage.histogram(vals, 0, 3, 3)
    np.testing.assert_array_equal(got, want)   # [2, 1, 2]


def test_minimum_maximum_empty_index_zero_fill():
    v = np.array([0., 1., 2.])
    lab = np.array([1, 1, 2])
    np.testing.assert_array_equal(np.asarray(ed.minimum(v, lab, [1, 5])),
                                  ndimage.minimum(v, lab, [1, 5]))
    np.testing.assert_array_equal(np.asarray(ed.maximum(v, lab, [1, 5])),
                                  ndimage.maximum(v, lab, [1, 5]))
    assert ed.minimum_position(v, lab, [1, 5]) == \
        [tuple(int(c) for c in p)
         for p in ndimage.minimum_position(v, lab, [1, 5])]
    ge = ed.extrema(v, lab, [1, 5])
    se = ndimage.extrema(v, lab, [1, 5])
    np.testing.assert_array_equal(np.asarray(ge[0]), se[0])
    np.testing.assert_array_equal(np.asarray(ge[1]), se[1])


def test_sum_alias_exported():
    v = np.array([1., 2., 3.])
    lab = np.array([1, 1, 2])
    np.testing.assert_allclose(np.asarray(ed.sum(v, lab, [1, 2])),
                               [3., 3.])
    assert ed.sum is ed.sum_labels


def test_integer_cast_wraps_like_c(rng=None):
    # scipy's filter tier stores results with a plain C cast: truncate
    # toward zero, then WRAP modulo 2^bits. A uint8 correlate whose
    # float result is negative or > 255 must wrap, not clamp (found by
    # tools/fuzz_ndimage.py: float -30.27 -> 226, 547.3 -> 35).
    rng = np.random.default_rng(7)
    x = rng.integers(0, 255, (11,)).astype(np.uint8)
    w = rng.standard_normal(4) * 3
    got = np.asarray(ed.correlate(x, w, mode='constant', cval=1.5))
    want = ndimage.correlate(x, w, mode='constant', cval=1.5)
    np.testing.assert_array_equal(got, want)
    xi = rng.integers(-100, 100, (9, 9)).astype(np.int8)
    got = np.asarray(ed.sobel(xi, axis=0))
    want = ndimage.sobel(xi, axis=0)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# scipy paired-summation order for symmetric/antisymmetric kernels
# (NI_Correlate1D special-cases them; a different float association
# can land 1 ulp on the other side of a truncation edge and flip the
# integer result — found by tools/fuzz_ndimage.py on an int32 gaussian
# at 2.9999999999999996 vs 3.0000000000000004).


def test_gaussian_int_bit_exact_sigma_sweep():
    rng = np.random.default_rng(11)
    x = rng.integers(-50, 50, (23, 17)).astype(np.int32)
    for sigma in [0.31, 0.374, 0.8, 1.2345, 2.7]:
        for mode in ['reflect', 'constant', 'nearest', 'mirror', 'wrap']:
            got = np.asarray(ed.gaussian_filter(x, sigma, mode=mode))
            want = ndimage.gaussian_filter(x, sigma, mode=mode)
            np.testing.assert_array_equal(
                got, want, err_msg=f"sigma={sigma} mode={mode}")


@pytest.mark.parametrize("sign", [1, -1])
def test_correlate1d_paired_kernels_int_bit_exact(sign):
    # symmetric (+1) and antisymmetric (-1) odd kernels take scipy's
    # paired branch; include a shifted origin (center moves, pairing
    # class is about the kernel, not the alignment)
    rng = np.random.default_rng(13)
    w = rng.standard_normal(7)
    w = w + sign * w[::-1]
    for origin in (0, 1, -2):
        for mode in ['reflect', 'constant', 'nearest', 'mirror', 'wrap']:
            x = rng.integers(-100, 100, (37,)).astype(np.int64)
            got = np.asarray(ed.correlate1d(x, w, origin=origin,
                                            mode=mode))
            want = ndimage.correlate1d(x, w, origin=origin, mode=mode)
            np.testing.assert_array_equal(
                got, want, err_msg=f"sign={sign} origin={origin} "
                                   f"mode={mode}")


def test_paired_path_keeps_exact_adjoint():
    # the paired evaluation is linear in X; its vjp must satisfy the
    # adjoint identity like the banded-matmul path does
    import jax
    import jax.numpy as jnp
    from elasticdeform_tpu.ops.filters import apply_paired1d
    rng = np.random.default_rng(17)
    w = rng.standard_normal(5)
    w = w + w[::-1]
    x = jnp.asarray(rng.standard_normal((6, 19)))
    f = lambda a: apply_paired1d(a, w, 1, 'reflect', 0.0, 2)
    y, vjp = jax.vjp(f, x)
    gy = jnp.asarray(rng.standard_normal(y.shape))
    gx, = vjp(gy)
    v = jnp.asarray(rng.standard_normal(x.shape))
    lhs = jnp.vdot(jax.jvp(f, (x,), (v,))[1], gy)
    rhs = jnp.vdot(v, gx)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)
