"""Conformance tests vs the SciPy oracles.

Mirrors the reference's differential test strategy
(reference tests/test_deform_grid.py:81-237): random displacement grids,
2D/3D shapes, orders 0-5, all five boundary modes, crop, multi-input with
mixed parameters, axis/channel semantics. Tolerances follow the reference
(rtol=1e-05, atol=1e-08 at :365, atol=1e-06 for multi at :161).
"""

import numpy as np
import pytest

import elasticdeform_tpu as ed
from oracle import deform_grid_oracle, deform_grid_oracle_oldmode

RNG = np.random.default_rng(1234)

# modes whose semantics are unchanged in modern scipy (reference gating,
# tests/test_deform_grid.py:94-97 skips reflect+nearest on scipy>1.5.4)
MODERN_OK = ("mirror", "constant", "wrap")
ALL_MODES = ("nearest", "wrap", "reflect", "mirror", "constant")


def run_comparison(shape, points, order=3, sigma=25, crop=None,
                   mode='constant', axis=None, rtol=1e-5, atol=1e-8):
    naxis = len(shape) if axis is None else \
        (1 if isinstance(axis, int) else len(axis))
    displacement = RNG.standard_normal((naxis, *points)) * sigma
    X = RNG.random(shape)
    res = ed.deform_grid(X, displacement, order=order, crop=crop, mode=mode,
                         axis=axis)
    ref_old = deform_grid_oracle_oldmode(X, displacement, order=order,
                                         crop=crop, mode=mode, axis=axis)
    np.testing.assert_allclose(ref_old, res, rtol=rtol, atol=atol)
    if mode in MODERN_OK:
        ref = deform_grid_oracle(X, displacement, order=order, crop=crop,
                                 mode=mode, axis=axis)
        np.testing.assert_allclose(ref, res, rtol=rtol, atol=atol)


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_basic_2d(order, mode):
    run_comparison((60, 45), (3, 3), order=order, mode=mode)


@pytest.mark.parametrize("points", [(3, 5), (1, 5)])
def test_basic_2d_points(points):
    run_comparison((50, 40), points, order=3, mode='mirror')
    run_comparison((50, 40), points, order=2, mode='constant')


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_basic_3d(order):
    run_comparison((25, 30, 20), (3, 3, 3), order=order)


def test_basic_3d_mixed_points():
    run_comparison((25, 30, 20), (3, 5, 7), order=3)
    run_comparison((25, 30, 20), (1, 3, 5), order=3, mode='mirror')


@pytest.mark.parametrize("crop", [
    (slice(0, 25), slice(0, 20)),
    (slice(10, 30), slice(10, 30)),
    (slice(25, 50), slice(25, 45)),
])
@pytest.mark.parametrize("order", [0, 1, 3])
def test_crop_2d(crop, order):
    run_comparison((50, 45), (3, 3), crop=crop, order=order)


def test_crop_3d():
    run_comparison((25, 25, 25), (3, 3, 5), order=3,
                   crop=(slice(15, 25), slice(None), slice(None)))


@pytest.mark.parametrize("rotate", [-30, 0, 30, None])
@pytest.mark.parametrize("zoom", [0.5, 1.5, None])
def test_crop_rotate_zoom(rotate, zoom):
    # crop-consistency invariant (reference tests/test_deform_grid.py:121-133)
    shape, points = (60, 60), (3, 3)
    crop = (slice(10, 50), slice(15, 45))
    for affine in (None, np.eye(3)):
        X = RNG.random(shape)
        displacement = RNG.standard_normal((2, *points)) * 3
        no_crop = ed.deform_grid(X, displacement, rotate=rotate, zoom=zoom,
                                 affine=affine)
        with_crop = ed.deform_grid(X, displacement, rotate=rotate, zoom=zoom,
                                   crop=crop, affine=affine)
        np.testing.assert_allclose(no_crop[crop], with_crop,
                                   rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("order", [0, 3, [0, 3]])
@pytest.mark.parametrize("crop", [None, (slice(15, 25), slice(15, 50))])
def test_multi_2d(order, crop):
    points, shape, sigma = (3, 3), (60, 55), 25
    for cval in (0.0, [0.0, 1.0]):
        displacement = RNG.standard_normal((2, *points)) * sigma
        X = RNG.random(shape).astype('float64')
        Y = RNG.random(shape).astype('float32')
        order_list = order if isinstance(order, list) else [order] * 2
        cval_list = cval if isinstance(cval, list) else [cval] * 2
        ref_X = deform_grid_oracle(X, displacement, order=order_list[0],
                                   crop=crop, cval=cval_list[0])
        ref_Y = deform_grid_oracle(Y, displacement, order=order_list[1],
                                   crop=crop, cval=cval_list[1])
        res_X, res_Y = ed.deform_grid([X, Y], displacement, order=order,
                                      crop=crop, cval=cval)
        assert res_X.dtype == np.float64 and res_Y.dtype == np.float32
        np.testing.assert_allclose(ref_X, res_X, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(ref_Y, res_Y, rtol=1e-5, atol=1e-5)


def test_multi_2d_mixed_modes():
    points, shape = (3, 3), (40, 35)
    displacement = RNG.standard_normal((2, *points)) * 25
    X = RNG.random(shape)
    Y = RNG.random(shape)
    res_X, res_Y = ed.deform_grid([X, Y], displacement,
                                  mode=['constant', 'reflect'])
    ref_X = deform_grid_oracle_oldmode(X, displacement, mode='constant')
    ref_Y = deform_grid_oracle_oldmode(Y, displacement, mode='reflect')
    np.testing.assert_allclose(ref_X, res_X, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ref_Y, res_Y, rtol=1e-5, atol=1e-8)


def test_multi_3d():
    points, shape = (3, 3, 3), (25, 25, 30)
    for crop in (None, (slice(15, 20), slice(15, 25), slice(2, 10))):
        displacement = RNG.standard_normal((3, *points)) * 25
        X = RNG.random(shape)
        Y = RNG.random(shape)
        ref_X = deform_grid_oracle(X, displacement, order=3, crop=crop)
        ref_Y = deform_grid_oracle(Y, displacement, order=3, crop=crop)
        res_X, res_Y = ed.deform_grid([X, Y], displacement, order=3, crop=crop)
        np.testing.assert_allclose(ref_X, res_X, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(ref_Y, res_Y, rtol=1e-5, atol=1e-8)


def test_axis():
    # channel axes before/after/between deformed axes
    # (reference tests/test_deform_grid.py:201-237)
    run_comparison(shape=(30, 20, 3), points=(3, 3), axis=(0, 1))
    run_comparison(shape=(20, 3, 30), points=(3, 3), axis=(0, 2))
    run_comparison(shape=(40, 3, 35, 4), points=(3, 3), axis=(0, 2))

    # multiple inputs, same axes, different channel counts
    X = RNG.random((3, 50, 40, 7))
    Y = RNG.random((7, 50, 40))
    displacement = RNG.standard_normal((2, 5, 3)) * 25
    ref_X = deform_grid_oracle(X, displacement, axis=(1, 2))
    ref_Y = deform_grid_oracle(Y, displacement, axis=(1, 2))
    res_X, res_Y = ed.deform_grid([X, Y], displacement, axis=(1, 2))
    np.testing.assert_allclose(ref_X, res_X, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ref_Y, res_Y, rtol=1e-5, atol=1e-8)

    # multiple inputs, different axes
    X = RNG.random((3, 20, 30))
    Y = RNG.random((20, 30))
    displacement = RNG.standard_normal((2, 5, 3)) * 25
    ref_X = deform_grid_oracle(X, displacement, axis=(1, 2))
    ref_Y = deform_grid_oracle(Y, displacement, axis=(0, 1))
    res_X, res_Y = ed.deform_grid([X, Y], displacement, axis=[(1, 2), (0, 1)])
    np.testing.assert_allclose(ref_X, res_X, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ref_Y, res_Y, rtol=1e-5, atol=1e-8)

    # multiple inputs with cropping on deformed axes only
    X = RNG.random((3, 50, 40, 7))
    Y = RNG.random((7, 50, 40))
    displacement = RNG.standard_normal((2, 5, 3)) * 25
    for crop in [(slice(20, 40), slice(10, 30)), (slice(0, 30), slice(0, 40))]:
        ref_X = deform_grid_oracle(X, displacement, axis=(1, 2), crop=crop)
        ref_Y = deform_grid_oracle(Y, displacement, axis=(1, 2), crop=crop)
        res_X, res_Y = ed.deform_grid([X, Y], displacement, axis=(1, 2),
                                      crop=crop)
        np.testing.assert_allclose(ref_X, res_X, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(ref_Y, res_Y, rtol=1e-5, atol=1e-8)


def test_random_grid_runs():
    # smoke: deform_random_grid across orders (reference :82-87)
    for points in (3, (3, 5)):
        X = RNG.random((40, 40))
        out = ed.deform_random_grid(X, points=points)
        assert out.shape == X.shape and out.dtype == X.dtype


def test_integer_dtype_round_clamp():
    # integer outputs use round-half-away + clamp (reference deform.c:292-306)
    X = (RNG.random((30, 30)) * 200).astype(np.uint8)
    displacement = RNG.standard_normal((2, 3, 3)) * 10
    out = ed.deform_grid(X, displacement, order=1)
    ref = deform_grid_oracle_oldmode(X.astype(np.float64), displacement,
                                     order=1)
    ref_cast = np.clip(np.where(ref > 0, ref + 0.5, 0), 0, 255).astype(np.uint8)
    assert out.dtype == np.uint8
    # allow off-by-one where the float value sits within fp tolerance of x.5
    diff = np.abs(out.astype(int) - ref_cast.astype(int))
    frac = np.abs((ref + 0.5) - np.round(ref + 0.5))
    assert ((diff == 0) | (frac < 1e-6)).all()


@pytest.mark.parametrize("dtype", [np.uint8, np.int16])
@pytest.mark.parametrize("order", [2, 3, 5])
def test_integer_prefilter_c_cast(dtype, order):
    """Integer inputs with prefilter and order>1 follow the reference's
    int-dtype prefilter writeback (C truncate+wrap cast per axis).

    The reference writes each per-axis spline_filter1d result into
    ``numpy.zeros_like(x)`` (reference deform_grid.py:157-161), so the
    coefficients themselves live in the integer dtype between axes — e.g.
    -12.69 becomes 244 in uint8. The oracle replicates that exact pipeline.
    """
    import scipy.ndimage
    X = (RNG.random((30, 28)) * 200).astype(dtype)
    displacement = RNG.standard_normal((2, 3, 3)) * 8
    out = ed.deform_grid(X, displacement, order=order, mode='mirror')
    assert out.dtype == dtype

    # oracle: the reference's integer-dtype per-axis prefilter ...
    x = X
    for d in range(2):
        x_f = np.zeros_like(x)
        scipy.ndimage.spline_filter1d(x, axis=d, order=order, output=x_f)
        x = x_f
    # ... then resample the integer coefficient table without prefiltering
    ref = deform_grid_oracle_oldmode(x.astype(np.float64), displacement,
                                     order=order, prefilter=False,
                                     mode='mirror')
    # reference output cast: round half away from zero + clamp
    info = np.iinfo(dtype)
    if np.dtype(dtype).kind == 'u':
        r = np.where(ref > 0, ref + 0.5, 0.0)
    else:
        r = np.where(ref > 0, ref + 0.5, ref - 0.5)
    ref_cast = np.trunc(np.clip(r, info.min, info.max)).astype(dtype)
    diff = np.abs(out.astype(np.int64) - ref_cast.astype(np.int64))
    # allow off-by-one where the value sits within fp tolerance of x.5
    frac = np.abs((np.abs(ref) + 0.5) - np.round(np.abs(ref) + 0.5))
    assert ((diff == 0) | (frac < 1e-6)).all(), \
        f"{(diff != 0).mean():.3f} mismatched, max {diff.max()}"


def test_affine_crop_axis_3d():
    """3D affine combined with crop and a channel axis vs the oracle —
    a combination the reference never tests (its affine tests are 2D or
    identity-only, tests/test_deform_grid.py:121-133)."""
    from elasticdeform_tpu.affine import inverse_affine

    X = RNG.random((3, 30, 26, 28))
    displacement = RNG.standard_normal((3, 3, 3, 3)) * 4
    affine = np.eye(4) + RNG.standard_normal((4, 4)) * 0.02
    affine[3] = [0, 0, 0, 1]
    inv = inverse_affine(affine[:3, :])
    for crop in (None, (slice(5, 25), slice(4, 20), slice(6, 22))):
        res = ed.deform_grid(X, displacement, axis=(1, 2, 3), affine=affine,
                             crop=crop, mode='mirror')
        ref = deform_grid_oracle_oldmode(X, displacement, axis=(1, 2, 3),
                                         affine=inv, crop=crop,
                                         mode='mirror')
        np.testing.assert_allclose(ref, res, rtol=1e-5, atol=1e-8)


def test_bool_passthrough():
    X = RNG.random((20, 20)) > 0.5
    displacement = RNG.standard_normal((2, 3, 3)) * 5
    out = ed.deform_grid(X, displacement, order=0)
    assert out.dtype == np.bool_


def test_different_strides():
    # non-C-contiguous inputs (reference tests/test_deform_grid.py:185-199)
    X = RNG.random((60, 45))
    Y = np.array(X, order='F')
    assert X.strides != Y.strides
    displacement = RNG.standard_normal((2, 3, 3)) * 25
    res_X, res_Y = ed.deform_grid([X, Y], displacement, prefilter=False)
    ref = deform_grid_oracle(X, displacement, prefilter=False)
    np.testing.assert_allclose(ref, res_X, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(res_X, res_Y, rtol=0, atol=0)


def test_prefilter_false():
    X = RNG.random((40, 35))
    displacement = RNG.standard_normal((2, 3, 3)) * 10
    res = ed.deform_grid(X, displacement, order=3, prefilter=False)
    ref = deform_grid_oracle(X, displacement, order=3, prefilter=False)
    np.testing.assert_allclose(ref, res, rtol=1e-5, atol=1e-8)
