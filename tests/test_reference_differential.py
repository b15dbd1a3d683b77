"""Differential tests against the ORIGINAL reference C extension.

Strongest possible oracle: run the actual gvtulder/elasticdeform C
implementation side by side on random configurations. The reference is an
optional dependency (same pattern as its own optional TF/torch tests,
reference tests/test_deform_grid.py:9-26): these tests skip unless
``elasticdeform`` is importable — locally, build it out-of-tree, e.g.::

    cp -r /root/reference /tmp/refbuild
    (cd /tmp/refbuild && python setup.py build_ext --inplace)

and run with ``PYTHONPATH=/tmp/refbuild``.
"""

import os
import sys

import numpy as np
import pytest

for _cand in ("/tmp/refbuild",):
    if os.path.isdir(_cand) and _cand not in sys.path:
        sys.path.append(_cand)

edc = pytest.importorskip("elasticdeform")

import elasticdeform_tpu as ed  # noqa: E402

RNG = np.random.default_rng(2024)

ALL_MODES = ("nearest", "wrap", "reflect", "mirror", "constant")


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_forward_2d(order, mode):
    X = RNG.random((40, 50))
    d = RNG.standard_normal((2, 3, 3)) * 6
    a = edc.deform_grid(X, d, order=order, mode=mode, cval=1.5)
    b = np.asarray(ed.deform_grid(X, d, order=order, mode=mode, cval=1.5))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("order", [0, 1, 3, 5])
def test_forward_3d(order):
    X = RNG.random((18, 20, 16))
    d = RNG.standard_normal((3, 3, 3, 3)) * 4
    a = edc.deform_grid(X, d, order=order, mode='mirror')
    b = np.asarray(ed.deform_grid(X, d, order=order, mode='mirror'))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_forward_crop_rotate_zoom_multi():
    X = RNG.random((50, 60))
    Y = RNG.random((50, 60)).astype(np.float32)
    d = RNG.standard_normal((2, 3, 3)) * 8
    kw = dict(order=[3, 1], mode=['mirror', 'reflect'], rotate=25, zoom=1.3,
              crop=(slice(10, 40), slice(5, 45)))
    a1, a2 = edc.deform_grid([X, Y], d, **kw)
    b1, b2 = ed.deform_grid([X, Y], d, **kw)
    np.testing.assert_allclose(a1, np.asarray(b1), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(a2, np.asarray(b2), rtol=1e-4, atol=1e-4)


def test_forward_axis_channels():
    X = RNG.random((3, 30, 26))
    d = RNG.standard_normal((2, 3, 3)) * 5
    a = edc.deform_grid(X, d, order=3, mode='mirror', axis=(1, 2))
    b = np.asarray(ed.deform_grid(X, d, order=3, mode='mirror', axis=(1, 2)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("mode", ["mirror", "constant", "wrap"])
@pytest.mark.parametrize("order", [0, 1, 3, 5])
def test_gradient_2d(order, mode):
    d = RNG.standard_normal((2, 3, 3)) * 5
    gy = RNG.random((30, 34))
    a = edc.deform_grid_gradient(gy, d, order=order, mode=mode)
    b = np.asarray(ed.deform_grid_gradient(gy, d, order=order, mode=mode))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_gradient_crop_3d():
    d = RNG.standard_normal((3, 3, 3, 3)) * 3
    gy = RNG.random((10, 12, 8))
    kw = dict(order=3, mode='constant',
              crop=(slice(4, 14), slice(2, 14), slice(6, 14)),
              X_shape=(20, 18, 16))
    a = edc.deform_grid_gradient(gy, d, **kw)
    b = np.asarray(ed.deform_grid_gradient(gy, d, **kw))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16])
def test_integer_prefilter_exact(dtype):
    # the int-dtype prefilter writeback path: bit-exact vs the reference
    X = (RNG.random((36, 32)) * 200).astype(dtype)
    d = RNG.standard_normal((2, 3, 3)) * 5
    a = edc.deform_grid(X, d, order=3, mode='mirror')
    b = np.asarray(ed.deform_grid(X, d, order=3, mode='mirror'))
    diff = np.abs(a.astype(np.int64) - b.astype(np.int64))
    # f64-vs-f64 path: allow only off-by-one at exact .5 rounding boundaries
    assert (diff <= 1).all() and (diff == 0).mean() > 0.995


def _random_config(rng):
    """One random legal (args, kwargs) configuration for deform_grid."""
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(9, 28)) for _ in range(ndim))
    points = tuple(int(rng.integers(3, 6)) for _ in range(ndim))
    order = int(rng.integers(0, 6))
    mode = ALL_MODES[int(rng.integers(0, len(ALL_MODES)))]
    kw = dict(order=order, mode=mode)
    if mode == "constant":
        kw["cval"] = float(rng.normal()) * 2
    if rng.random() < 0.5:
        kw["prefilter"] = bool(rng.random() < 0.5)
    crop = None
    if rng.random() < 0.4:
        crop = []
        for n in shape:
            if rng.random() < 0.3:
                crop.append(slice(None))
            else:
                a = int(rng.integers(0, n - 4))
                b = int(rng.integers(a + 3, n))
                crop.append(slice(a, b))
        kw["crop"] = crop
    if ndim == 1:
        kw.pop("crop", None)   # keep 1-D configs simple: full extent
    if ndim == 2 and rng.random() < 0.3:
        kw["rotate"] = float(rng.uniform(-40, 40))
        kw["zoom"] = float(rng.uniform(0.7, 1.5))
    X = rng.random(shape)
    d = rng.standard_normal((ndim, *points)) * rng.uniform(1, 8)
    return X, d, kw


@pytest.mark.parametrize("trial", range(40))
def test_fuzz_forward_vs_reference(trial):
    """Seeded random-configuration fuzzer: any (ndim, shape, order, mode,
    cval, prefilter, crop, rotate/zoom) combination must match the
    reference C extension at its own test tolerance
    (reference tests/test_deform_grid.py:365)."""
    rng = np.random.default_rng(7000 + trial)
    X, d, kw = _random_config(rng)
    a = edc.deform_grid(X, d, **kw)
    b = np.asarray(ed.deform_grid(X, d, **kw))
    if kw["order"] == 0:
        # order-0 rounding at exact .5 coordinate boundaries may pick the
        # other neighbour in fp32-sensitive spots; require identical
        # values on >99% of voxels and no large deviations elsewhere
        frac = np.mean(~np.isclose(a, b, rtol=1e-5, atol=1e-8))
        assert frac < 0.01, f"order-0 mismatch fraction {frac}"
    else:
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("trial", range(20))
def test_fuzz_gradient_vs_reference(trial):
    rng = np.random.default_rng(9000 + trial)
    X, d, kw = _random_config(rng)
    if kw["order"] == 0:
        kw["order"] = 3  # gradient of order-0 is zero a.e.; not informative
    out = edc.deform_grid(X, d, **kw)
    gy = rng.random(out.shape)
    ga = edc.deform_grid_gradient(gy, d, X_shape=X.shape, **kw)
    gb = np.asarray(ed.deform_grid_gradient(gy, d, X_shape=X.shape, **kw))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-8)


def test_forward_and_gradient_4d():
    """The voxel loop generalizes to any rank (reference deform.c is
    rank-generic); pin 4-D forward + gradient against the reference."""
    rng = np.random.default_rng(77)
    X = rng.random((9, 10, 8, 7))
    d = rng.standard_normal((4, 3, 3, 3, 3)) * 2
    a = edc.deform_grid(X, d, order=3, mode='mirror')
    b = np.asarray(ed.deform_grid(X, d, order=3, mode='mirror'))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
    gy = rng.random(X.shape)
    ga = edc.deform_grid_gradient(gy, d, order=3, mode='mirror')
    gb = np.asarray(ed.deform_grid_gradient(gy, d, order=3, mode='mirror'))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-8)


def test_forward_and_gradient_1d():
    rng = np.random.default_rng(78)
    X = rng.random(50)
    d = rng.standard_normal((1, 4)) * 3
    for mode in ALL_MODES:
        a = edc.deform_grid(X, d, order=3, mode=mode)
        b = np.asarray(ed.deform_grid(X, d, order=3, mode=mode))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
    gy = rng.random(50)
    ga = edc.deform_grid_gradient(gy, d, order=3, mode='wrap')
    gb = np.asarray(ed.deform_grid_gradient(gy, d, order=3, mode='wrap'))
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-8)
