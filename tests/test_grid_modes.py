"""Modern-SciPy (>= 1.6) interpolation boundary modes.

The library's classic five mode names on :func:`map_coordinates` keep
the reference's pre-1.6 semantics (reference deform.c:47-128); the
``grid-*`` names — plus 'reflect'/'nearest' on the scipy-convention
resamplers (affine_transform/shift/zoom/rotate/geometric_transform) —
must match modern ``scipy.ndimage`` exactly (core._modern_map_coordinates,
ops/prefilter.filter_matrix_bc). Differential tests against scipy with
coordinates far out of range, all orders 0-5.
"""
import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

GRID_MODES = ("grid-mirror", "grid-wrap", "grid-constant")
MODERN_MODES = GRID_MODES + ("reflect", "nearest")


@pytest.fixture
def rng():
    return np.random.default_rng(29)


@pytest.mark.parametrize("mode", GRID_MODES)
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_map_coordinates_grid_modes_2d(rng, mode, order):
    x = rng.standard_normal((9, 12))
    cc = np.stack([rng.uniform(-22, 34, (150,)),
                   rng.uniform(-22, 34, (150,))])
    want = scipy.ndimage.map_coordinates(x, cc, order=order, mode=mode,
                                         cval=1.25)
    got = np.asarray(ed.map_coordinates(x, cc, order=order, mode=mode,
                                        cval=1.25))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mode", GRID_MODES)
def test_map_coordinates_grid_modes_3d(rng, mode):
    x = rng.standard_normal((7, 8, 9))
    cc = np.stack([rng.uniform(-10, 18, (5, 11)) for _ in range(3)])
    want = scipy.ndimage.map_coordinates(x, cc, order=3, mode=mode,
                                         cval=-0.5)
    got = np.asarray(ed.map_coordinates(x, cc, order=3, mode=mode,
                                        cval=-0.5))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mode", GRID_MODES)
@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_map_coordinates_grid_modes_1d(rng, mode, order):
    x = rng.standard_normal(13)
    cc = rng.uniform(-30, 42, (1, 200))
    want = scipy.ndimage.map_coordinates(x, cc, order=order, mode=mode,
                                         cval=2.0)
    got = np.asarray(ed.map_coordinates(x, cc, order=order, mode=mode,
                                        cval=2.0))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mode", GRID_MODES)
def test_map_coordinates_prefilter_false(rng, mode):
    # user-prefiltered coefficients: the mode extends the GIVEN array
    x = rng.standard_normal((10, 11))
    cc = np.stack([rng.uniform(-6, 16, (80,)),
                   rng.uniform(-6, 16, (80,))])
    want = scipy.ndimage.map_coordinates(x, cc, order=3, mode=mode,
                                         cval=0.5, prefilter=False)
    got = np.asarray(ed.map_coordinates(x, cc, order=3, mode=mode,
                                        cval=0.5, prefilter=False))
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# scipy-convention resamplers: modern 'reflect'/'nearest' + grid modes


@pytest.mark.parametrize("mode", MODERN_MODES)
@pytest.mark.parametrize("order", [0, 1, 3, 5])
def test_shift_modern_modes(rng, mode, order):
    x = rng.standard_normal((12,))
    want = scipy.ndimage.shift(x, 3.4, order=order, mode=mode, cval=1.25)
    got = np.asarray(ed.shift(x, 3.4, order=order, mode=mode, cval=1.25))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mode", MODERN_MODES)
def test_affine_transform_modern_modes(rng, mode):
    x = rng.standard_normal((9, 10))
    m = np.array([[0.8, 0.1], [-0.2, 1.1]])
    want = scipy.ndimage.affine_transform(x, m, offset=(-2.5, 1.5),
                                          order=3, mode=mode, cval=0.75)
    got = np.asarray(ed.affine_transform(x, m, offset=(-2.5, 1.5),
                                         order=3, mode=mode, cval=0.75))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mode", MODERN_MODES)
def test_rotate_modern_modes(rng, mode):
    x = rng.standard_normal((10, 13))
    want = scipy.ndimage.rotate(x, 33.0, order=3, mode=mode, cval=0.3)
    got = np.asarray(ed.rotate(x, 33.0, order=3, mode=mode, cval=0.3))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("mode", ["grid-constant", "grid-mirror",
                                  "nearest", "mirror"])
@pytest.mark.parametrize("zf", [0.6, 1.7])
def test_zoom_grid_mode(rng, mode, zf):
    x = rng.standard_normal((11, 9))
    want = scipy.ndimage.zoom(x, zf, order=3, mode=mode, cval=0.1,
                              grid_mode=True)
    got = np.asarray(ed.zoom(x, zf, order=3, mode=mode, cval=0.1,
                             grid_mode=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_zoom_grid_mode_warns_on_constant(rng):
    x = rng.standard_normal((8, 8))
    with pytest.warns(UserWarning, match="grid-constant"):
        ed.zoom(x, 1.3, mode='constant', grid_mode=True)


def test_geometric_transform_modern_reflect(rng):
    x = rng.standard_normal((9, 11))
    want = scipy.ndimage.geometric_transform(
        x, lambda c: (c[0] - 2.3, c[1] + 1.7), order=3, mode='reflect')
    got = np.asarray(ed.geometric_transform(
        x, lambda c: (c[0] - 2.3, c[1] + 1.7), order=3, mode='reflect'))
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# spline_filter modes


@pytest.mark.parametrize("mode", ["mirror", "reflect", "nearest", "wrap",
                                  "constant", "grid-wrap",
                                  "grid-constant", "grid-mirror"])
@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_spline_filter1d_modes(rng, mode, order):
    x = rng.standard_normal((9, 14))
    want = scipy.ndimage.spline_filter1d(x, order=order, axis=1,
                                         mode=mode, output=np.float64)
    got = np.asarray(ed.spline_filter1d(x, order=order, axis=1,
                                        mode=mode))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spline_filter_mode_and_output(rng):
    x = rng.standard_normal((8, 9)).astype(np.float32)
    want = scipy.ndimage.spline_filter(x, order=3, mode='grid-wrap',
                                       output=np.float64)
    got = np.asarray(ed.spline_filter(x, order=3, mode='grid-wrap'))
    np.testing.assert_allclose(got, want, atol=2e-5)
    out = np.zeros_like(x)
    ret = ed.spline_filter(x, order=3, mode='grid-wrap', output=out)
    assert ret is out
    np.testing.assert_allclose(out, want, atol=2e-5)


def test_spline_filter1d_default_axis_matches_scipy(rng):
    # scipy's default axis is -1
    x = rng.standard_normal((6, 10))
    want = scipy.ndimage.spline_filter1d(x, order=3, output=np.float64)
    got = np.asarray(ed.spline_filter1d(x, order=3))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spline_filter1d_bad_mode_raises(rng):
    with pytest.raises(RuntimeError, match="boundary mode"):
        ed.spline_filter1d(rng.standard_normal(8), order=3,
                           mode='no-such-mode')


# ---------------------------------------------------------------------------
# dtypes, channels, tracing, batching, gradients


def test_grid_modes_integer_writeback(rng):
    x = rng.integers(0, 200, (9, 11)).astype(np.uint8)
    cc = np.stack([rng.uniform(-4, 13, (60,)),
                   rng.uniform(-4, 13, (60,))])
    for mode in GRID_MODES:
        want = scipy.ndimage.map_coordinates(x, cc, order=3, mode=mode,
                                             cval=7.0)
        got = np.asarray(ed.map_coordinates(x, cc, order=3, mode=mode,
                                            cval=7.0))
        assert got.dtype == want.dtype
        # f32 rounding at .5 boundaries may flip single values by 1
        assert (got.astype(int) - want.astype(int) != 0).mean() < 0.05
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_grid_modes_complex(rng):
    x = (rng.standard_normal((8, 9))
         + 1j * rng.standard_normal((8, 9))).astype(np.complex64)
    cc = np.stack([rng.uniform(-3, 11, (40,)),
                   rng.uniform(-3, 11, (40,))])
    want = scipy.ndimage.map_coordinates(x, cc, order=3,
                                         mode='grid-wrap')
    got = np.asarray(ed.map_coordinates(x, cc, order=3,
                                        mode='grid-wrap'))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_grid_modes_channel_axis(rng):
    x = rng.standard_normal((3, 10, 11))
    cc = np.stack([rng.uniform(-3, 14, (6, 7)),
                   rng.uniform(-3, 14, (6, 7))])
    got = np.asarray(ed.map_coordinates(x, cc, order=3,
                                        mode='grid-mirror', axis=(1, 2)))
    assert got.shape == (3, 6, 7)
    for c in range(3):
        want = scipy.ndimage.map_coordinates(x[c], cc, order=3,
                                             mode='grid-mirror')
        np.testing.assert_allclose(got[c], want, atol=2e-5)


def test_grid_modes_jit_and_vmap(rng):
    x = rng.standard_normal((4, 9, 10)).astype(np.float32)
    cc = np.stack([np.stack([rng.uniform(-3, 12, (5, 6)),
                             rng.uniform(-3, 12, (5, 6))])
                   for _ in range(4)])
    f = jax.jit(lambda a, c: ed.map_coordinates_batch(
        a, c, order=3, mode='grid-wrap'))
    got = np.asarray(f(jnp.asarray(x), jnp.asarray(cc)))
    for b in range(4):
        want = scipy.ndimage.map_coordinates(
            np.asarray(x[b], np.float64), cc[b], order=3,
            mode='grid-wrap')
        np.testing.assert_allclose(got[b], want, atol=2e-5)


@pytest.mark.parametrize("mode", GRID_MODES)
def test_grid_modes_gradient_adjoint(rng, mode):
    """map_coordinates_gradient == the exact transpose of the (linear)
    forward for the grid modes: <dy, M x> == <M^T dy, x>."""
    X = rng.standard_normal((8, 9)).astype(np.float32)
    cc = np.stack([rng.uniform(-3, 11, (7, 6)),
                   rng.uniform(-3, 11, (7, 6))]).astype(np.float32)
    y = np.asarray(ed.map_coordinates(X, cc, order=3, mode=mode,
                                      cval=0.0))
    dy = rng.standard_normal(y.shape).astype(np.float32)
    gx = np.asarray(ed.map_coordinates_gradient(
        dy, cc, order=3, mode=mode, X_shape=X.shape))
    lhs = float(np.vdot(dy, y))
    rhs = float(np.vdot(gx, X))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_grid_modes_coordinate_gradient_fd(rng):
    """d/dcoordinates through the modern path agrees with finite
    differences away from cell boundaries."""
    X = rng.standard_normal((9, 9)).astype(np.float32)
    cc = jnp.asarray(np.stack([rng.uniform(1.2, 7.3, (10,)),
                               rng.uniform(1.2, 7.3, (10,))]),
                     jnp.float32)
    proj = jnp.asarray(rng.standard_normal((10,)), jnp.float32)

    def f(c):
        return jnp.vdot(ed.map_coordinates(X, c, order=3,
                                           mode='grid-mirror'), proj)

    g = np.asarray(jax.grad(f)(cc))
    eps = 1e-2
    for (i, j) in [(0, 2), (1, 5)]:
        e = np.zeros(cc.shape, np.float32)
        e[i, j] = eps
        fd = (float(f(cc + e)) - float(f(cc - e))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=5e-2, atol=1e-3)


def test_unknown_mode_still_raises(rng):
    with pytest.raises(RuntimeError, match="boundary mode"):
        ed.map_coordinates(rng.standard_normal((5, 5)),
                           np.zeros((2, 3)), mode='grid-bogus')
