"""Tests for the general resampler: map_coordinates / deform_field.

Oracles: scipy.ndimage.map_coordinates directly for the modes whose
semantics are unchanged in modern SciPy (mirror, constant, wrap — the same
gating the conformance suite uses, reference tests/test_deform_grid.py:94-97),
and the all-modes pre-1.6 oracle (tests/oracle.py map_coordinates_oracle)
for the full mode matrix. Internal-consistency contracts: composing
displacement_field with map_coordinates must reproduce deform exactly, and
map_coordinates_gradient must be the exact adjoint.
"""
import hashlib

import numpy as np
import pytest
import scipy.ndimage

import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed
from oracle import map_coordinates_oracle

ALL_MODES = ("nearest", "wrap", "reflect", "mirror", "constant")
MODERN_MODES = ("mirror", "constant", "wrap")


@pytest.fixture
def rng(request):
    seed = int(hashlib.sha256(request.node.nodeid.encode()).hexdigest()[:8],
               16)
    return np.random.default_rng(seed)


def _coords(rng, in_shape, out_shape, margin=6.0):
    """Random sample coordinates, including out-of-range positions."""
    return np.stack([
        rng.uniform(-margin, n - 1 + margin, size=out_shape)
        for n in in_shape]).astype(np.float64)


@pytest.mark.parametrize("mode", MODERN_MODES)
@pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
@pytest.mark.parametrize("prefilter", [True, False])
def test_matches_scipy_modern(rng, mode, order, prefilter):
    X = rng.random((40, 53))
    coords = _coords(rng, X.shape, (31, 27))
    got = np.asarray(ed.map_coordinates(X, coords, order=order, mode=mode,
                                        cval=-1.25, prefilter=prefilter))
    want = scipy.ndimage.map_coordinates(X, coords, order=order, mode=mode,
                                         cval=-1.25, prefilter=prefilter)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("order", [1, 3, 5])
def test_all_modes_oracle(rng, mode, order):
    X = rng.random((38, 29, 17))
    coords = _coords(rng, X.shape, (12, 19, 9))
    got = np.asarray(ed.map_coordinates(X, coords, order=order, mode=mode,
                                        cval=0.5))
    want = map_coordinates_oracle(X, coords, order=order, mode=mode, cval=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_order0_oracle(rng, mode):
    X = rng.random((50, 41))
    coords = _coords(rng, X.shape, (33, 35))
    got = np.asarray(ed.map_coordinates(X, coords, order=0, mode=mode))
    want = map_coordinates_oracle(X, coords, order=0, mode=mode)
    # f32/f64 rounding near half-integer coordinates may flip single voxels
    assert (np.abs(got - want) > 1e-6).mean() < 0.01


def test_flat_point_list(rng):
    """scipy semantics: output shape == coordinates.shape[1:] — any rank."""
    X = rng.random((30, 40))
    coords = _coords(rng, X.shape, (257,))
    got = np.asarray(ed.map_coordinates(X, coords, order=3, mode='mirror'))
    assert got.shape == (257,)
    want = scipy.ndimage.map_coordinates(X, coords, order=3, mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_reproduces_deform(rng):
    """identity + displacement_field composed through map_coordinates
    must equal deform exactly (same pipeline, same coordinates)."""
    X = rng.random((40, 36))
    d = rng.standard_normal((2, 3, 3)) * 8
    field = ed.displacement_field(d, X.shape)
    idx = np.stack(np.meshgrid(*[np.arange(n, dtype=np.float64)
                                 for n in X.shape], indexing='ij'))
    got = np.asarray(ed.map_coordinates(X, idx + np.asarray(field),
                                        order=3, mode='mirror'))
    want = np.asarray(ed.deform(X, d, order=3, mode='mirror'))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_deform_field_matches_deform(rng):
    X = rng.random((33, 47))
    d = rng.standard_normal((2, 4, 3)) * 6
    field = ed.displacement_field(d, X.shape)
    for mode in ("mirror", "constant"):
        got = np.asarray(ed.deform_field(X, field, order=3, mode=mode,
                                         cval=0.25))
        want = np.asarray(ed.deform(X, d, order=3, mode=mode, cval=0.25))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_channel_axis(rng):
    """axis= carries the non-deformed axes along, like deform."""
    X = rng.random((3, 26, 31))
    coords = _coords(rng, (26, 31), (20, 22))
    got = np.asarray(ed.map_coordinates(X, coords, order=3, mode='nearest',
                                        axis=(1, 2)))
    assert got.shape == (3, 20, 22)
    for c in range(3):
        want = np.asarray(ed.map_coordinates(X[c], coords, order=3,
                                             mode='nearest'))
        np.testing.assert_allclose(got[c], want, rtol=1e-10, atol=1e-10)


def test_channel_axis_rank_check(rng):
    X = rng.random((3, 26, 31))
    coords = _coords(rng, (26, 31), (440,))
    with pytest.raises(ValueError, match="channel"):
        ed.map_coordinates(X, coords, order=3, axis=(1, 2))


def test_coordinates_shape_check(rng):
    X = rng.random((26, 31))
    with pytest.raises(ValueError, match="coordinates"):
        ed.map_coordinates(X, np.zeros((3, 10, 10)))


def test_strategy_equivalence(rng):
    X = rng.random((24, 28, 22))
    coords = _coords(rng, X.shape, (15, 11, 13))
    a = np.asarray(ed.map_coordinates(X, coords, order=3, mode='reflect',
                                      strategy='windows'))
    b = np.asarray(ed.map_coordinates(X, coords, order=3, mode='reflect',
                                      strategy='gather'))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("strategy", ["windows", "gather"])
def test_gradient_adjoint_identity(rng, strategy):
    """map_coordinates_gradient is the exact transpose of the (linear)
    forward: <dy, M x> == <M^T dy, x>."""
    X = rng.random((21, 26, 18))
    coords = _coords(rng, X.shape, (13, 17, 11))
    dy = rng.random((13, 17, 11))
    y = np.asarray(ed.map_coordinates(X, coords, order=3, mode='mirror',
                                      strategy=strategy))
    dx = np.asarray(ed.map_coordinates_gradient(
        dy, coords, order=3, mode='mirror', X_shape=X.shape,
        strategy=strategy))
    lhs = float(np.vdot(dy, y))
    rhs = float(np.vdot(dx, X))
    assert abs(lhs - rhs) <= 1e-10 * max(1.0, abs(lhs))


def test_gradient_requires_x_shape(rng):
    with pytest.raises(ValueError, match="X_shape"):
        ed.map_coordinates_gradient(np.zeros((5, 5)), np.zeros((2, 5, 5)))


def test_grad_wrt_coordinates(rng):
    """Differentiable w.r.t. the coordinates (finite-difference check)."""
    X = jnp.asarray(rng.random((16, 17)))
    coords = jnp.asarray(_coords(rng, (16, 17), (6, 7), margin=0.0))

    def loss(c):
        y = ed.map_coordinates(X, c, order=3, mode='mirror')
        return jnp.sum(jnp.sin(y))

    g = jax.grad(loss)(coords)
    eps = 1e-6
    for idx in [(0, 2, 3), (1, 4, 1)]:
        dc = coords.at[idx].add(eps)
        fd = (loss(dc) - loss(coords)) / eps
        assert abs(float(g[idx]) - float(fd)) < 1e-4


def test_jit_and_dtype(rng):
    X = rng.random((20, 25)).astype(np.float32)
    coords = _coords(rng, X.shape, (14, 15)).astype(np.float32)
    fn = jax.jit(lambda x, c: ed.map_coordinates(x, c, order=3,
                                                 mode='mirror'))
    got = np.asarray(fn(X, coords))
    assert got.dtype == np.float32
    want = np.asarray(ed.map_coordinates(
        X.astype(np.float64), coords.astype(np.float64), order=3,
        mode='mirror'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_integer_round_clamp(rng):
    """Integer outputs round+clamp like the reference (deform.c:287-306)."""
    X = (rng.random((24, 30)) * 255).astype(np.uint8)
    coords = _coords(rng, X.shape, (18, 21))
    got = np.asarray(ed.map_coordinates(X, coords, order=1, mode='mirror',
                                        prefilter=False))
    assert got.dtype == np.uint8
    ref = np.asarray(ed.map_coordinates(X.astype(np.float64), coords,
                                        order=1, mode='mirror',
                                        prefilter=False))
    np.testing.assert_array_equal(got,
                                  np.clip(np.round(ref), 0, 255).astype(
                                      np.uint8))


def test_numpy_api_wrappers(rng):
    """api.map_coordinates / api.map_coordinates_gradient: numpy in/out,
    jit-cached, identical to the JAX-native path."""
    from elasticdeform_tpu import api

    X = rng.random((22, 27, 16))
    coords = _coords(rng, X.shape, (12, 14, 9))
    got = api.map_coordinates(X, coords, order=3, mode='reflect')
    assert isinstance(got, np.ndarray) and got.dtype == X.dtype
    want = np.asarray(ed.map_coordinates(X, coords, order=3, mode='reflect'))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    dy = rng.random((12, 14, 9))
    gx = api.map_coordinates_gradient(dy, coords, order=3, mode='reflect',
                                      X_shape=X.shape)
    gw = np.asarray(ed.map_coordinates_gradient(dy, coords, order=3,
                                                mode='reflect',
                                                X_shape=X.shape))
    np.testing.assert_allclose(gx, gw, rtol=1e-12, atol=1e-12)
    # second call hits the spec-keyed jit cache
    got2 = api.map_coordinates(X, coords, order=3, mode='reflect')
    np.testing.assert_array_equal(got, got2)


@pytest.mark.parametrize("batch_impl", ["native", "vmap"])
def test_batched_matches_per_sample(rng, batch_impl):
    """map_coordinates_batch == per-sample map_coordinates, both impls."""
    B = 3
    X = rng.random((B, 20, 24, 18))
    coords = np.stack([_coords(rng, X.shape[1:], (12, 13, 9))
                       for _ in range(B)])
    got = np.asarray(ed.map_coordinates_batch(X, coords, order=3,
                                              mode='mirror',
                                              batch_impl=batch_impl))
    assert got.shape == (B, 12, 13, 9)
    for b in range(B):
        want = np.asarray(ed.map_coordinates(X[b], coords[b], order=3,
                                             mode='mirror'))
        np.testing.assert_allclose(got[b], want, rtol=1e-10, atol=1e-10)


def test_batched_constant_and_channels(rng):
    B = 2
    X = rng.random((B, 3, 22, 25))
    coords = np.stack([_coords(rng, (22, 25), (14, 16)) for _ in range(B)])
    got = np.asarray(ed.map_coordinates_batch(X, coords, order=3,
                                              mode='constant', cval=0.75,
                                              axis=(1, 2)))
    assert got.shape == (B, 3, 14, 16)
    for b in range(B):
        want = np.asarray(ed.map_coordinates(X[b], coords[b], order=3,
                                             mode='constant', cval=0.75,
                                             axis=(1, 2)))
        np.testing.assert_allclose(got[b], want, rtol=1e-10, atol=1e-10)


def test_deform_field_batch(rng):
    """Per-sample dense fields from grids reproduce deform_batch."""
    B = 3
    X = rng.random((B, 26, 30))
    d = rng.standard_normal((B, 2, 3, 3)) * 5
    field = np.stack([np.asarray(ed.displacement_field(d[b], (26, 30)))
                      for b in range(B)])
    got = np.asarray(ed.deform_field_batch(X, field, order=3, mode='mirror'))
    want = np.asarray(ed.deform_batch(X, d, order=3, mode='mirror'))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_deform_field_batch_grad(rng):
    """The batched warp is differentiable w.r.t. the field — the
    registration-training use case."""
    B = 2
    X = jnp.asarray(rng.random((B, 16, 18)), jnp.float32)
    tgt = jnp.asarray(rng.random((B, 16, 18)), jnp.float32)
    field = jnp.asarray(rng.standard_normal((B, 2, 16, 18)) * 2, jnp.float32)

    def loss(f):
        y = ed.deform_field_batch(X, f, order=3, mode='mirror')
        return jnp.mean((y - tgt) ** 2)

    g = jax.jit(jax.grad(loss))(field)
    assert g.shape == field.shape and bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_batched_batch_axis_check(rng):
    X = rng.random((3, 20, 20))
    with pytest.raises(ValueError, match="batch"):
        ed.map_coordinates_batch(X, np.zeros((2, 2, 20, 20)))


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_spline_filter_matches_scipy(rng, order):
    X = rng.random((30, 41))
    got = np.asarray(ed.spline_filter1d(X, order=order, axis=1))
    want = scipy.ndimage.spline_filter1d(X, order=order, axis=1,
                                         mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    got = np.asarray(ed.spline_filter(X, order=order))
    want = scipy.ndimage.spline_filter(X, order=order, mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_prefilter_precompute_pattern(rng):
    """Filter once + N warps with prefilter=False == prefilter=True warps."""
    X = rng.random((28, 33))
    coef = ed.spline_filter(X, order=3)
    for seed in (1, 2):
        coords = _coords(np.random.default_rng(seed), X.shape, (17, 19))
        a = np.asarray(ed.map_coordinates(coef, coords, order=3,
                                          mode='mirror', prefilter=False))
        b = np.asarray(ed.map_coordinates(X, coords, order=3,
                                          mode='mirror', prefilter=True))
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("mode", MODERN_MODES)
def test_affine_transform_matches_scipy(rng, mode):
    X = rng.random((32, 37))
    M = np.eye(2) + rng.standard_normal((2, 2)) * 0.1
    off = rng.standard_normal(2) * 3
    got = np.asarray(ed.affine_transform(X, M, off, order=3, mode=mode,
                                         cval=0.5))
    want = scipy.ndimage.affine_transform(X, M, off, order=3, mode=mode,
                                          cval=0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_affine_transform_forms(rng):
    """1-D scaling vector and homogeneous matrix match the (n,n)+offset
    form; output_shape is honored."""
    X = rng.random((24, 30))
    scale = np.array([1.25, 0.8])
    off = np.array([2.0, -1.5])
    a = np.asarray(ed.affine_transform(X, scale, off, order=3,
                                       mode='mirror',
                                       output_shape=(16, 18)))
    assert a.shape == (16, 18)
    b = np.asarray(ed.affine_transform(X, np.diag(scale), off, order=3,
                                       mode='mirror',
                                       output_shape=(16, 18)))
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    H = np.eye(3)
    H[:2, :2] = np.diag(scale)
    H[:2, 2] = off
    c = np.asarray(ed.affine_transform(X, H, order=3, mode='mirror',
                                       output_shape=(16, 18)))
    np.testing.assert_allclose(a, c, rtol=1e-12, atol=1e-12)
    want = scipy.ndimage.affine_transform(X, scale, off, order=3,
                                          mode='mirror',
                                          output_shape=(16, 18))
    np.testing.assert_allclose(a, want, rtol=1e-5, atol=1e-8)


def test_affine_transform_grad(rng):
    """Differentiable w.r.t. matrix and offset (rigid-alignment use)."""
    X = jnp.asarray(rng.random((20, 22)), jnp.float32)

    def loss(m, off):
        y = ed.affine_transform(X, m, off, order=3, mode='mirror')
        return jnp.mean(y ** 2)

    gm, go = jax.grad(loss, argnums=(0, 1))(
        jnp.eye(2, dtype=jnp.float32) * 1.1,
        jnp.asarray([1.0, -2.0], jnp.float32))
    assert bool(jnp.isfinite(gm).all()) and bool(jnp.isfinite(go).all())
    assert float(jnp.abs(gm).max()) > 0


def test_affine_transform_shape_checks(rng):
    X = rng.random((20, 22))
    with pytest.raises(ValueError, match="matrix"):
        ed.affine_transform(X, np.eye(3)[:2])
    with pytest.raises(ValueError, match="output_shape"):
        ed.affine_transform(X, np.eye(2), output_shape=(5,))


def test_randomized_scipy_differential():
    """Seeded randomized sweep of the resampler family vs scipy: random
    (rank, out-rank, order, mode, prefilter, channel) configurations for
    map_coordinates, plus random affine forms — the fuzz-style safety net
    the deform API has via tools/tpu_parity.py --fuzz."""
    rng = np.random.default_rng(2024)
    for i in range(24):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(12, 40)) for _ in range(ndim))
        order = int(rng.integers(0, 6))
        mode = ALL_MODES[int(rng.integers(5))]
        prefilter = bool(rng.integers(2))
        out_rank = int(rng.integers(1, ndim + 2))
        out_shape = tuple(int(rng.integers(4, 20)) for _ in range(out_rank))
        chan = ndim >= 2 and out_rank == ndim and rng.random() < 0.3
        X = rng.random(((2, *shape) if chan else shape))
        kw = dict(order=order, mode=mode, cval=float(rng.uniform(-1, 1)),
                  prefilter=prefilter)
        if chan:
            kw["axis"] = tuple(range(1, ndim + 1))
        coords = _coords(rng, shape, out_shape, margin=4.0)
        got = np.asarray(ed.map_coordinates(X, coords, **kw))
        if chan:
            want = np.stack([map_coordinates_oracle(X[c], coords, **{
                k: v for k, v in kw.items() if k != "axis"})
                for c in range(2)])
        else:
            want = map_coordinates_oracle(X, coords, **kw)
        label = f"cfg{i}: {shape}->{out_shape} o{order} {mode} " \
                f"pf{int(prefilter)}{' ch' if chan else ''}"
        if order == 0:
            assert (np.abs(got - want) > 1e-6).mean() < 0.01, label
        else:
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8,
                                       err_msg=label)


def test_randomized_affine_vs_scipy():
    rng = np.random.default_rng(4096)
    for i in range(10):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(12, 36)) for _ in range(ndim))
        order = int(rng.integers(1, 6))
        mode = MODERN_MODES[int(rng.integers(3))]
        X = rng.random(shape)
        M = np.eye(ndim) + rng.standard_normal((ndim, ndim)) * 0.15
        off = rng.standard_normal(ndim) * 2
        out = tuple(int(rng.integers(8, 24)) for _ in range(ndim))
        got = np.asarray(ed.affine_transform(X, M, off, order=order,
                                             mode=mode, output_shape=out))
        want = scipy.ndimage.affine_transform(X, M, off, order=order,
                                              mode=mode, output_shape=out)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8,
                                   err_msg=f"affine cfg{i}")


@pytest.mark.parametrize("mode", MODERN_MODES)
def test_shift_matches_scipy(rng, mode):
    X = rng.random((26, 31))
    sh = rng.standard_normal(2) * 4
    got = np.asarray(ed.shift(X, sh, order=3, mode=mode, cval=0.25))
    want = scipy.ndimage.shift(X, sh, order=3, mode=mode, cval=0.25)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("factors", [2.0, 0.55, (1.4, 0.7)])
def test_zoom_matches_scipy(rng, factors):
    X = rng.random((23, 30))
    got = np.asarray(ed.zoom(X, factors, order=3, mode='mirror'))
    want = scipy.ndimage.zoom(X, factors, order=3, mode='mirror',
                              grid_mode=False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("angle", [30.0, -118.0, 90.0])
@pytest.mark.parametrize("reshape", [True, False])
def test_rotate_matches_scipy(rng, angle, reshape):
    X = rng.random((25, 33))
    got = np.asarray(ed.rotate(X, angle, reshape=reshape, order=3,
                               mode='mirror'))
    want = scipy.ndimage.rotate(X, angle, reshape=reshape, order=3,
                                mode='mirror')
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rotate_plane_of_3d(rng):
    """Rotation plane inside a 3-D volume; remaining axis carried along."""
    X = rng.random((4, 20, 24))
    got = np.asarray(ed.rotate(X, 40.0, axes=(1, 2), order=3,
                               mode='mirror'))
    want = scipy.ndimage.rotate(X, 40.0, axes=(1, 2), order=3,
                                mode='mirror')
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_shift_differentiable(rng):
    """Sub-voxel alignment: gradient w.r.t. the shift vector."""
    X = jnp.asarray(rng.random((18, 20)), jnp.float32)
    tgt = jnp.asarray(ed.shift(X, (1.25, -0.75), order=3, mode='mirror'))

    def loss(sh):
        return jnp.mean((ed.shift(X, sh, order=3, mode='mirror') - tgt)**2)

    g = jax.grad(loss)(jnp.zeros(2, jnp.float32))
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


def test_4d_rank(rng):
    """Rank-4 volumes route through whichever kernel the plan table
    offers (gather fallback where no window plan exists)."""
    X = rng.random((9, 10, 8, 11))
    coords = _coords(rng, X.shape, (5, 6, 4, 7), margin=2.0)
    got = np.asarray(ed.map_coordinates(X, coords, order=3, mode='mirror'))
    want = map_coordinates_oracle(X, coords, order=3, mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16])
def test_integer_prefilter_matches_scipy(rng, dtype):
    """Integer inputs with prefilter follow SCIPY semantics here (filter
    in float, round+clamp at the end) — the per-axis integer writeback is
    a deform_grid-only reference quirk."""
    info = np.iinfo(dtype)
    X = (rng.random((22, 26)) * min(info.max, 255)).astype(dtype)
    coords = _coords(rng, X.shape, (14, 15), margin=0.0)
    got = np.asarray(ed.map_coordinates(X, coords, order=3, mode='mirror',
                                        prefilter=True))
    assert got.dtype == dtype
    want = scipy.ndimage.map_coordinates(X, coords, order=3, mode='mirror',
                                         prefilter=True)
    # f32 device path vs f64 scipy: allow off-by-one at rounding boundaries
    assert (np.abs(got.astype(np.int64)
                   - want.astype(np.int64)) > 1).mean() == 0
    assert (got != want).mean() < 0.02


def test_native_host_map_coordinates(rng):
    """Three-way agreement on the general resampler: C++ host kernel vs
    the JAX path vs scipy (the native tier's oracle role)."""
    from elasticdeform_tpu import native
    if not native.available():
        pytest.skip("native host kernel unavailable")
    X = rng.random((24, 29, 14))
    coords = _coords(rng, X.shape, (12, 13, 8))
    for mode in ("mirror", "wrap", "constant"):
        a = native.map_coordinates(X, coords, order=3, mode=mode, cval=0.3)
        b = np.asarray(ed.map_coordinates(X, coords, order=3, mode=mode,
                                          cval=0.3))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)
    want = scipy.ndimage.map_coordinates(X, coords, order=3, mode='mirror')
    got = native.map_coordinates(X, coords, order=3, mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # channel axes
    Xc = rng.random((2, 20, 22))
    cc2 = _coords(rng, (20, 22), (11, 12))
    a = native.map_coordinates(Xc, cc2, order=3, mode='nearest',
                               axis=(1, 2))
    b = np.asarray(ed.map_coordinates(Xc, cc2, order=3, mode='nearest',
                                      axis=(1, 2)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_native_host_map_coordinates_gradient(rng):
    """Host adjoint satisfies the dot-product identity against the host
    forward, and matches the JAX backward-only adjoint."""
    from elasticdeform_tpu import native
    if not native.available():
        pytest.skip("native host kernel unavailable")
    X = rng.random((18, 21))
    coords = _coords(rng, X.shape, (12, 10))
    dy = rng.random((12, 10))
    y = native.map_coordinates(X, coords, order=3, mode='mirror')
    dx = native.map_coordinates_gradient(dy, coords, order=3,
                                         mode='mirror', X_shape=X.shape)
    lhs = float(np.vdot(dy, y))
    rhs = float(np.vdot(dx, X))
    assert abs(lhs - rhs) <= 1e-10 * max(1.0, abs(lhs))
    jx = np.asarray(ed.map_coordinates_gradient(dy, coords, order=3,
                                                mode='mirror',
                                                X_shape=X.shape))
    np.testing.assert_allclose(dx, jx, rtol=1e-5, atol=1e-8)


# ---------------------------------------------------------------------------
# geometric_transform (scipy.ndimage.geometric_transform equivalent)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("order", [0, 1, 3])
def test_geometric_transform_matches_scipy(rng, order):
    """The same elementwise mapping arithmetic, applied per voxel by scipy
    and to whole coordinate arrays here, must agree."""
    X = rng.random((21, 17))
    mapping = lambda c: (c[0] * 0.93 + 1.25, c[1] * 1.07 - 2.5)
    got = np.asarray(ed.geometric_transform(X, mapping, order=order,
                                            mode='mirror'))
    want = scipy.ndimage.geometric_transform(X, lambda c: mapping(c),
                                             order=order, mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_geometric_transform_output_shape_and_extra_args(rng):
    X = rng.random((15, 14, 6))
    mapping = lambda c, sy, sx: (c[0] * sy, c[1] * sx, c[2] + 0.5)
    got = np.asarray(ed.geometric_transform(
        X, mapping, output_shape=(8, 9, 6), order=3, mode='constant',
        cval=-1.0, extra_arguments=(1.3, 0.8)))
    want = scipy.ndimage.geometric_transform(
        X, mapping, output_shape=(8, 9, 6), order=3, mode='constant',
        cval=-1.0, extra_arguments=(1.3, 0.8))
    assert got.shape == (8, 9, 6)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_geometric_transform_nonlinear_mapping(rng):
    X = rng.random((25, 25))
    mapping = lambda c: (c[0] + 2.0 * np.sin(np.asarray(c[1]) * 0.3),
                         c[1] + 1.5 * np.cos(np.asarray(c[0]) * 0.2))

    def mapping_jnp(c):
        return (c[0] + 2.0 * jnp.sin(c[1] * 0.3),
                c[1] + 1.5 * jnp.cos(c[0] * 0.2))

    got = np.asarray(ed.geometric_transform(X, mapping_jnp, order=3,
                                            mode='mirror'))
    want = scipy.ndimage.geometric_transform(X, mapping, order=3,
                                             mode='mirror')
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_geometric_transform_numpy_api(rng):
    """The host-mapping numpy wrapper agrees with the traced core path."""
    from elasticdeform_tpu import api
    X = rng.random((14, 16))
    mapping = lambda c: (c[0] * 0.9 + 0.7, c[1] * 1.1 - 1.2)
    got = api.geometric_transform(X, mapping, order=3, mode='wrap')
    want = np.asarray(ed.geometric_transform(X, mapping, order=3,
                                             mode='wrap'))
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_geometric_transform_numpy_api_complex(rng):
    from elasticdeform_tpu import api
    X = (rng.random((12, 13)) + 1j * rng.random((12, 13)))
    mapping = lambda c: (c[0] * 0.9 + 0.7, c[1] * 1.1 - 1.2)
    got = api.geometric_transform(X, mapping, order=3, mode='constant',
                                  cval=1 - 2j)
    want = scipy.ndimage.geometric_transform(X, mapping, order=3,
                                             mode='constant', cval=1 - 2j)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_geometric_transform_differentiable(rng):
    """Gradients flow through X and through mapping parameters."""
    X = jnp.asarray(rng.random((12, 12)), jnp.float64)

    def loss(X, a):
        y = ed.geometric_transform(
            X, lambda c: (c[0] * a, c[1] + a), order=3, mode='mirror')
        return jnp.sum(y ** 2)

    g_x, g_a = jax.grad(loss, argnums=(0, 1))(X, jnp.float64(0.95))
    assert np.isfinite(np.asarray(g_x)).all()
    assert np.isfinite(float(g_a)) and abs(float(g_a)) > 0


# ---------------------------------------------------------------------------
# field calculus: compose / invert displacement fields
# ---------------------------------------------------------------------------

def _smooth_field(rng, shape, sigma=2.0):
    grid = rng.standard_normal((len(shape),) + (4,) * len(shape)) * sigma
    return ed.displacement_field(jnp.asarray(grid, jnp.float64), shape)


def _smooth_image(shape):
    mesh = np.meshgrid(*[np.linspace(-3, 3, n) for n in shape],
                       indexing='ij')
    out = np.zeros(shape)
    for k, m in enumerate(mesh):
        out = out + np.sin((k + 1) * m) + 0.3 * np.cos(2 * m)
    return jnp.asarray(out)


def test_compose_displacement_fields_matches_double_warp(rng):
    shape = (40, 44)
    u = _smooth_field(rng, shape, sigma=1.0)
    v = _smooth_field(rng, shape, sigma=1.0)
    X = _smooth_image(shape)
    w = ed.compose_displacement_fields(u, v, order=3, mode='mirror')
    once = np.asarray(ed.deform_field(X, w, order=3, mode='mirror'))
    twice = np.asarray(ed.deform_field(
        ed.deform_field(X, u, order=3, mode='mirror'), v, order=3,
        mode='mirror'))
    # the double warp interpolates the already-warped image, so the two
    # agree up to the image's interpolation error — tight only for a
    # smooth (band-limited) image, on the interior
    inner = (slice(8, -8),) * 2
    np.testing.assert_allclose(once[inner], twice[inner], atol=2e-3)


def test_invert_displacement_field_fixed_point(rng):
    shape = (48, 52)
    u = _smooth_field(rng, shape, sigma=2.0)
    v = ed.invert_displacement_field(u, iterations=60, order=1)
    w = ed.compose_displacement_fields(u, v, order=1)
    # convergence is geometric at the field's contraction rate
    # (max |grad u| ~ 0.5 here)
    assert float(jnp.abs(w).max()) < 1e-9


def test_invert_displacement_field_image_roundtrip(rng):
    shape = (48, 52)
    u = _smooth_field(rng, shape, sigma=1.5)
    v = ed.invert_displacement_field(u, iterations=30, order=3,
                                     mode='mirror')
    X = _smooth_image(shape)
    Y = ed.deform_field(X, u, order=3, mode='mirror')
    back = np.asarray(ed.deform_field(Y, v, order=3, mode='mirror'))
    inner = (slice(5, -5),) * 2
    np.testing.assert_allclose(back[inner], np.asarray(X)[inner],
                               atol=5e-3)


def test_invert_displacement_field_3d_jit(rng):
    shape = (16, 18, 20)
    u = _smooth_field(rng, shape, sigma=0.5)
    v = jax.jit(lambda f: ed.invert_displacement_field(
        f, iterations=40, order=1))(u)
    w = ed.compose_displacement_fields(u, v, order=1)
    assert float(jnp.abs(w).max()) < 1e-5
