"""Spatially-sharded single-volume deformation (halo exchange) tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import elasticdeform_tpu as ed

# every test here jit-compiles shard_map programs over an 8-device mesh —
# the compile time dominates the suite; quick tier skips them
pytestmark = pytest.mark.slow
from elasticdeform_tpu.parallel import (
    sharded_deform_spatial, sharded_deform_field_spatial,
    sharded_deform_field_batched_spatial, validate_max_displacement,
)

# Each test gets its OWN deterministic RNG (seeded from the test id), so
# test data is independent of which tests run and in what order — a shared
# module-level stream made failures appear/disappear with -k selections.
@pytest.fixture
def rng(request):
    import hashlib
    seed = int(hashlib.sha256(request.node.nodeid.encode()).hexdigest()[:8],
               16)
    return np.random.default_rng(seed)


ALL_MODES = ("nearest", "wrap", "reflect", "mirror", "constant")


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.asarray(jax.devices()[:n]), ("shard",))


@pytest.mark.parametrize("nshards", [2, 4])
@pytest.mark.parametrize("mode", ALL_MODES)
def test_matches_single_device_all_modes(nshards, mode, rng):
    mesh = _mesh(nshards)
    X = rng.random((128, 16, 14))
    d = rng.standard_normal((3, 3, 3, 3)) * 4
    ref = ed.deform_grid(X, d, order=3, mode=mode, cval=2.5)
    out = sharded_deform_spatial(mesh, X, d, max_displacement=8,
                                 order=3, mode=mode, cval=2.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("order", [1, 3, 4, 5])
@pytest.mark.parametrize("mode", ["mirror", "wrap"])
def test_matches_single_device_orders(order, mode, rng):
    # orders 4-5 need the larger per-order prefilter halo
    mesh = _mesh(2)
    X = rng.random((96, 14, 12))
    d = rng.standard_normal((3, 3, 3, 3)) * 3
    ref = ed.deform_grid(X, d, order=order, mode=mode)
    out = sharded_deform_spatial(mesh, X, d, max_displacement=7,
                                 order=order, mode=mode)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_wrap_edge_folding(rng):
    # large displacement so edge voxels genuinely fold across the volume
    mesh = _mesh(2)
    X = rng.random((128, 12))
    # margin: the cubic prefilter overshoots control values by up to ~13.5%
    # (15 * 1.135 = 17.0), so declare 18
    d = np.clip(rng.standard_normal((2, 5, 3)) * 8, -15, 15)
    ref = ed.deform_grid(X, d, order=3, mode='wrap')
    out = sharded_deform_spatial(mesh, X, d, max_displacement=18,
                                 order=3, mode='wrap')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_multi_input(rng):
    mesh = _mesh(2)
    X = rng.random((96, 14))
    Y = (rng.random((96, 14)) * 100).astype(np.float32)
    d = rng.standard_normal((2, 3, 3)) * 4
    ref_X = ed.deform_grid(X, d, order=3, mode='mirror')
    ref_Y = ed.deform_grid(Y, d, order=3, mode='mirror')
    out_X, out_Y = sharded_deform_spatial(mesh, [X, Y], d,
                                          max_displacement=8, order=3,
                                          mode='mirror')
    assert out_Y.dtype == np.float32
    np.testing.assert_allclose(np.asarray(out_X), ref_X,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_Y), ref_Y,
                               rtol=1e-4, atol=1e-4)


def test_2d_spatial(rng):
    mesh = _mesh(2)
    X = rng.random((120, 40))
    d = rng.standard_normal((2, 3, 3)) * 5
    ref = ed.deform_grid(X, d, order=3, mode='mirror')
    out = sharded_deform_spatial(mesh, X, d, max_displacement=15,
                                 order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_validate_passes_and_detects(rng):
    mesh = _mesh(2)
    X = rng.random((96, 12))
    d = rng.standard_normal((2, 3, 3)) * 5
    # generous bound: validation passes and the result is correct
    out = sharded_deform_spatial(mesh, X, d, max_displacement=20,
                                 order=3, mode='mirror', validate=True)
    ref = ed.deform_grid(X, d, order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)
    # too-tight bound: the violation is detected instead of silent clamping
    big = np.zeros((2, 3, 3))
    big[0, 1, 1] = 30.0
    with pytest.raises(ValueError, match="max_displacement"):
        sharded_deform_spatial(mesh, X, big, max_displacement=10,
                               order=3, mode='mirror', validate=True)
    with pytest.raises(ValueError, match="max_displacement"):
        validate_max_displacement(big, 10, X.shape)


def test_halo_too_large_raises(rng):
    mesh = _mesh(8)
    X = rng.random((64, 10))
    d = rng.standard_normal((2, 3, 3))
    with pytest.raises(AssertionError, match="halo"):
        sharded_deform_spatial(mesh, X, d, max_displacement=50)


def test_differentiable(rng):
    mesh = _mesh(2)
    X = jnp.asarray(rng.random((80, 12)))
    d = jnp.asarray(rng.standard_normal((2, 3, 3)) * 3)

    def loss(x):
        y = sharded_deform_spatial(mesh, x, d, max_displacement=8,
                                   order=3, mode='mirror')
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(X)
    ref = jax.grad(lambda x: jnp.sum(
        ed.deform(x, d, order=3, mode='mirror') ** 2))(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_batched_spatial_hybrid(rng):
    """2-D mesh: data-parallel batch x spatially-sharded volume, with
    per-sample displacement grids — matches the batch-parallel path."""
    from elasticdeform_tpu.parallel import (
        batched_deform, sharded_deform_batched_spatial,
    )
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("batch", "shard"))
    B = 8
    X = rng.random((B, 64, 10, 12))
    D = rng.standard_normal((B, 3, 3, 3, 3)) * 3
    ref = batched_deform(X, D, order=3, mode='mirror')
    out = sharded_deform_batched_spatial(mesh, X, D, max_displacement=8,
                                         order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_batched_spatial_hybrid_wrap_multi(rng):
    from elasticdeform_tpu.parallel import (
        batched_deform, sharded_deform_batched_spatial,
    )
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("batch", "shard"))
    B = 4
    X = rng.random((B, 64, 10))
    Y = rng.random((B, 64, 10)).astype(np.float32)
    # prefilter overshoot margin: 8 * 1.135 = 9.1, declare 10 (the halo
    # for max_displacement 11 + order-3 prefilter would no longer fit the
    # 32-voxel shards of this 2x2 mesh)
    D = np.clip(rng.standard_normal((B, 2, 3, 3)) * 5, -8, 8)
    ref_X = batched_deform(X, D, order=3, mode='wrap')
    ref_Y = batched_deform(Y, D, order=3, mode='wrap')
    out_X, out_Y = sharded_deform_batched_spatial(
        mesh, [X, Y], D, max_displacement=10, order=3, mode='wrap',
        validate=True)
    np.testing.assert_allclose(np.asarray(out_X), np.asarray(ref_X),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_Y), np.asarray(ref_Y),
                               rtol=1e-4, atol=1e-4)


def test_batched_spatial_hybrid_gradient(rng):
    from elasticdeform_tpu.parallel import (
        batched_deform, sharded_deform_batched_spatial,
    )
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("batch", "shard"))
    B = 2
    X = jnp.asarray(rng.random((B, 96, 8)))
    D = jnp.asarray(rng.standard_normal((B, 2, 3, 3)) * 2)

    def loss(x):
        y = sharded_deform_batched_spatial(mesh, x, D, max_displacement=6,
                                           order=3, mode='mirror')
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(X)
    ref = jax.grad(lambda x: jnp.sum(
        batched_deform(x, D, order=3, mode='mirror') ** 2))(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_spatial_nd_2axis(mode, rng):
    """Volume sharded along TWO axes over a 2-D mesh (corner halos via
    sequential per-axis exchanges) vs the single-device path."""
    from elasticdeform_tpu.parallel import sharded_deform_spatial_nd
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("shard0", "shard1"))
    X = rng.random((64, 64, 10))
    d = rng.standard_normal((3, 3, 3, 3)) * 4
    ref = ed.deform_grid(X, d, order=3, mode=mode, cval=1.5)
    out = sharded_deform_spatial_nd(mesh, X, d, max_displacement=8,
                                    order=3, mode=mode, cval=1.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_spatial_nd_gradient_multi(rng):
    from elasticdeform_tpu.parallel import sharded_deform_spatial_nd
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("shard0", "shard1"))
    X = jnp.asarray(rng.random((64, 64)))
    d = jnp.asarray(rng.standard_normal((2, 3, 3)) * 2)

    def loss(x):
        y = sharded_deform_spatial_nd(mesh, x, d, max_displacement=4,
                                      order=3, mode='mirror')
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(X)
    ref = jax.grad(lambda x: jnp.sum(
        ed.deform(x, d, order=3, mode='mirror') ** 2))(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_spatial_nd_wrap_corner_folding(rng):
    """Multi-axis wrap with displacements large enough that edge voxels
    fold across the volume on one axis and on BOTH axes (corner seam
    blocks arriving by two-hop relay)."""
    from elasticdeform_tpu.parallel import sharded_deform_spatial_nd
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("shard0", "shard1"))
    X = rng.random((64, 64, 10))
    # bias the grid so corner voxels genuinely fold on both axes at once
    # prefilter overshoot margin: 8 * 1.135 = 9.1 < 10 declared
    d = np.clip(rng.standard_normal((3, 3, 3, 3)) * 5, -8, 8)
    d[0, 0, 0] = -8.0
    d[1, 0, 0] = -8.0
    d[0, -1, -1] = 8.0
    d[1, -1, -1] = 8.0
    ref = ed.deform_grid(X, d, order=3, mode='wrap')
    out = sharded_deform_spatial_nd(mesh, X, d, max_displacement=10,
                                    order=3, mode='wrap')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("nshards", [2, 4])
@pytest.mark.parametrize("mode", ["mirror", "constant"])
def test_spatial_crop(nshards, mode, rng):
    """Cropped sharded deformation (replicated-window path) vs the
    single-device crop (reference crop geometry, deform_grid.py:328-354)."""
    mesh = _mesh(nshards)
    X = rng.random((128, 16, 14))
    d = rng.standard_normal((3, 3, 3, 3)) * 4
    crop = [slice(40, 72), slice(2, 10), slice(None)]
    ref = ed.deform_grid(X, d, order=3, mode=mode, cval=1.5, crop=crop)
    out = sharded_deform_spatial(mesh, X, d, max_displacement=8,
                                 order=3, mode=mode, cval=1.5, crop=crop)
    assert out.shape == (32, 8, 14)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_spatial_crop_edge_and_multi(rng):
    """Crop touching the volume edge (true mirror folding inside the
    window) + multi-input, 2-D."""
    mesh = _mesh(2)
    X = rng.random((96, 20))
    Y = (rng.random((96, 20)) * 50).astype(np.float32)
    d = rng.standard_normal((2, 3, 3)) * 6
    crop = [slice(0, 32), slice(4, 16)]
    ref_X = ed.deform_grid(X, d, order=3, mode='mirror', crop=crop)
    ref_Y = ed.deform_grid(Y, d, order=3, mode='mirror', crop=crop)
    out_X, out_Y = sharded_deform_spatial(
        mesh, [X, Y], d, max_displacement=12, order=3, mode='mirror',
        crop=crop)
    assert out_Y.dtype == np.float32
    np.testing.assert_allclose(np.asarray(out_X), ref_X,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_Y), ref_Y,
                               rtol=1e-4, atol=1e-4)


def test_spatial_crop_gradient(rng):
    mesh = _mesh(2)
    X = jnp.asarray(rng.random((64, 12)))
    d = jnp.asarray(rng.standard_normal((2, 3, 3)) * 3)
    crop = [slice(16, 48), slice(2, 10)]

    def loss(x):
        y = sharded_deform_spatial(mesh, x, d, max_displacement=8,
                                   order=3, mode='mirror', crop=crop)
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(X)
    ref = jax.grad(lambda x: jnp.sum(
        ed.deform(x, d, order=3, mode='mirror', crop=crop) ** 2))(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_spatial_crop_wrap_raises(rng):
    mesh = _mesh(2)
    X = rng.random((64, 12))
    d = rng.standard_normal((2, 3, 3))
    with pytest.raises(NotImplementedError, match="wrap"):
        sharded_deform_spatial(mesh, X, d, max_displacement=8, mode='wrap',
                               crop=[slice(0, 32), slice(None)])


def test_batched_spatial_nd(rng):
    """3-D mesh: data-parallel batch x TWO spatially-sharded axes."""
    from elasticdeform_tpu.parallel import (
        batched_deform, sharded_deform_batched_spatial_nd,
    )
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("batch", "shard0", "shard1"))
    B = 2
    X = rng.random((B, 64, 64, 10))
    D = rng.standard_normal((B, 3, 3, 3, 3)) * 3
    ref = batched_deform(X, D, order=3, mode='mirror')
    out = sharded_deform_batched_spatial_nd(mesh, X, D, max_displacement=8,
                                            order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_batched_spatial_nd_wrap(rng):
    from elasticdeform_tpu.parallel import (
        batched_deform, sharded_deform_batched_spatial_nd,
    )
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("batch", "shard0", "shard1"))
    B = 2
    X = rng.random((B, 64, 64))
    D = np.clip(rng.standard_normal((B, 2, 3, 3)) * 4, -6, 6)
    ref = batched_deform(X, D, order=3, mode='wrap')
    out = sharded_deform_batched_spatial_nd(mesh, X, D, max_displacement=8,
                                            order=3, mode='wrap',
                                            validate=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_spatial_scan_prefilter_gate(rng, monkeypatch):
    """With the scan-prefilter gate lowered so the per-shard padded axis
    runs the associative-scan filter (+ concat pad) instead of the fused
    filter-matrix selection, the sharded result must still match the
    single-device forward."""
    mesh = _mesh(2)
    X = rng.random((64, 12)).astype(np.float32)
    d = np.clip(rng.standard_normal((2, 3, 3)) * 4, -7, 7)
    want = np.asarray(ed.deform(X, d, order=3, mode='mirror'))
    monkeypatch.setenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "32")
    jax.clear_caches()
    try:
        out = sharded_deform_spatial(mesh, X, d, max_displacement=9,
                                     order=3, mode='mirror')
        np.testing.assert_allclose(np.asarray(out), want,
                                   rtol=1e-5, atol=1e-5)
    finally:
        jax.clear_caches()


def test_sharded_field_matches_single_device(rng):
    """Dense-field warp on a sharded volume == deform_field single-device."""
    mesh = _mesh(4)
    S = (112, 20, 12)
    x = rng.random(S).astype(np.float32)
    d = (rng.standard_normal((3, 3, 3, 3)) * 3).astype(np.float32)
    field = np.array(ed.displacement_field(jnp.asarray(d), S),
                     np.float32)
    field[0] = np.clip(field[0], -3.5, 3.5)
    got = np.asarray(sharded_deform_field_spatial(
        mesh, jnp.asarray(x), jnp.asarray(field), max_displacement=4,
        order=3, mode='mirror', validate=True))
    want = np.asarray(ed.deform_field(jnp.asarray(x), jnp.asarray(field),
                                      order=3, mode='mirror'))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ALL_MODES)
def test_sharded_field_all_modes(rng, mode):
    mesh = _mesh(4)
    S = (48, 16)
    x = rng.random(S).astype(np.float32)
    field = np.clip(rng.standard_normal((2, *S)) * 2.5,
                    -2.9, 2.9).astype(np.float32)
    got = np.asarray(sharded_deform_field_spatial(
        mesh, jnp.asarray(x), jnp.asarray(field), max_displacement=3,
        order=3, mode=mode, cval=0.5, prefilter=False))
    want = np.asarray(ed.deform_field(jnp.asarray(x), jnp.asarray(field),
                                      order=3, mode=mode, cval=0.5,
                                      prefilter=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_field_batched_hybrid(rng):
    """(B over batch axis) x (volume over shard axis), per-sample fields."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("batch", "shard"))
    B, S = 4, (48, 14)
    x = rng.random((B, *S)).astype(np.float32)
    field = np.clip(rng.standard_normal((B, 2, *S)) * 2,
                    -2.9, 2.9).astype(np.float32)
    got = np.asarray(sharded_deform_field_batched_spatial(
        mesh, jnp.asarray(x), jnp.asarray(field), max_displacement=3,
        order=3, mode='nearest', prefilter=False))
    for b in range(B):
        want = np.asarray(ed.deform_field(jnp.asarray(x[b]),
                                          jnp.asarray(field[b]),
                                          order=3, mode='nearest',
                                          prefilter=False))
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_sharded_field_validate_raises(rng):
    mesh = _mesh(4)
    S = (48, 16)
    x = rng.random(S).astype(np.float32)
    field = np.zeros((2, *S), np.float32)
    field[0, 5, 5] = 9.0
    with pytest.raises(ValueError, match="max_displacement"):
        sharded_deform_field_spatial(mesh, jnp.asarray(x),
                                     jnp.asarray(field),
                                     max_displacement=3, prefilter=False,
                                     validate=True)


def test_sharded_field_wrap_with_prefilter(rng):
    """wrap seams + per-order prefilter halo together on the field path
    (the all-modes test runs prefilter=False; this pins the combination)."""
    mesh = _mesh(4)
    S = (112, 12)
    x = rng.random(S).astype(np.float32)
    field = np.clip(rng.standard_normal((2, *S)) * 2.5,
                    -2.9, 2.9).astype(np.float32)
    got = np.asarray(sharded_deform_field_spatial(
        mesh, jnp.asarray(x), jnp.asarray(field), max_displacement=3,
        order=3, mode='wrap', prefilter=True))
    want = np.asarray(ed.deform_field(jnp.asarray(x), jnp.asarray(field),
                                      order=3, mode='wrap',
                                      prefilter=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
