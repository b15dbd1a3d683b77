"""Spatially-sharded single-volume deformation (halo exchange) tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import elasticdeform_tpu as ed
from elasticdeform_tpu.parallel import sharded_deform_spatial

RNG = np.random.default_rng(555)


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")
    return Mesh(np.asarray(jax.devices()[:n]), ("shard",))


@pytest.mark.parametrize("nshards", [2, 4])
@pytest.mark.parametrize("order", [1, 3])
def test_matches_single_device_mirror(nshards, order):
    mesh = _mesh(nshards)
    X = RNG.random((128, 16, 14))
    d = RNG.standard_normal((3, 3, 3, 3)) * 4
    ref = ed.deform_grid(X, d, order=order, mode='mirror')
    out = sharded_deform_spatial(mesh, X, d, max_displacement=8,
                                 order=order, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_matches_single_device_constant():
    mesh = _mesh(4)
    X = RNG.random((128, 16, 14))
    d = RNG.standard_normal((3, 3, 3, 3)) * 4
    ref = ed.deform_grid(X, d, order=3, mode='constant', cval=2.5)
    out = sharded_deform_spatial(mesh, X, d, max_displacement=8,
                                 order=3, mode='constant', cval=2.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_2d_spatial():
    mesh = _mesh(2)
    X = RNG.random((120, 40))
    d = RNG.standard_normal((2, 3, 3)) * 5
    ref = ed.deform_grid(X, d, order=3, mode='mirror')
    out = sharded_deform_spatial(mesh, X, d, max_displacement=15,
                                 order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-7)


def test_unsupported_mode_raises():
    mesh = _mesh(2)
    X = RNG.random((40, 10))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(NotImplementedError):
        sharded_deform_spatial(mesh, X, d, max_displacement=5, mode='wrap')


def test_halo_too_large_raises():
    mesh = _mesh(8)
    X = RNG.random((64, 10))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(AssertionError, match="halo"):
        sharded_deform_spatial(mesh, X, d, max_displacement=50)


def test_differentiable():
    mesh = _mesh(2)
    X = jnp.asarray(RNG.random((80, 12)))
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 3)

    def loss(x):
        y = sharded_deform_spatial(mesh, x, d, max_displacement=8,
                                   order=3, mode='mirror')
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(X)
    ref = jax.grad(lambda x: jnp.sum(
        ed.deform(x, d, order=3, mode='mirror') ** 2))(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
