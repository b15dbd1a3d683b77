"""Tests for the field toolkit additions: exact multiresolution grid
refinement (refine_displacement_grid) and diffeomorphic velocity-field
integration (integrate_velocity_field, scaling-and-squaring).

Oracles: the refinement's contract is *exactness* — the refined grid must
reproduce the identical dense field / deformation at machine precision
(the coarse spline lies in the fine spline space and the mirror-boundary
prefilter is exact on it). The exponential is checked against a small-step
Euler integration of the same stationary flow, the group inverse property
exp(v) ∘ exp(-v) ≈ id, and the diffeomorphism guarantee (positive Jacobian
determinant where the raw field folds).
"""
import hashlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed


@pytest.fixture
def rng(request):
    seed = int(hashlib.sha256(request.node.nodeid.encode()).hexdigest()[:8],
               16)
    return np.random.default_rng(seed)


def _smooth_field(rng, shape, sigma=2.0, points=4):
    grid = rng.standard_normal((len(shape),) + (points,) * len(shape)) * sigma
    return ed.displacement_field(jnp.asarray(grid, jnp.float64), shape)


def _smooth_image(shape):
    mesh = np.meshgrid(*[np.linspace(-3, 3, n) for n in shape],
                       indexing='ij')
    out = np.zeros(shape)
    for k, m in enumerate(mesh):
        out = out + np.sin((k + 1) * m) + 0.3 * np.cos(2 * m)
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# refine_displacement_grid


@pytest.mark.parametrize("points,factor", [
    ((5, 7), 2),
    ((4, 4), 3),
    ((2, 3), 2),
    ((5, 7), (2, 3)),
    ((6, 5, 4), 2),
])
def test_refine_reproduces_field_exactly(rng, points, factor):
    naxis = len(points)
    d = jnp.asarray(rng.standard_normal((naxis,) + points) * 4.0)
    fine = ed.refine_displacement_grid(d, factor=factor)
    factors = factor if isinstance(factor, tuple) else (factor,) * naxis
    assert fine.shape == (naxis,) + tuple(
        f * (p - 1) + 1 for f, p in zip(factors, points))
    shape = tuple(11 * p + 3 for p in points)
    f0 = ed.displacement_field(d, shape)
    f1 = ed.displacement_field(fine, shape)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=0, atol=1e-11)


def test_refine_deform_identical(rng):
    shape = (37, 41)
    d = jnp.asarray(rng.standard_normal((2, 4, 5)) * 3.0)
    X = _smooth_image(shape)
    y0 = ed.deform(X, d, order=3, mode='mirror')
    y1 = ed.deform(X, ed.refine_displacement_grid(d), order=3,
                   mode='mirror')
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=1e-11)


def test_refine_factor_one_is_identity(rng):
    d = jnp.asarray(rng.standard_normal((2, 4, 5)) * 3.0)
    np.testing.assert_allclose(
        np.asarray(ed.refine_displacement_grid(d, factor=1)),
        np.asarray(d), rtol=0, atol=1e-12)


def test_refine_twice_matches_factor_four(rng):
    d = jnp.asarray(rng.standard_normal((2, 3, 4)) * 2.0)
    once = ed.refine_displacement_grid(
        ed.refine_displacement_grid(d, factor=2), factor=2)
    direct = ed.refine_displacement_grid(d, factor=4)
    np.testing.assert_allclose(np.asarray(once), np.asarray(direct),
                               rtol=0, atol=1e-11)


def test_refine_is_linear_and_differentiable(rng):
    d = jnp.asarray(rng.standard_normal((2, 4, 4)))
    e = jnp.asarray(rng.standard_normal((2, 4, 4)))
    a, b = 1.7, -0.3
    lin = ed.refine_displacement_grid(a * d + b * e)
    np.testing.assert_allclose(
        np.asarray(lin),
        np.asarray(a * ed.refine_displacement_grid(d)
                   + b * ed.refine_displacement_grid(e)),
        rtol=0, atol=1e-11)
    # gradient prolongation: adjoint identity <R d, y> == <d, R^T y>
    y = jnp.asarray(rng.standard_normal(lin.shape))
    f = lambda g: jnp.vdot(ed.refine_displacement_grid(g), y)
    g = jax.grad(f)(d)
    np.testing.assert_allclose(float(jnp.vdot(d, g)),
                               float(f(d)), rtol=1e-12)


def test_refine_coarse_to_fine_optimization_step(rng):
    """The multiresolution move: a fine grid seeded by exact refinement
    starts at the coarse optimum's loss, then improves on finer detail."""
    shape = (33, 33)
    target = _smooth_field(rng, shape, sigma=2.0, points=7)

    def loss_of(grid):
        return jnp.mean((ed.displacement_field(grid, shape) - target) ** 2)

    grad_fn = jax.jit(jax.grad(loss_of))
    coarse = jnp.zeros((2, 4, 4))
    for _ in range(80):
        coarse = coarse - 2.0 * grad_fn(coarse)
    fine = ed.refine_displacement_grid(coarse, factor=2)
    l_coarse = float(loss_of(coarse))
    l_fine0 = float(loss_of(fine))
    np.testing.assert_allclose(l_fine0, l_coarse, rtol=1e-9)
    for _ in range(80):
        fine = fine - 2.0 * grad_fn(fine)
    assert float(loss_of(fine)) < 0.2 * l_coarse


def test_refine_vmap_batches(rng):
    d = jnp.asarray(rng.standard_normal((3, 2, 4, 5)))
    batched = jax.vmap(ed.refine_displacement_grid)(d)
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(batched[b]),
            np.asarray(ed.refine_displacement_grid(d[b])),
            rtol=0, atol=1e-11)


def test_refine_validation():
    with pytest.raises(ValueError, match="naxis"):
        ed.refine_displacement_grid(jnp.zeros((3, 4, 5)))
    with pytest.raises(ValueError, match="factor"):
        ed.refine_displacement_grid(jnp.zeros((2, 4, 5)), factor=(2,))
    with pytest.raises(ValueError, match=">= 1"):
        ed.refine_displacement_grid(jnp.zeros((2, 4, 5)), factor=0)
    with pytest.raises(ValueError, match=">= 2 points"):
        ed.refine_displacement_grid(jnp.zeros((2, 1, 5)))


# ---------------------------------------------------------------------------
# integrate_velocity_field


def test_exp_matches_euler_integration(rng):
    """Scaling-and-squaring vs many-step Euler of dx/dt = v(x)."""
    shape = (40, 44)
    v = _smooth_field(rng, shape, sigma=3.0)
    u_ss = ed.integrate_velocity_field(v, steps=8, order=3, mode='mirror')
    u = jnp.zeros_like(v)
    N = 256
    for _ in range(N):
        u = ed.compose_displacement_fields(v / N, u, order=3, mode='mirror')
    inner = (slice(None), slice(8, -8), slice(8, -8))
    np.testing.assert_allclose(np.asarray(u_ss)[inner],
                               np.asarray(u)[inner], atol=5e-3)


def test_exp_zero_steps_is_identity_scaling(rng):
    v = _smooth_field(rng, (20, 22), sigma=1.0)
    np.testing.assert_allclose(
        np.asarray(ed.integrate_velocity_field(v, steps=0)),
        np.asarray(v), rtol=0, atol=1e-12)


def test_exp_inverse_property(rng):
    shape = (48, 52)
    v = _smooth_field(rng, shape, sigma=2.5)
    fwd = ed.integrate_velocity_field(v, steps=8, order=3, mode='mirror')
    bwd = ed.integrate_velocity_field(-v, steps=8, order=3, mode='mirror')
    w = ed.compose_displacement_fields(fwd, bwd, order=3, mode='mirror')
    inner = (slice(None), slice(8, -8), slice(8, -8))
    # residual is squaring-compounded interpolation error; the bound is
    # relative to a deformation of several voxels
    assert float(jnp.abs(fwd).max()) > 1.0   # a real deformation
    assert float(jnp.abs(w[inner]).max()) < 2e-2


def test_exp_is_diffeomorphic_where_raw_field_folds(rng):
    shape = (48, 52)
    v = _smooth_field(rng, shape, sigma=14.0)
    det_raw = ed.jacobian_determinant_field(v)
    assert float(det_raw.min()) < 0.0        # raw warp folds
    u = ed.integrate_velocity_field(v, steps=8, order=3, mode='mirror')
    det_exp = ed.jacobian_determinant_field(u)
    assert float(det_exp[8:-8, 8:-8].min()) > 0.0


def test_exp_image_roundtrip(rng):
    shape = (48, 52)
    v = _smooth_field(rng, shape, sigma=2.0)
    X = _smooth_image(shape)
    fwd = ed.integrate_velocity_field(v, steps=7, order=3, mode='mirror')
    bwd = ed.integrate_velocity_field(-v, steps=7, order=3, mode='mirror')
    Y = ed.deform_field(X, fwd, order=3, mode='mirror')
    back = np.asarray(ed.deform_field(Y, bwd, order=3, mode='mirror'))
    inner = (slice(6, -6),) * 2
    np.testing.assert_allclose(back[inner], np.asarray(X)[inner],
                               atol=5e-3)


def test_exp_jit_vmap_grad(rng):
    shape = (16, 18, 20)
    vs = jnp.stack([_smooth_field(rng, shape, sigma=0.8)
                    for _ in range(2)])
    f = jax.jit(jax.vmap(lambda v: ed.integrate_velocity_field(
        v, steps=5, order=1)))
    us = f(vs)
    assert us.shape == vs.shape
    np.testing.assert_allclose(
        np.asarray(us[0]),
        np.asarray(ed.integrate_velocity_field(vs[0], steps=5, order=1)),
        rtol=0, atol=1e-10)
    # differentiable; gradient matches finite differences on a projection
    proj = jnp.asarray(np.random.default_rng(0).standard_normal(vs[0].shape))
    loss = lambda v: jnp.vdot(
        ed.integrate_velocity_field(v, steps=4, order=1), proj)
    g = jax.grad(loss)(vs[0])
    t = jnp.asarray(np.random.default_rng(1).standard_normal(vs[0].shape))
    eps = 1e-5
    fd = (loss(vs[0] + eps * t) - loss(vs[0] - eps * t)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, t)), float(fd),
                               rtol=1e-5, atol=1e-7)


def test_exp_validation():
    with pytest.raises(ValueError, match="naxis"):
        ed.integrate_velocity_field(jnp.zeros((3, 4, 5)))
    with pytest.raises(ValueError, match="steps"):
        ed.integrate_velocity_field(jnp.zeros((2, 4, 5)), steps=-1)


# ---------------------------------------------------------------------------
# deform_random_diffeo


def test_random_diffeo_matches_manual_pipeline(rng):
    # same key => same grid => result equals the explicit composition
    key = jax.random.PRNGKey(7)
    X = _smooth_image((30, 34))
    got = ed.deform_random_diffeo(key, X, sigma=6.0, points=4, steps=6,
                                  order=3, mode='mirror')
    grid = ed.random_displacement(key, (4, 4), 6.0, dtype=jnp.float64)
    v = ed.displacement_field(grid, (30, 34))
    u = ed.integrate_velocity_field(v, steps=6, order=1, mode='nearest')
    want = ed.deform_field(X, u, order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_random_diffeo_never_folds_where_raw_would(rng):
    # sigma large enough that deform_random's raw warp folds; the diffeo
    # variant's warp must keep positive Jacobian determinant
    key = jax.random.PRNGKey(3)
    shape = (48, 52)
    grid = ed.random_displacement(key, (4, 4), 14.0, dtype=jnp.float64)
    v = ed.displacement_field(grid, shape)
    assert float(ed.jacobian_determinant_field(v).min()) < 0.0
    u = ed.integrate_velocity_field(v, steps=7, order=1, mode='nearest')
    det = ed.jacobian_determinant_field(u)
    assert float(det[8:-8, 8:-8].min()) > 0.0


def test_random_diffeo_multi_input_and_per_input_params(rng):
    key = jax.random.PRNGKey(11)
    X = np.asarray(_smooth_image((20, 22)))
    labels = (rng.random((20, 22)) * 5).astype(np.int32)
    out = ed.deform_random_diffeo(key, [jnp.asarray(X), jnp.asarray(labels)],
                                  sigma=3.0, points=3,
                                  order=[3, 0], mode=['mirror', 'nearest'])
    assert isinstance(out, list) and len(out) == 2
    assert out[1].dtype == jnp.int32
    # label image keeps its value set (order 0 = nearest lookup)
    assert set(np.unique(np.asarray(out[1]))) <= set(np.unique(labels))
    # matches deforming each input separately with the shared warp
    solo = ed.deform_random_diffeo(key, jnp.asarray(X), sigma=3.0, points=3,
                                   order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(solo),
                               rtol=1e-6, atol=1e-6)


def test_random_diffeo_inverse_key_roundtrip(rng):
    # exp(-v) undoes exp(v): recompute the grid from the key and map back
    key = jax.random.PRNGKey(21)
    shape = (40, 44)
    X = _smooth_image(shape)
    Y = ed.deform_random_diffeo(key, X, sigma=1.5, points=4, steps=7,
                                integration_order=3,
                                integration_mode='mirror',
                                order=3, mode='mirror')
    grid = ed.random_displacement(key, (4, 4), 1.5, dtype=jnp.float64)
    v = ed.displacement_field(grid, shape)
    bwd = ed.integrate_velocity_field(-v, steps=7, order=3, mode='mirror')
    back = np.asarray(ed.deform_field(Y, bwd, order=3, mode='mirror'))
    inner = (slice(6, -6),) * 2
    np.testing.assert_allclose(back[inner], np.asarray(X)[inner], atol=5e-3)


def test_random_diffeo_jit_vmap_over_keys(rng):
    X = _smooth_image((18, 20))
    f = jax.jit(lambda k: ed.deform_random_diffeo(k, X, sigma=2.5, points=3,
                                                  steps=5, mode='mirror'))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    batched = jax.vmap(f)(keys)
    single = f(keys[1])
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               rtol=1e-5, atol=1e-5)
    # different keys give different warps
    assert not np.allclose(np.asarray(batched[0]), np.asarray(batched[2]))
