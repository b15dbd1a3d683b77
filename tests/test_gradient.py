"""Gradient/adjoint tests.

Three oracle strategies (mirroring reference tests/test_deform_grid.py
:239-353, plus stronger adjoint identities the reference could not express):

1. adjoint dot-product identity ``<A x, gy> == <x, A^T gy>`` across the full
   parameter surface (exact, cheap),
2. finite-difference checking of ``deform_grid_gradient`` on small inputs
   (the reference's ``verify_grad`` recipe, :325-353),
3. consistency with JAX autodiff of the JAX-native forward.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

RNG = np.random.default_rng(99)


def adjoint_check(shape, points, sigma=3, **kwargs):
    """<deform(x) - deform(0), gy> == <x, deform_gradient(gy)>."""
    naxis = kwargs.pop("naxis", len(shape))
    displacement = RNG.standard_normal((naxis, *points)) * sigma
    X = RNG.random(shape)
    y = ed.deform_grid(X, displacement, **kwargs)
    y0 = ed.deform_grid(np.zeros_like(X), displacement, **kwargs)
    gy = RNG.random(y.shape)
    gkwargs = dict(kwargs)
    if gkwargs.get("crop") is not None:
        gkwargs["X_shape"] = shape
    gx = ed.deform_grid_gradient(gy, displacement, **gkwargs)
    assert gx.shape == X.shape
    np.testing.assert_allclose(np.vdot(y - y0, gy), np.vdot(X, gx),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("mode", ["nearest", "wrap", "reflect", "mirror",
                                  "constant"])
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_adjoint_2d(order, mode):
    adjoint_check((30, 25), (3, 5), order=order, mode=mode)


@pytest.mark.parametrize("order", [0, 1, 3])
def test_adjoint_3d(order):
    adjoint_check((15, 12, 10), (3, 3, 3), order=order)


@pytest.mark.parametrize("crop", [
    (slice(0, 10), slice(0, 10)),
    (slice(4, 12), slice(4, 12)),
    (slice(10, 20), slice(10, 20)),
])
def test_adjoint_crop(crop):
    adjoint_check((20, 20), (3, 3), crop=crop)


@pytest.mark.parametrize("zoom", [0.5, 1.0, 1.5])
def test_adjoint_zoom(zoom):
    adjoint_check((30, 25), (3, 5), zoom=zoom)


@pytest.mark.parametrize("rotate", [-20, 20])
def test_adjoint_rotate(rotate):
    adjoint_check((30, 25), (3, 5), rotate=rotate)


def test_adjoint_axis_channels():
    adjoint_check((20, 3, 25), (3, 3), axis=(0, 2), naxis=2)
    adjoint_check((3, 20, 25), (3, 3), axis=(1, 2), naxis=2)


def test_adjoint_prefilter_off():
    adjoint_check((30, 25), (3, 5), order=3, prefilter=False)


def verify_grad(X, fn, grad_fn, eps=1e-5, n_tests=2):
    """Finite-difference gradient check
    (reference tests/test_deform_grid.py:325-353, vectorized)."""
    output_shape = fn(X).shape
    for _ in range(n_tests):
        proj = RNG.random(output_shape) + 0.5

        def cost(x):
            return np.sum(fn(x) * proj)

        f0 = cost(X)
        gx_ref = np.zeros_like(X)
        flat = gx_ref.reshape(-1)
        Xc = X.copy()
        for i in range(X.size):
            Xc.reshape(-1)[:] = X.reshape(-1)
            Xc.reshape(-1)[i] += eps
            flat[i] = (cost(Xc) - f0) / eps
        gx = grad_fn(proj, X)
        np.testing.assert_allclose(gx_ref, gx, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["mirror", "constant", "wrap"])
@pytest.mark.parametrize("order", [0, 1, 3, 5])
def test_numeric_grad_2d(order, mode):
    X = RNG.random((9, 8))
    displacement = RNG.standard_normal((2, 3, 3)) * 2

    def fn(x):
        return ed.deform_grid(x, displacement, order=order, mode=mode)

    def grad_fn(gy, x):
        return ed.deform_grid_gradient(gy, displacement, order=order,
                                       mode=mode)

    verify_grad(X, fn, grad_fn)


def test_numeric_grad_crop():
    X = RNG.random((10, 10))
    displacement = RNG.standard_normal((2, 3, 3)) * 2
    crop = (slice(2, 8), slice(2, 8))

    def fn(x):
        return ed.deform_grid(x, displacement, crop=crop)

    def grad_fn(gy, x):
        return ed.deform_grid_gradient(gy, displacement, crop=crop,
                                       X_shape=X.shape)

    verify_grad(X, fn, grad_fn)


def test_grad_multi_mixed():
    # multi-input gradient with mixed order/mode/cval and crop
    # (reference tests/test_deform_grid.py:294-323)
    shape, points = (40, 35), (3, 3)
    displacement = RNG.standard_normal((2, *points)) * 25
    crop = (slice(10, 20), slice(10, 30))
    X = RNG.random(shape).astype('float64')
    Y = RNG.random(shape).astype('float32')
    Xd, Yd = ed.deform_grid([X, Y], displacement, order=[0, 3], crop=crop,
                            cval=[0.0, 1.0], mode=['constant', 'reflect'])
    dXd = RNG.random(Xd.shape).astype('float64')
    dYd = RNG.random(Yd.shape).astype('float32')
    ref_dX = ed.deform_grid_gradient(dXd, displacement, order=0, crop=crop,
                                     cval=0.0, mode='constant',
                                     X_shape=X.shape)
    ref_dY = ed.deform_grid_gradient(dYd, displacement, order=3, crop=crop,
                                     cval=1.0, mode='reflect',
                                     X_shape=Y.shape)
    dX, dY = ed.deform_grid_gradient([dXd, dYd], displacement, order=[0, 3],
                                     crop=crop, cval=[0.0, 1.0],
                                     mode=['constant', 'reflect'],
                                     X_shape=[X.shape, Y.shape])
    assert dX.dtype == np.float64 and dY.dtype == np.float32
    np.testing.assert_allclose(ref_dX, dX, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ref_dY, dY, rtol=1e-5, atol=1e-6)


def test_jax_autodiff_matches_gradient_api():
    # jax.vjp of the JAX-native forward == deform_grid_gradient
    X = jnp.asarray(RNG.random((20, 18)))
    displacement = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 5)

    def f(x):
        return ed.deform(x, displacement, order=3, mode='mirror')

    y, vjp = jax.vjp(f, X)
    gy = jnp.asarray(RNG.random(y.shape))
    (gx_ad,) = vjp(gy)
    gx_api = ed.deform_grid_gradient(np.asarray(gy), np.asarray(displacement),
                                     order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(gx_ad), gx_api,
                               rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_displacement_jvp_matches_fd(order):
    """Forward-mode displacement derivatives vs central finite
    differences, and forward/reverse cross-strategy consistency
    <J v, gy> == <v, J^T gy> where the jvp runs on the gather strategy
    (forward-mode capable) and the vjp on the default windows fast path
    (custom reverse rule, ops/windows.py) — proving the two strategies
    implement the same linearization at orders 2-5."""
    X = jnp.asarray(RNG.random((16, 14)))
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 3)
    v = jnp.asarray(RNG.standard_normal(d.shape))

    def f(dd):
        return ed.deform(X, dd, order=order, mode='mirror',
                         strategy='gather')

    ydot = jax.jvp(f, (d,), (v,))[1]
    eps = 1e-6
    fd = (f(d + eps * v) - f(d - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(ydot), np.asarray(fd),
                               rtol=1e-5, atol=1e-7)

    gy = jnp.asarray(RNG.random(ydot.shape))
    _, vjpf = jax.vjp(
        lambda dd: ed.deform(X, dd, order=order, mode='mirror'), d)
    (gd,) = vjpf(gy)
    np.testing.assert_allclose(float(jnp.vdot(ydot, gy)),
                               float(jnp.vdot(v, gd)),
                               rtol=1e-9, atol=1e-11)


def test_windows_strategy_jvp_raises_with_guidance():
    """The windows fast path cannot be forward-mode differentiated (its
    custom_vjp rule is reverse-only); the error JAX raises must exist so
    the core.deform docstring's 'use strategy=gather' guidance stays
    accurate."""
    X = jnp.asarray(RNG.random((12, 10)))
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 3)
    v = jnp.asarray(RNG.standard_normal(d.shape))
    with pytest.raises(TypeError, match="custom_vjp"):
        jax.jvp(lambda dd: ed.deform(X, dd, order=3, mode='mirror',
                                     strategy='windows'), (d,), (v,))


@pytest.mark.parametrize("order", [2, 3])
def test_displacement_hvp_matches_fd(order):
    """Hessian-vector products (grad-of-grad) w.r.t. the displacement grid
    through a nonlinear loss — exercises differentiating the d_cc backward
    branch itself."""
    X = jnp.asarray(RNG.random((14, 12)))
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 3)
    v = jnp.asarray(RNG.standard_normal(d.shape))

    def loss(dd):
        return jnp.sum(ed.deform(X, dd, order=order, mode='mirror') ** 2)

    g = jax.grad(loss)
    hvp = jax.jvp(g, (d,), (v,))[1]
    eps = 1e-6
    fd = (g(d + eps * v) - g(d - eps * v)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(hvp), np.asarray(fd),
                               rtol=1e-4, atol=1e-6)


def test_batched_displacement_grad_fd():
    """Per-sample displacement gradients through the native batched path
    (batch folded into the window-table rows), FD-checked entry-wise."""
    B = 3
    X = jnp.asarray(RNG.random((B, 10, 12)))
    D = jnp.asarray(RNG.standard_normal((B, 2, 3, 3)) * 3)

    def loss(dd):
        return jnp.sum(ed.deform_batch(X, dd, order=3, mode='mirror') ** 2)

    g = jax.grad(loss)(D)
    assert g.shape == D.shape and bool(jnp.any(g != 0))
    eps = 1e-6
    for idx in [(0, 0, 0, 0), (1, 1, 2, 1), (2, 0, 1, 2)]:
        fd = (loss(D.at[idx].add(eps)) - loss(D.at[idx].add(-eps))) \
            / (2 * eps)
        np.testing.assert_allclose(float(fd), float(g[idx]),
                                   rtol=1e-4, atol=1e-6)


def test_displacement_gradient_exists():
    # beyond reference parity: gradients w.r.t. the displacement grid
    X = jnp.asarray(RNG.random((20, 18)))
    displacement = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 5)

    def loss(d):
        return jnp.sum(ed.deform(X, d, order=3, mode='mirror') ** 2)

    g = jax.grad(loss)(displacement)
    assert g.shape == displacement.shape
    assert bool(jnp.any(g != 0))
    # finite-difference check on a few entries
    eps = 1e-6
    for idx in [(0, 0, 0), (1, 1, 2), (0, 2, 1)]:
        d2 = displacement.at[idx].add(eps)
        fd = (loss(d2) - loss(displacement)) / eps
        np.testing.assert_allclose(float(fd), float(g[idx]),
                                   rtol=1e-3, atol=1e-4)
