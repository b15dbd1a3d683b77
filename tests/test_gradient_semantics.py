"""Gradient semantics of the scipy.ndimage parity tier (VERDICT r4
task 5).

Three contracts, each matching what the op can honestly promise:

1. **Linear ops** (correlate/convolve 1-D and N-D, uniform, the
   Gaussian family, sobel/prewitt/laplace, fourier_*): autodiff gives
   the *exact adjoint*. Tested as the adjoint identity
   ``<A x, y> == <x, A^T y>`` in float64 via ``jax.linear_transpose``.
2. **Selection ops** (min/max/rank/median/percentile filters, grey
   morphology): piecewise-linear; at inputs with unique window argmin
   (random continuous input — ties have measure zero) the gradient is
   the exact one-hot selection indicator, so a finite-difference
   directional derivative matches ``<grad, v>`` exactly to fp noise.
   Additionally the gradient of ``sum(out)`` is a nonnegative integer
   selection-count field summing to ``out.size``.
3. **Piecewise-constant ops** (boolean morphology, EDT, label): the
   output is constant under any infinitesimal input perturbation (the
   ``!= 0`` threshold kills every derivative path), so the honest
   gradient is *identically zero* — which is exactly what JAX returns.
   Tested: they trace under jit and the gradient through them is
   exactly zero (never NaN, never silently nonzero garbage); the docs
   say so (docs/source/migration.rst, "Differentiability").

The deform tier's gradients are covered by tests/test_gradient.py; the
reference only ever differentiates the deform op
(/root/reference/deform_grid.py:182-291) — this tier is beyond-reference
surface, so the contract here is defined by this library's own docs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

import elasticdeform_tpu as ed


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _adjoint_identity(f, x_shape, y_from, rng, tol=1e-12):
    """<f(x), y> == <x, f^T(y)> with f^T from jax.linear_transpose."""
    x = jnp.asarray(rng.standard_normal(x_shape))
    fx = f(x)
    y = jnp.asarray(y_from(rng, np.asarray(fx).shape))
    ft = jax.linear_transpose(f, x)
    (xt,) = ft(y)
    lhs = float(jnp.vdot(fx, y))
    rhs = float(jnp.vdot(x, xt))
    assert abs(lhs - rhs) <= tol * max(1.0, abs(lhs)), (lhs, rhs)


def _real_y(rng, shape):
    return rng.standard_normal(shape)


LINEAR_OPS = [
    ("correlate_3d", lambda w: lambda x: ed.correlate(
        x, w, mode="reflect"), (9, 10, 11), (3, 3, 3)),
    ("correlate_3d_nearest", lambda w: lambda x: ed.correlate(
        x, w, mode="nearest", origin=(1, 0, -1)), (9, 10, 11), (3, 3, 3)),
    ("convolve_3d_wrap", lambda w: lambda x: ed.convolve(
        x, w, mode="wrap"), (8, 9, 10), (4, 3, 2)),
    ("convolve_2d_constant", lambda w: lambda x: ed.convolve(
        x, w, mode="constant", cval=0.0), (12, 13), (5, 5)),
    ("correlate1d", lambda w: lambda x: ed.correlate1d(
        x, w[0, 0], axis=1, mode="mirror"), (7, 16, 5), (1, 1, 4)),
    ("convolve1d", lambda w: lambda x: ed.convolve1d(
        x, w[0, 0], axis=0, mode="reflect"), (16, 6), (1, 1, 5)),
]


@pytest.mark.parametrize("name,mk,xshape,wshape",
                         LINEAR_OPS, ids=[t[0] for t in LINEAR_OPS])
def test_linear_adjoint_correlate_family(name, mk, xshape, wshape, rng):
    w = rng.standard_normal(wshape)
    _adjoint_identity(mk(w), xshape, _real_y, rng)


PARAMLESS_LINEAR = [
    ("uniform_filter", lambda x: ed.uniform_filter(x, 3, mode="reflect")),
    ("uniform_filter1d", lambda x: ed.uniform_filter1d(
        x, 4, axis=0, mode="wrap")),
    ("gaussian_filter", lambda x: ed.gaussian_filter(
        x, 1.5, mode="nearest")),
    ("gaussian_filter1d", lambda x: ed.gaussian_filter1d(
        x, 2.0, axis=1, order=1)),
    ("gaussian_laplace", lambda x: ed.gaussian_laplace(x, 1.0)),
    ("gaussian_gradient_magnitude_sq",
     lambda x: ed.gaussian_filter(x, 1.0, order=(1, 0))),
    ("sobel", lambda x: ed.sobel(x, axis=0, mode="reflect")),
    ("prewitt", lambda x: ed.prewitt(x, axis=1, mode="mirror")),
    ("laplace", lambda x: ed.laplace(x, mode="reflect")),
    ("spline_filter", lambda x: ed.spline_filter(x, order=3)),
]


@pytest.mark.parametrize("name,f", PARAMLESS_LINEAR,
                         ids=[t[0] for t in PARAMLESS_LINEAR])
def test_linear_adjoint_fixed_filters(name, f, rng):
    _adjoint_identity(f, (11, 12), _real_y, rng)


FOURIER_OPS = [
    ("fourier_gaussian", lambda z: ed.fourier_gaussian(z, 2.0)),
    ("fourier_uniform", lambda z: ed.fourier_uniform(z, 3.0)),
    ("fourier_ellipsoid", lambda z: ed.fourier_ellipsoid(z, 4.0)),
    ("fourier_shift", lambda z: ed.fourier_shift(z, (1.5, -0.5))),
]


@pytest.mark.parametrize("name,fc", FOURIER_OPS,
                         ids=[t[0] for t in FOURIER_OPS])
def test_linear_adjoint_fourier(name, fc, rng):
    # fourier_* are C-linear multipliers on the transformed array; test
    # the R-linear stacked form (real, imag) -> (real, imag), which is
    # convention-free w.r.t. complex cotangents.
    shape = (8, 9)

    def f(xs):
        xr, xi = xs
        z = fc(xr + 1j * xi)
        return jnp.real(z), jnp.imag(z)

    x = (jnp.asarray(rng.standard_normal(shape)),
         jnp.asarray(rng.standard_normal(shape)))
    fx = f(x)
    y = (jnp.asarray(rng.standard_normal(shape)),
         jnp.asarray(rng.standard_normal(shape)))
    (xt,) = jax.linear_transpose(f, x)(y)
    lhs = float(jnp.vdot(fx[0], y[0]) + jnp.vdot(fx[1], y[1]))
    rhs = float(jnp.vdot(x[0], xt[0]) + jnp.vdot(x[1], xt[1]))
    assert abs(lhs - rhs) <= 1e-12 * max(1.0, abs(lhs))


# ---------------------------------------------------------------------------
# selection (piecewise-linear) ops: min/max/rank/median/grey morphology

SELECTION_OPS = [
    ("minimum_filter", lambda x: ed.minimum_filter(x, 3)),
    ("maximum_filter", lambda x: ed.maximum_filter(x, (3, 2))),
    ("minimum_filter1d", lambda x: ed.minimum_filter1d(x, 3, axis=0)),
    ("maximum_filter1d", lambda x: ed.maximum_filter1d(x, 4, axis=1)),
    ("median_filter", lambda x: ed.median_filter(x, 3)),
    ("rank_filter", lambda x: ed.rank_filter(x, 2, size=3)),
    ("percentile_filter", lambda x: ed.percentile_filter(x, 30.0, size=3)),
    ("grey_erosion", lambda x: ed.grey_erosion(x, size=(3, 3))),
    ("grey_dilation", lambda x: ed.grey_dilation(x, size=(3, 3))),
]


@pytest.mark.parametrize("name,f", SELECTION_OPS,
                         ids=[t[0] for t in SELECTION_OPS])
def test_selection_subgradient_directional_fd(name, f, rng):
    # random continuous input => unique argmin/argmax per window a.s.;
    # the op is locally linear there, so a central finite difference of
    # the projected output matches <grad, v> to fp precision.
    x = jnp.asarray(rng.standard_normal((9, 10)))
    proj = jnp.asarray(rng.standard_normal(np.asarray(f(x)).shape))
    v = jnp.asarray(rng.standard_normal(x.shape))

    def scalar(x):
        return jnp.sum(f(x) * proj)

    g = jax.grad(scalar)(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    eps = 1e-6
    fd = (float(scalar(x + eps * v)) - float(scalar(x - eps * v))) / (2 * eps)
    an = float(jnp.vdot(g, v))
    assert abs(fd - an) <= 1e-6 * max(1.0, abs(an)), (fd, an)


@pytest.mark.parametrize("name,f", SELECTION_OPS,
                         ids=[t[0] for t in SELECTION_OPS])
def test_selection_gradient_is_selection_count(name, f, rng):
    # grad of sum(out) counts how many windows select each input voxel:
    # nonnegative integers summing to out.size.
    x = jnp.asarray(rng.standard_normal((8, 9)))
    g = jax.grad(lambda x: jnp.sum(f(x)))(x)
    gn = np.asarray(g)
    assert np.allclose(gn, np.round(gn), atol=1e-12)
    assert (gn >= -1e-12).all()
    out_size = np.asarray(f(x)).size
    assert abs(gn.sum() - out_size) <= 1e-9 * out_size


def test_grey_erosion_nonflat_structure_grad(rng):
    # non-flat structure: out = min(window - structure); d out/d x is
    # still a one-hot selection, and the FD identity must hold.
    s = rng.standard_normal((3, 3))
    x = jnp.asarray(rng.standard_normal((9, 9)))
    v = jnp.asarray(rng.standard_normal(x.shape))

    def scalar(x):
        return jnp.sum(ed.grey_erosion(x, structure=s) ** 2)

    g = jax.grad(scalar)(x)
    eps = 1e-6
    fd = (float(scalar(x + eps * v)) - float(scalar(x - eps * v))) / (2 * eps)
    assert abs(fd - float(jnp.vdot(g, v))) <= 1e-5 * max(1.0, abs(fd))


def test_morphological_gradient_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((8, 8)))
    g = jax.grad(lambda x: jnp.sum(ed.morphological_gradient(x, size=3)))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


# ---------------------------------------------------------------------------
# piecewise-constant ops: jit-traceable; gradient exactly zero (never
# NaN, never silent garbage) — the `!= 0` threshold kills every
# derivative path, so zero IS the almost-everywhere derivative

PIECEWISE_CONSTANT_OPS = [
    ("binary_erosion", lambda x: ed.binary_erosion(x > 0.0)),
    ("binary_dilation", lambda x: ed.binary_dilation(x > 0.0)),
    ("binary_fill_holes", lambda x: ed.binary_fill_holes(x > 0.0)),
    ("distance_transform_edt", lambda x: ed.distance_transform_edt(
        x > 0.0)),
    ("label_roots", lambda x: __import__(
        "elasticdeform_tpu.measure", fromlist=["label_roots"]
    ).label_roots(x > 0.0)),
]


@pytest.mark.parametrize("name,f", PIECEWISE_CONSTANT_OPS,
                         ids=[t[0] for t in PIECEWISE_CONSTANT_OPS])
def test_piecewise_constant_ops_zero_grad(name, f, rng):
    x = jnp.asarray(rng.standard_normal((7, 8)))
    jitted = jax.jit(f)
    out = jitted(x)  # traces and runs
    assert np.asarray(out).shape[-2:] == (7, 8)
    g = jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float64)))(x)
    assert np.asarray(g).shape == (7, 8)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


# ---------------------------------------------------------------------------
# scipy agreement of the subgradient *choice* where scipy has one:
# selection ops agree with scipy forward, so the selected voxel is
# scipy's too at unique-argmin inputs

def test_selection_matches_scipy_forward(rng):
    x = rng.standard_normal((9, 10))
    np.testing.assert_allclose(
        np.asarray(ed.median_filter(jnp.asarray(x), 3)),
        ndi.median_filter(x, 3), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(ed.minimum_filter(jnp.asarray(x), 3)),
        ndi.minimum_filter(x, 3), rtol=1e-12, atol=1e-12)
