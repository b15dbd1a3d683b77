"""API-surface tests: normalization, validation errors, list semantics.

Mirrors the argument-handling behaviour of reference deform_grid.py:295-399.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

RNG = np.random.default_rng(5)


def test_single_vs_list():
    X = RNG.random((20, 20))
    d = RNG.standard_normal((2, 3, 3)) * 5
    single = ed.deform_grid(X, d)
    [listed] = ed.deform_grid([X], d)
    np.testing.assert_array_equal(single, listed)
    assert isinstance(single, np.ndarray)


def test_invalid_inputs():
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(Exception):
        ed.deform_grid("not an array", d)
    with pytest.raises(AssertionError):
        ed.deform_grid([], d)


def test_displacement_validation():
    X = RNG.random((20, 20))
    with pytest.raises(AssertionError):
        ed.deform_grid(X, RNG.standard_normal((3, 3, 3)))  # wrong first dim
    with pytest.raises(AssertionError):
        ed.deform_grid(X, RNG.standard_normal((2, 3)))  # wrong ndim


def test_order_validation():
    X = RNG.random((10, 10))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, order=6)
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, order=-1)
    # order 5 is supported (reference accepts 0-5, deform_grid.py:366)
    ed.deform_grid(X, d, order=5)


def test_mode_validation():
    X = RNG.random((10, 10))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(RuntimeError):
        ed.deform_grid(X, d, mode='bogus')


def test_axis_validation():
    X = RNG.random((10, 10, 3))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, axis=(1, 0))  # not sorted
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, axis=(0, 0))  # not unique
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, axis=(0, 5))  # out of range


def test_crop_validation():
    X = RNG.random((20, 20))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(Exception):
        ed.deform_grid(X, d, crop=[slice(0, 10)])  # wrong length
    with pytest.raises(Exception):
        ed.deform_grid(X, d, crop=[3, slice(0, 10)])  # not a slice
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, crop=[slice(0, 10, 2), slice(0, 10)])  # step
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, crop=[slice(0, 30), slice(0, 10)])  # too large
    out = ed.deform_grid(X, d, crop=[slice(5, 15), slice(None)])
    assert out.shape == (10, 20)


def test_gradient_requires_x_shape_with_crop():
    dY = RNG.random((10, 10))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(ValueError, match="X_shape is required"):
        ed.deform_grid_gradient(dY, d, crop=[slice(0, 10), slice(0, 10)])
    with pytest.raises(ValueError, match="does not match"):
        ed.deform_grid_gradient(dY, d, crop=[slice(0, 9), slice(0, 10)],
                                X_shape=(20, 20))


def test_affine_validation():
    X = RNG.random((10, 10))
    d = RNG.standard_normal((2, 3, 3))
    # homogeneous 3x3 accepted
    out1 = ed.deform_grid(X, d, affine=np.eye(3))
    # (2,3) accepted
    out2 = ed.deform_grid(X, d, affine=np.eye(3)[:2])
    np.testing.assert_allclose(out1, out2)
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, affine=np.ones((3, 3)))  # bad bottom row
    with pytest.raises(AssertionError):
        ed.deform_grid(X, d, affine=np.eye(4))


def test_rotate_zoom_2d_only():
    X = RNG.random((8, 8, 8))
    d = RNG.standard_normal((3, 3, 3, 3))
    with pytest.raises(AssertionError, match="2D"):
        ed.deform_grid(X, d, rotate=30)


def test_identity_displacement_is_identity():
    # zero displacement + order 1 + no prefilter reproduces the input
    X = RNG.random((15, 17))
    d = np.zeros((2, 3, 3))
    out = ed.deform_grid(X, d, order=1)
    np.testing.assert_allclose(out, X, rtol=1e-12, atol=1e-12)
    # order 3 with prefilter: spline interpolation at integer coords is exact
    out3 = ed.deform_grid(X, d, order=3)
    np.testing.assert_allclose(out3, X, rtol=1e-9, atol=1e-9)


def test_dtype_preserved():
    d = RNG.standard_normal((2, 3, 3)) * 3
    for dt in ('float32', 'float64', 'int32', 'uint8'):
        X = (RNG.random((12, 12)) * 50).astype(dt)
        out = ed.deform_grid(X, d, order=1)
        assert out.dtype == np.dtype(dt)


def test_jax_native_matches_numpy_api():
    import jax.numpy as jnp
    X = RNG.random((20, 18))
    d = RNG.standard_normal((2, 3, 3)) * 5
    ref = ed.deform_grid(X, d, order=3, mode='mirror')
    out = ed.deform(jnp.asarray(X), jnp.asarray(d), order=3, mode='mirror')
    np.testing.assert_allclose(ref, np.asarray(out), rtol=1e-12, atol=1e-12)


def test_random_displacement_reproducible():
    import jax
    key = jax.random.PRNGKey(0)
    d1 = ed.random_displacement(key, (3, 3), sigma=10.0)
    d2 = ed.random_displacement(key, (3, 3), sigma=10.0)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    assert d1.shape == (2, 3, 3)
    d3 = ed.random_displacement(key, 3, sigma=10.0, ndim=3)
    assert d3.shape == (3, 3, 3, 3)


def test_deform_random_jax():
    import jax
    key = jax.random.PRNGKey(1)
    X = RNG.random((16, 16))
    out = ed.deform_random(key, X, sigma=5.0, points=3, order=1)
    assert out.shape == X.shape


def test_drop_in_alias():
    # the public surface matches the reference exactly, so aliasing the
    # import is a drop-in replacement (reference elasticdeform/__init__.py)
    import elasticdeform_tpu as elasticdeform
    X = RNG.random((30, 30))
    d = RNG.standard_normal((2, 3, 3)) * 5
    Y = elasticdeform.deform_grid(X, d, order=3, mode='mirror')
    dX = elasticdeform.deform_grid_gradient(RNG.random(Y.shape), d,
                                            order=3, mode='mirror')
    assert Y.shape == X.shape and dX.shape == X.shape
    import elasticdeform_tpu.torch as _t
    assert hasattr(_t, "deform_grid")
    import elasticdeform_tpu.tf as _f
    assert hasattr(_f, "deform_grid")


def test_bfloat16_inputs():
    """Training pipelines feed bf16: compute runs in f32 and the output
    comes back bf16, matching the f32 result to bf16 resolution."""
    rng = np.random.default_rng(11)
    X = rng.random((24, 20)).astype(np.float32)
    d = rng.standard_normal((2, 3, 3)) * 3
    ref = ed.deform(jnp.asarray(X), jnp.asarray(d), order=3, mode='mirror')
    out = ed.deform(jnp.asarray(X, dtype=jnp.bfloat16), jnp.asarray(d),
                    order=3, mode='mirror')
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref),
        rtol=2e-2, atol=2e-2)
    # gradients flow through the bf16 layer
    g = jax.grad(lambda x: jnp.sum(
        ed.deform(x, jnp.asarray(d), order=3, mode='mirror')
        .astype(jnp.float32) ** 2))(jnp.asarray(X, dtype=jnp.bfloat16))
    assert g.shape == X.shape and bool(jnp.all(jnp.isfinite(
        g.astype(jnp.float32))))


def test_remat_compatible():
    """jax.checkpoint around the deform layer (memory/flops trade in real
    training steps) must give identical gradients."""
    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.random((20, 22)).astype(np.float32))
    d = jnp.asarray((rng.standard_normal((2, 3, 3)) * 3).astype(np.float32))

    def loss(x):
        return jnp.sum(ed.deform(x, d, order=3, mode='mirror') ** 2)

    g_plain = jax.grad(loss)(X)
    g_remat = jax.grad(jax.checkpoint(loss))(X)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_remat),
                               rtol=1e-6, atol=1e-7)


def test_table_dtype_fast_mode():
    """table_dtype='bfloat16' (fast augmentation): window-table values are
    stored/gathered narrow — output within ~2^-7 of the exact path, same
    shapes, gradients finite; default path unaffected."""
    rng = np.random.default_rng(31)
    X = jnp.asarray(rng.random((40, 36)).astype(np.float32))
    d = jnp.asarray((rng.standard_normal((2, 3, 3)) * 6).astype(np.float32))
    exact = ed.deform(X, d, order=3, mode='mirror')
    fast = ed.deform(X, d, order=3, mode='mirror', table_dtype='bfloat16')
    assert fast.dtype == exact.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-2, atol=2e-2)
    assert float(jnp.max(jnp.abs(fast - exact))) > 0  # narrow path engaged

    g = jax.grad(lambda x: jnp.sum(ed.deform(
        x, d, order=3, mode='mirror', table_dtype='bfloat16') ** 2))(X)
    assert bool(jnp.all(jnp.isfinite(g)))

    # batched twin
    Xb = jnp.asarray(rng.random((3, 24, 26)).astype(np.float32))
    db = jnp.asarray((rng.standard_normal((3, 2, 3, 3)) * 4)
                     .astype(np.float32))
    yb = ed.deform_batch(Xb, db, order=3, mode='mirror',
                         table_dtype='bfloat16')
    ye = ed.deform_batch(Xb, db, order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ye),
                               rtol=2e-2, atol=2e-2)

    with pytest.raises(ValueError):
        ed.deform(X, d, table_dtype='int32')


def test_validation_survives_python_O():
    """Argument validation raises under ``python -O`` too: the reference's
    assert-based checks vanish there (same messages, deform_grid.py:295-399);
    this library validates unconditionally (_normalize._check)."""
    import subprocess
    import sys
    code = (
        "import numpy as np\n"
        "import elasticdeform_tpu as ed\n"
        "try:\n"
        "    ed.deform_grid(np.zeros((4, 4)), np.zeros((3, 3, 3)))\n"
        "except AssertionError as e:\n"
        "    assert 'First dimension of displacement' in str(e), e\n"
        "else:\n"
        "    raise SystemExit('no validation error under -O')\n"
        "try:\n"
        "    ed.deform_grid(np.zeros((4, 4)), np.zeros((2, 3, 3)), order=7)\n"
        "except AssertionError as e:\n"
        "    assert 'order should be' in str(e), e\n"
        "else:\n"
        "    raise SystemExit('no order validation under -O')\n"
        "print('OK')\n")
    r = subprocess.run([sys.executable, "-O", "-c", code],
                       capture_output=True, text=True, timeout=300,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0 and "OK" in r.stdout, (r.stdout, r.stderr)
