"""Framework shims: torch and tensorflow round-trips.

Mirrors the reference's TF/torch round-trip tests
(reference tests/test_deform_grid.py:367-565): forward and backward through
the shims must equal the direct numpy API. Both frameworks are optional
imports; tests skip when absent (reference :9-26).
"""

import numpy as np
import pytest

import elasticdeform_tpu as ed

try:
    import torch
except Exception:
    torch = None

try:
    import os
    os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')
    import tensorflow as tf
except Exception:
    tf = None

RNG = np.random.default_rng(11)


@pytest.mark.skipif(torch is None, reason="PyTorch was not loaded.")
@pytest.mark.parametrize("mode", ["mirror", "constant", "wrap"])
@pytest.mark.parametrize("order", [0, 1, 3])
def test_torch_roundtrip(order, mode):
    import elasticdeform_tpu.torch as etorch
    shape, points = (30, 30), (3, 3)
    displacement = RNG.standard_normal((2, *points)) * 10
    X_val = RNG.random(shape)

    ref_fwd = ed.deform_grid(X_val, displacement, order=order, mode=mode)
    dY_val = RNG.random(ref_fwd.shape)
    ref_bwd = ed.deform_grid_gradient(dY_val, displacement, order=order,
                                      mode=mode, X_shape=shape)

    X = torch.tensor(X_val, requires_grad=True)
    disp = torch.tensor(displacement)
    Y = etorch.deform_grid(X, disp, order=order, mode=mode)
    Y.backward(torch.tensor(dY_val))

    np.testing.assert_almost_equal(ref_fwd, Y.detach().numpy())
    np.testing.assert_almost_equal(ref_bwd, X.grad.detach().numpy())


@pytest.mark.skipif(torch is None, reason="PyTorch was not loaded.")
def test_torch_multi_crop():
    import elasticdeform_tpu.torch as etorch
    shape, points = (30, 25), (3, 3)
    crop = (slice(5, 20), slice(5, 20))
    displacement = RNG.standard_normal((2, *points)) * 10
    X_val, Y_val = RNG.random(shape), RNG.random(shape)

    Xd_ref, Yd_ref = ed.deform_grid([X_val, Y_val], displacement,
                                    order=[0, 3], crop=crop)
    dXd = RNG.random(Xd_ref.shape)
    dYd = RNG.random(Yd_ref.shape)
    dX_ref, dY_ref = ed.deform_grid_gradient(
        [dXd, dYd], displacement, order=[0, 3], crop=crop,
        X_shape=[shape, shape])

    X = torch.tensor(X_val, requires_grad=True)
    Y = torch.tensor(Y_val, requires_grad=True)
    disp = torch.tensor(displacement)
    Xd, Yd = etorch.deform_grid([X, Y], disp, order=[0, 3], crop=crop)
    Xd.backward(torch.tensor(dXd), retain_graph=True)
    Yd.backward(torch.tensor(dYd))

    np.testing.assert_almost_equal(Xd_ref, Xd.detach().numpy())
    np.testing.assert_almost_equal(Yd_ref, Yd.detach().numpy())
    np.testing.assert_almost_equal(dX_ref, X.grad.detach().numpy())
    np.testing.assert_almost_equal(dY_ref, Y.grad.detach().numpy())


@pytest.mark.skipif(tf is None, reason="TensorFlow was not loaded.")
@pytest.mark.parametrize("order", [0, 3])
def test_tf_roundtrip(order):
    import elasticdeform_tpu.tf as etf
    shape, points = (25, 25), (3, 3)
    displacement = RNG.standard_normal((2, *points)) * 10
    X_val = RNG.random(shape)

    ref_fwd = ed.deform_grid(X_val, displacement, order=order)
    dY_val = RNG.random(ref_fwd.shape)
    ref_bwd = ed.deform_grid_gradient(dY_val, displacement, order=order,
                                      X_shape=shape)

    X = tf.Variable(X_val)
    with tf.GradientTape() as g:
        g.watch(X)
        Y = etf.deform_grid(X, displacement, order=order)
    dX = g.gradient(Y, X, tf.constant(dY_val))

    np.testing.assert_almost_equal(ref_fwd, Y.numpy())
    np.testing.assert_almost_equal(ref_bwd, dX.numpy())


@pytest.mark.skipif(tf is None, reason="TensorFlow was not loaded.")
def test_tf_multi():
    import elasticdeform_tpu.tf as etf
    shape, points = (25, 20), (3, 3)
    displacement = RNG.standard_normal((2, *points)) * 10
    X_val, Y_val = RNG.random(shape), RNG.random(shape)

    Xd_ref, Yd_ref = ed.deform_grid([X_val, Y_val], displacement)
    dXd = RNG.random(Xd_ref.shape)
    dYd = RNG.random(Yd_ref.shape)
    dX_ref, dY_ref = ed.deform_grid_gradient(
        [dXd, dYd], displacement, X_shape=[shape, shape])

    X = tf.Variable(X_val)
    Y = tf.Variable(Y_val)
    with tf.GradientTape(persistent=True) as g:
        g.watch(X)
        g.watch(Y)
        Xd, Yd = etf.deform_grid([X, Y], displacement)
    dX = g.gradient(Xd, X, tf.constant(dXd))
    dY = g.gradient(Yd, Y, tf.constant(dYd))

    np.testing.assert_almost_equal(Xd_ref, Xd.numpy())
    np.testing.assert_almost_equal(Yd_ref, Yd.numpy())
    np.testing.assert_almost_equal(dX_ref, dX.numpy())
    np.testing.assert_almost_equal(dY_ref, dY.numpy())


# ---------------------------------------------------------------------------
# batched shims (beyond reference parity: the reference has no batched API)

def test_batch_gradient_matches_vjp():
    """core.deform_batch_gradient (backward-only, vmap of the per-sample
    adjoint pipeline) must equal jax.vjp through deform_batch (native
    batched custom_vjp backward) — two independent adjoint routes."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    X = jnp.asarray(rng.random((3, 14, 16)))
    D = jnp.asarray(rng.standard_normal((3, 2, 3, 3)) * 4)
    gy = jnp.asarray(rng.random((3, 14, 16)))
    kw = dict(order=3, mode='mirror')
    _, vjp = jax.vjp(lambda x: ed.deform_batch(x, D, **kw), X)
    (want,) = vjp(gy)
    got = ed.deform_batch_gradient(gy, D, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-11, atol=1e-11)


def test_batch_gradient_impl_routes_agree():
    """The two backward-only routes — ``batch_impl='native'`` (vjp of the
    batched forward at a zero primal; the measured-faster default) and
    ``batch_impl='vmap'`` (per-sample adjoint pipeline) — are the same
    linear map, so they must agree to fp noise, including with crop,
    multi-input, and an affine."""
    rng = np.random.default_rng(24)
    D = rng.standard_normal((3, 2, 3, 3)) * 3
    gys = [rng.random((3, 6, 8)).astype(np.float32),
           rng.random((3, 6, 8)).astype(np.float32)]
    kw = dict(order=[3, 1], mode=['mirror', 'nearest'],
              crop=[slice(2, 8), slice(1, 9)],
              X_shape=[(12, 12), (12, 12)], rotate=20.0)
    a = ed.deform_batch_gradient(gys, D, batch_impl='native', **kw)
    b = ed.deform_batch_gradient(gys, D, batch_impl='vmap', **kw)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)
    # integer-declared cotangents fall back to the vmap pipeline (jax.vjp
    # cannot differentiate w.r.t. int inputs) and keep working
    gyi = rng.integers(0, 255, (3, 10, 10)).astype(np.uint8)
    out = ed.deform_batch_gradient(gyi, D, order=0, mode='nearest')
    assert out.shape == (3, 10, 10)


def test_batch_gradient_matches_per_sample_loop():
    rng = np.random.default_rng(22)
    D = rng.standard_normal((4, 2, 3, 3)) * 5
    gy = rng.random((4, 20, 11))
    kw = dict(order=2, mode='reflect')
    got = np.asarray(ed.deform_batch_gradient(gy, D, **kw))
    for b in range(4):
        want = ed.deform_grid_gradient(gy[b], D[b], **kw)
        np.testing.assert_allclose(got[b], want, rtol=1e-11, atol=1e-11)


def test_batch_gradient_crop_xshape():
    rng = np.random.default_rng(23)
    D = rng.standard_normal((2, 2, 3, 3)) * 3
    crop = [slice(4, 16), slice(2, 10)]
    gy = rng.random((2, 12, 8))
    got = np.asarray(ed.deform_batch_gradient(
        gy, D, order=3, mode='mirror', crop=crop, X_shape=(20, 14)))
    assert got.shape == (2, 20, 14)
    for b in range(2):
        want = ed.deform_grid_gradient(gy[b], D[b], order=3, mode='mirror',
                                       crop=crop, X_shape=(20, 14))
        np.testing.assert_allclose(got[b], want, rtol=1e-11, atol=1e-11)
    with pytest.raises(ValueError, match="X_shape is required"):
        ed.deform_batch_gradient(gy, D, order=3, crop=crop)
    # without crop the expected output shape IS X_shape — mismatch raises
    with pytest.raises(ValueError, match="does not match"):
        ed.deform_batch_gradient(gy, D, order=3, mode='mirror',
                                 X_shape=(21, 14))


def test_api_deform_batch_numpy_contract():
    """api.deform_batch: numpy in/out, dtype preserved (uint8 round/clamp),
    values equal to the JAX-native core path."""
    from elasticdeform_tpu import api
    rng = np.random.default_rng(24)
    X = (rng.random((3, 18, 12)) * 255).astype(np.uint8)
    D = rng.standard_normal((3, 2, 3, 3)) * 4
    out = api.deform_batch(X, D, order=3, mode='mirror')
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8
    want = np.asarray(ed.deform_batch(X, D, order=3, mode='mirror'))
    np.testing.assert_array_equal(out, want)


@pytest.mark.skipif(torch is None, reason="PyTorch was not loaded.")
def test_torch_batch_roundtrip():
    import elasticdeform_tpu.torch as etorch
    rng = np.random.default_rng(25)
    X_val = rng.random((3, 16, 14))
    D_val = rng.standard_normal((3, 2, 3, 3)) * 5
    want = np.asarray(ed.deform_batch(X_val, D_val, order=3, mode='mirror'))

    X = torch.tensor(X_val, requires_grad=True)
    D = torch.tensor(D_val)
    Y = etorch.deform_batch(X, D, order=3, mode='mirror')
    np.testing.assert_allclose(Y.detach().numpy(), want,
                               rtol=1e-10, atol=1e-10)

    dY_val = rng.random(want.shape)
    Y.backward(torch.tensor(dY_val))
    want_grad = np.asarray(ed.deform_batch_gradient(
        dY_val, D_val, order=3, mode='mirror'))
    np.testing.assert_allclose(X.grad.numpy(), want_grad,
                               rtol=1e-10, atol=1e-10)


@pytest.mark.skipif(torch is None, reason="PyTorch was not loaded.")
def test_torch_batch_multi_input():
    import elasticdeform_tpu.torch as etorch
    rng = np.random.default_rng(26)
    A_val = rng.random((2, 12, 12))
    B_val = rng.random((2, 12, 12))
    D_val = rng.standard_normal((2, 2, 3, 3)) * 3
    A = torch.tensor(A_val, requires_grad=True)
    B = torch.tensor(B_val, requires_grad=True)
    ys = etorch.deform_batch([A, B], torch.tensor(D_val),
                             order=[3, 0], mode='nearest')
    want = ed.deform_batch([A_val, B_val], D_val, order=[3, 0],
                           mode='nearest')
    for y, w in zip(ys, want):
        np.testing.assert_allclose(y.detach().numpy(), np.asarray(w),
                                   rtol=1e-10, atol=1e-10)
    (ys[0].sum() + ys[1].sum()).backward()
    assert A.grad is not None and B.grad is not None
    assert A.grad.shape == A.shape and B.grad.shape == B.shape


@pytest.mark.skipif(tf is None, reason="TensorFlow was not loaded.")
def test_tf_batch_roundtrip():
    import elasticdeform_tpu.tf as etf
    rng = np.random.default_rng(27)
    X_val = rng.random((3, 15, 13))
    D_val = rng.standard_normal((3, 2, 3, 3)) * 5
    want = np.asarray(ed.deform_batch(X_val, D_val, order=3, mode='mirror'))

    X = tf.Variable(X_val)
    D = tf.constant(D_val)
    with tf.GradientTape() as tape:
        Y = etf.deform_batch(X, D, order=3, mode='mirror')
        loss_w = rng.random(want.shape)
        loss = tf.reduce_sum(Y * loss_w)
    np.testing.assert_allclose(Y.numpy(), want, rtol=1e-10, atol=1e-10)
    gX = tape.gradient(loss, X)
    want_grad = np.asarray(ed.deform_batch_gradient(
        loss_w, D_val, order=3, mode='mirror'))
    np.testing.assert_allclose(gX.numpy(), want_grad,
                               rtol=1e-10, atol=1e-10)


@pytest.mark.skipif(torch is None, reason="PyTorch was not loaded.")
def test_torch_map_coordinates_roundtrip():
    import elasticdeform_tpu.torch as etorch
    from elasticdeform_tpu import api
    shape = (26, 31)
    coords = np.stack([RNG.uniform(-3, n + 2, size=(17, 14))
                       for n in shape])
    X_val = RNG.random(shape)

    ref_fwd = api.map_coordinates(X_val, coords, order=3, mode='mirror')
    dY_val = RNG.random(ref_fwd.shape)
    ref_bwd = api.map_coordinates_gradient(dY_val, coords, order=3,
                                           mode='mirror', X_shape=shape)

    X = torch.tensor(X_val, requires_grad=True)
    Y = etorch.map_coordinates(X, torch.tensor(coords), order=3,
                               mode='mirror')
    Y.backward(torch.tensor(dY_val))

    np.testing.assert_almost_equal(ref_fwd, Y.detach().numpy())
    np.testing.assert_almost_equal(ref_bwd, X.grad.detach().numpy())


@pytest.mark.skipif(tf is None, reason="TensorFlow was not loaded.")
def test_tf_map_coordinates_roundtrip():
    import elasticdeform_tpu.tf as etf
    from elasticdeform_tpu import api
    shape = (24, 28)
    coords = np.stack([RNG.uniform(-3, n + 2, size=(15, 13))
                       for n in shape])
    X_val = RNG.random(shape)

    ref_fwd = api.map_coordinates(X_val, coords, order=3, mode='nearest')
    dY_val = RNG.random(ref_fwd.shape)
    ref_bwd = api.map_coordinates_gradient(dY_val, coords, order=3,
                                           mode='nearest', X_shape=shape)

    X = tf.Variable(X_val)
    coords_tf = tf.constant(coords)
    with tf.GradientTape() as tape:
        Y = etf.map_coordinates(X, coords_tf, order=3, mode='nearest')
        loss = tf.reduce_sum(Y * tf.constant(dY_val))
    dX = tape.gradient(loss, X)

    np.testing.assert_almost_equal(ref_fwd, Y.numpy())
    np.testing.assert_almost_equal(ref_bwd, dX.numpy())
