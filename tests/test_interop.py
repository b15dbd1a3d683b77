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
