"""Tests for the analytic displacement-field Jacobian and determinant.

Oracle: the continuous field reconstruction sampled on a fine sub-voxel
grid with scipy (mirror spline interpolation of the prefiltered grid —
the library's field model), differentiated by central differences at the
fine step (truncation ~h^2 = 1e-4 of the derivative scale), evaluated at
the integer voxels by striding.
"""

import numpy as np
import pytest
import scipy.ndimage

import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

RNG = np.random.default_rng(9)

SUB = 8  # fine samples per voxel


def _oracle_jacobian(displacement, shape):
    """J[h, k] at the integer voxels from the fine-grid reconstruction."""
    naxis = len(shape)
    p = displacement.shape[1:]
    J = np.zeros((naxis, naxis) + tuple(shape))
    margin = 2
    for h in range(naxis):
        c = scipy.ndimage.spline_filter(
            np.asarray(displacement[h], np.float64), order=3, mode='mirror')
        axes = [(np.arange(-margin * SUB, (n - 1) * SUB + margin * SUB + 1)
                 / SUB) for n in shape]
        mesh = np.meshgrid(*axes, indexing='ij')
        coords = np.stack([m * (p[k] - 1) / (shape[k] - 1)
                           for k, m in enumerate(mesh)])
        u = scipy.ndimage.map_coordinates(
            c, coords.reshape(naxis, -1), order=3, mode='mirror',
            prefilter=False).reshape(mesh[0].shape)
        grads = np.gradient(u, 1.0 / SUB)
        if naxis == 1:
            grads = [grads]
        sel = tuple(slice(margin * SUB, -margin * SUB or None, SUB)
                    for _ in range(naxis))
        for k in range(naxis):
            J[h, k] = grads[k][sel]
    return J


@pytest.mark.parametrize("shape,points,atol", [
    ((25, 31), (4, 5), 5e-4),
    # tighter control spacing -> larger u''' -> larger FD truncation in
    # the ORACLE (measured: halving the step quarters the error, pure
    # O(h^2) — the analytic Jacobian is the converged value)
    ((14, 12, 16), (3, 3, 4), 2e-3),
])
def test_jacobian_matches_fine_grid_oracle(shape, points, atol):
    d = RNG.standard_normal((len(shape), *points)) * 2
    got = np.asarray(ed.displacement_field_jacobian(d, shape))
    want = _oracle_jacobian(d, shape)
    np.testing.assert_allclose(got, want, atol=atol)


def test_jacobian_determinant_identity_and_positive():
    shape = (20, 22)
    det0 = np.asarray(ed.jacobian_determinant(np.zeros((2, 4, 4)), shape))
    np.testing.assert_array_equal(det0, np.ones(shape))
    # a small smooth deformation stays orientation-preserving
    d = RNG.standard_normal((2, 4, 4)) * 1.0
    det = np.asarray(ed.jacobian_determinant(d, shape))
    assert det.shape == shape and (det > 0).all()


def test_jacobian_determinant_detects_folding():
    shape = (20, 22)
    # a violent deformation (displacements ~ control spacing) must fold
    d = RNG.standard_normal((2, 4, 4)) * 12.0
    det = np.asarray(ed.jacobian_determinant(d, shape))
    assert (det <= 0).any()


def test_jacobian_determinant_crop_consistency():
    shape = (24, 26)
    d = RNG.standard_normal((2, 4, 4)) * 2
    crop = (slice(3, 19), slice(5, 20))
    full = np.asarray(ed.jacobian_determinant(d, shape))
    cropped = np.asarray(ed.jacobian_determinant(d, shape, crop=crop))
    np.testing.assert_allclose(cropped, full[crop], rtol=0, atol=0)


def test_jacobian_determinant_field_matches_analytic_interior():
    shape = (30, 34)
    d = jnp.asarray(RNG.standard_normal((2, 4, 4)) * 2)
    u = ed.displacement_field(d, shape)
    det_fd = np.asarray(ed.jacobian_determinant_field(u))
    det_an = np.asarray(ed.jacobian_determinant(d, shape))
    inner = (slice(3, -3),) * 2
    np.testing.assert_allclose(det_fd[inner], det_an[inner], atol=5e-2)


def test_jacobian_batched_and_3d():
    shape = (10, 12, 14)
    D = RNG.standard_normal((2, 3, 3, 3, 3)) * 1.5
    JB = np.asarray(ed.displacement_field_jacobian(D, shape))
    assert JB.shape == (2, 3, 3, *shape)
    detB = np.asarray(ed.jacobian_determinant(D, shape))
    assert detB.shape == (2, *shape)
    for b in range(2):
        np.testing.assert_allclose(
            detB[b], np.asarray(ed.jacobian_determinant(D[b], shape)),
            rtol=1e-12, atol=1e-12)


def test_jacobian_determinant_differentiable_penalty():
    shape = (16, 18)
    d = jnp.asarray(RNG.standard_normal((2, 4, 4)) * 8, jnp.float64)

    def penalty(dd):
        det = ed.jacobian_determinant(dd, shape)
        return jnp.sum(jax.nn.relu(-det))

    g = jax.grad(penalty)(d)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-6
    idx = (0, 1, 2)
    fd = (float(penalty(d.at[idx].add(eps)))
          - float(penalty(d.at[idx].add(-eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), fd, rtol=1e-4, atol=1e-8)
