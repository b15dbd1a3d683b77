"""Complex input coverage: complex64 / complex128 end-to-end.

scipy.ndimage supports complex inputs throughout (map_coordinates,
affine_transform, spline_filter cast cval/weights per component); the
reference's dtype matrix (deform.c:271-338) is real-only, so this is
beyond-reference surface matching the scipy side of the general-resampler
family. Contract: the pipeline is linear in the input with REAL
coefficients, so a complex input deforms as two real channels
(ops/deform.py::_complex_to_channels) — results are bitwise equal to
deforming real/imag parts in separate calls, scipy-parity holds for the
resampler surface, and the adjoint satisfies the real inner-product
identity on C^n.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

import elasticdeform_tpu as ed
from elasticdeform_tpu import core

RNG = np.random.default_rng(11)

CPLX = [np.complex64, np.complex128]
TOL = {np.complex64: 2e-5, np.complex128: 1e-10}


def _cimg(shape, dtype=np.complex128):
    return (RNG.random(shape) + 1j * RNG.random(shape) - (0.5 + 0.5j)) \
        .astype(dtype)


@pytest.mark.parametrize("dtype", CPLX)
@pytest.mark.parametrize("order,mode", [
    # modes whose semantics are unchanged in modern scipy (reflect/nearest
    # keep the reference's pre-1.6 behavior — covered by the bitwise
    # split-call test below instead)
    (0, "nearest"), (1, "wrap"), (2, "mirror"), (3, "mirror"),
    (3, "constant"), (5, "constant"),
])
def test_map_coordinates_scipy_parity(dtype, order, mode):
    x = _cimg((14, 13), dtype)
    c = RNG.random((2, 6, 7)) * 16 - 2          # incl. out-of-range
    cval = 1.5 - 2.5j
    y = np.asarray(core.map_coordinates(x, c, order=order, mode=mode,
                                        cval=cval))
    ys = ndi.map_coordinates(x, c, order=order, mode=mode, cval=cval)
    assert y.dtype == dtype
    np.testing.assert_allclose(y, ys, rtol=TOL[dtype], atol=TOL[dtype])


@pytest.mark.parametrize("dtype", CPLX)
def test_deform_matches_split_calls_bitwise(dtype):
    """deform(complex) == deform(real) + 1j*deform(imag), bit for bit:
    the split-channel pipeline runs the identical real kernels."""
    x = _cimg((17, 12), dtype)
    d = RNG.standard_normal((2, 3, 3)) * 3
    y = np.asarray(ed.deform_grid(x, d, order=3, mode="mirror"))
    yr = np.asarray(ed.deform_grid(x.real.copy(), d, order=3, mode="mirror"))
    yi = np.asarray(ed.deform_grid(x.imag.copy(), d, order=3, mode="mirror"))
    assert y.dtype == dtype
    np.testing.assert_array_equal(y.real, yr)
    np.testing.assert_array_equal(y.imag, yi)


def test_deform_complex_cval_constant_mode():
    x = _cimg((10, 10))
    d = np.zeros((2, 3, 3))
    cval = -3.0 + 7.0j
    # zoom out so the corners fall outside and take cval
    y = np.asarray(ed.deform_grid(x, d, order=1, mode="constant", cval=cval,
                                  zoom=0.25))
    assert np.any(y == cval)


def test_deform_complex_3d_crop_multi_channel():
    x = _cimg((9, 10, 11, 2))              # trailing channel axis
    d = RNG.standard_normal((3, 3, 3, 3)) * 2
    crop = (slice(1, 8), slice(2, 9), slice(None))
    y = ed.deform_grid(x, d, order=3, axis=(0, 1, 2), crop=crop)
    yr = ed.deform_grid(x.real.copy(), d, order=3, axis=(0, 1, 2), crop=crop)
    np.testing.assert_allclose(np.asarray(y).real, np.asarray(yr),
                               rtol=0, atol=0)
    assert y.shape == (7, 7, 11, 2)


@pytest.mark.parametrize("dtype", CPLX)
def test_gradient_adjoint_identity(dtype):
    """Re<A x, dy> == Re<x, A^T dy> — the adjoint contract extended to
    complex inputs with the real inner product on C^n ~ R^2n."""
    x = _cimg((12, 11), dtype)
    d = RNG.standard_normal((2, 3, 3)) * 2
    y = np.asarray(ed.deform_grid(x, d, order=3, mode="mirror"))
    dy = _cimg(y.shape, dtype)
    dx = np.asarray(ed.deform_grid_gradient(dy, d, order=3, mode="mirror",
                                            X_shape=x.shape))
    assert dx.dtype == dtype
    lhs = np.vdot(dy, y).real
    rhs = np.vdot(dx, x).real
    tol = 1e-4 if dtype == np.complex64 else 1e-10
    np.testing.assert_allclose(lhs, rhs, rtol=tol)


def test_jax_vjp_matches_handwritten_gradient():
    """jax.vjp through core.deform with a complex cotangent agrees with
    the backward-only deform_gradient pipeline (the linearization has real
    coefficients, so JAX's conjugation convention cancels)."""
    x = jnp.asarray(_cimg((13, 12)))
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 2)
    f = lambda x_: core.deform(x_, d, order=3, mode="mirror")
    y, vjp = jax.vjp(f, x)
    dy = jnp.asarray(_cimg(y.shape))
    (dx_ad,) = vjp(dy)
    dx_hand = core.deform_gradient(dy, d, order=3, mode="mirror",
                                   X_shape=x.shape)
    np.testing.assert_allclose(np.asarray(dx_ad), np.asarray(dx_hand),
                               rtol=1e-10, atol=1e-12)


def test_deform_batch_complex_matches_per_sample():
    B = 3
    x = _cimg((B, 12, 10))
    D = RNG.standard_normal((B, 2, 3, 3)) * 2
    yb = np.asarray(core.deform_batch(x, D, order=3, mode="mirror"))
    assert yb.dtype == np.complex128
    for b in range(B):
        ys = np.asarray(core.deform(jnp.asarray(x[b]), jnp.asarray(D[b]),
                                    order=3, mode="mirror"))
        np.testing.assert_allclose(yb[b], ys, rtol=1e-12, atol=1e-12)


def test_deform_batch_gradient_complex():
    B = 2
    x = _cimg((B, 10, 11))
    D = RNG.standard_normal((B, 2, 3, 3)) * 2
    y = np.asarray(core.deform_batch(x, D, order=3, mode="mirror"))
    dy = _cimg(y.shape)
    dx = np.asarray(core.deform_batch_gradient(dy, jnp.asarray(D), order=3,
                                               mode="mirror"))
    lhs = np.vdot(dy, y).real
    rhs = np.vdot(dx, x).real
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_batched_map_coordinates_complex():
    B = 2
    x = _cimg((B, 11, 12))
    c = RNG.random((B, 2, 5, 6)) * 10
    yb = np.asarray(core.map_coordinates_batch(x, c, order=3, mode="mirror"))
    for b in range(B):
        ys = ndi.map_coordinates(x[b], c[b], order=3, mode="mirror")
        np.testing.assert_allclose(yb[b], ys, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("fn,kwargs", [
    ("affine_transform", {}),
    ("rotate", {"angle": 31.0, "axes": (1, 0)}),
    ("zoom", {"zoom": 1.4}),
    ("shift", {"shift": (1.3, -2.1)}),
])
def test_geometric_transforms_complex_scipy_parity(fn, kwargs):
    x = _cimg((13, 14))
    if fn == "affine_transform":
        m = np.array([[0.9, 0.1], [-0.2, 1.1]])
        y = np.asarray(core.affine_transform(x, m, offset=(1.0, -0.5),
                                             order=3, mode="mirror"))
        ys = ndi.affine_transform(x, m, offset=(1.0, -0.5), order=3,
                                  mode="mirror")
    else:
        y = np.asarray(getattr(core, fn)(x, order=3, mode="mirror",
                                         **kwargs))
        ys = getattr(ndi, fn)(x, order=3, mode="mirror", **kwargs)
    np.testing.assert_allclose(y, ys, rtol=1e-9, atol=1e-9)


def test_strategy_equivalence_complex():
    x = _cimg((12, 13))
    d = RNG.standard_normal((2, 3, 3)) * 2
    yw = core.deform(jnp.asarray(x), jnp.asarray(d), order=3,
                     strategy="windows")
    yg = core.deform(jnp.asarray(x), jnp.asarray(d), order=3,
                     strategy="gather")
    np.testing.assert_allclose(np.asarray(yw), np.asarray(yg),
                               rtol=1e-12, atol=1e-12)


def test_deform_random_grid_complex():
    x = _cimg((16, 16), np.complex64)
    y = ed.deform_random_grid(x, sigma=2, points=3, order=3)
    assert np.asarray(y).dtype == np.complex64


def test_api_mixed_complex_real_multi_input():
    """numpy API: a complex image and a uint8 segmentation sharing one
    deformation (host-side expansion keeps complex off the device)."""
    img = _cimg((20, 18), np.complex64)
    seg = (RNG.random((20, 18)) * 4).astype(np.uint8)
    d = RNG.standard_normal((2, 3, 3)) * 3
    yi, ys = ed.deform_grid([img, seg], d, order=[3, 0],
                            mode=["constant", "nearest"], cval=[1 - 1j, 0.0])
    assert yi.dtype == np.complex64 and ys.dtype == np.uint8
    want_r = np.asarray(ed.deform_grid(img.real.copy(), d, order=3,
                                       mode="constant", cval=1.0))
    want_i = np.asarray(ed.deform_grid(img.imag.copy(), d, order=3,
                                       mode="constant", cval=-1.0))
    np.testing.assert_array_equal(np.asarray(yi).real, want_r)
    np.testing.assert_array_equal(np.asarray(yi).imag, want_i)
    want_seg = np.asarray(ed.deform_grid(seg, d, order=0, mode="nearest"))
    np.testing.assert_array_equal(np.asarray(ys), want_seg)


def test_api_gradient_complex_crop_x_shape():
    x = _cimg((16, 15))
    d = RNG.standard_normal((2, 3, 3)) * 2
    crop = (slice(2, 12), slice(1, 13))
    y = np.asarray(ed.deform_grid(x, d, order=3, mode="mirror", crop=crop))
    dy = _cimg(y.shape)
    dx = np.asarray(ed.deform_grid_gradient(dy, d, order=3, mode="mirror",
                                            crop=crop, X_shape=x.shape))
    assert dx.shape == x.shape and dx.dtype == x.dtype
    lhs = np.vdot(dy, y).real
    rhs = np.vdot(dx, x).real
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


def test_api_batch_complex():
    B = 3
    x = _cimg((B, 12, 10), np.complex64)
    D = RNG.standard_normal((B, 2, 3, 3)) * 2
    yb = ed.deform_batch(x, D, order=3, mode="mirror")
    assert yb.dtype == np.complex64
    for b in range(B):
        ys = np.asarray(ed.deform_grid(x[b].copy(), D[b], order=3,
                                       mode="mirror"))
        np.testing.assert_allclose(yb[b], ys, rtol=2e-6, atol=2e-6)
    dy = _cimg(yb.shape, np.complex64)
    dx = ed.deform_batch_gradient(dy, D, order=3, mode="mirror")
    lhs = np.vdot(dy, yb).real
    rhs = np.vdot(dx, x).real
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_api_map_coordinates_complex():
    from elasticdeform_tpu import api
    x = _cimg((14, 13))
    c = RNG.random((2, 6, 7)) * 14 - 1
    y = api.map_coordinates(x, c, order=3, mode="constant", cval=2 - 3j)
    ys = ndi.map_coordinates(x, c, order=3, mode="constant", cval=2 - 3j)
    np.testing.assert_allclose(y, ys, rtol=1e-10, atol=1e-10)
    # adjoint identity with cval=0 (the adjoint maps the linear part only)
    y0 = api.map_coordinates(x, c, order=3, mode="constant", cval=0.0)
    dy = _cimg(y0.shape)
    dx = api.map_coordinates_gradient(dy, c, order=3, mode="constant",
                                      cval=0.0, X_shape=x.shape)
    lhs = np.vdot(dy, y0).real
    rhs = np.vdot(dx, x).real
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)


def test_tf_shim_complex_roundtrip():
    tf = pytest.importorskip("tensorflow")
    import elasticdeform_tpu.tf as edtf
    x_np = _cimg((11, 12), np.complex64)
    d = RNG.standard_normal((2, 3, 3)) * 2
    x = tf.constant(x_np)
    with tf.GradientTape() as tape:
        tape.watch(x)
        y = edtf.deform_grid(x, tf.constant(d), order=3, mode="mirror")
        loss = tf.reduce_sum(tf.math.real(y) + tf.math.imag(y))
    want = np.asarray(ed.deform_grid(x_np, d, order=3, mode="mirror"))
    np.testing.assert_allclose(y.numpy(), want, rtol=1e-6, atol=1e-6)
    g = tape.gradient(loss, x)
    assert g is not None and np.isfinite(g.numpy()).all()


def test_native_host_complex():
    from elasticdeform_tpu import native
    if not native.available():
        pytest.skip("native host kernel unavailable")
    x = _cimg((13, 12))
    d = RNG.standard_normal((2, 3, 3)) * 2
    y = native.deform_grid(x, d, order=3, mode="constant", cval=1 + 2j)
    want = np.asarray(ed.deform_grid(x, d, order=3, mode="constant",
                                     cval=1 + 2j))
    np.testing.assert_allclose(y, want, rtol=1e-10, atol=1e-10)
    dy = _cimg(y.shape)
    dx = native.deform_grid_gradient(dy, d, order=3, mode="constant",
                                     cval=1 + 2j, X_shape=x.shape)
    lhs = np.vdot(dy, y).real
    # constant-mode cval contributes an affine offset; compare against
    # the zero-cval linear part for the adjoint identity instead
    y0 = native.deform_grid(x, d, order=3, mode="constant", cval=0.0)
    lhs = np.vdot(dy, y0).real
    rhs = np.vdot(dx, x).real
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)
    c = RNG.random((2, 6, 7)) * 10
    ym = native.map_coordinates(x, c, order=3, mode="mirror")
    ws = ndi.map_coordinates(x, c, order=3, mode="mirror")
    np.testing.assert_allclose(ym, ws, rtol=1e-10, atol=1e-10)
    dym = _cimg(ym.shape)
    dxm = native.map_coordinates_gradient(dym, c, order=3, mode="mirror",
                                          X_shape=x.shape)
    np.testing.assert_allclose(np.vdot(dym, ym).real,
                               np.vdot(dxm, x).real, rtol=1e-10)


def test_torch_shim_complex_roundtrip():
    torch = pytest.importorskip("torch")
    import elasticdeform_tpu.torch as edt
    x_np = _cimg((12, 11), np.complex64)
    d = RNG.standard_normal((2, 3, 3)) * 2
    x = torch.tensor(x_np, requires_grad=True)
    y = edt.deform_grid(x, torch.tensor(d), order=3, mode="mirror")
    want = np.asarray(ed.deform_grid(x_np, d, order=3, mode="mirror"))
    np.testing.assert_allclose(y.detach().numpy(), want, rtol=1e-6,
                               atol=1e-6)
    # backward: real inner-product adjoint through torch autograd
    dy = torch.tensor(_cimg(y.shape, np.complex64))
    y.backward(dy)
    dx_want = np.asarray(ed.deform_grid_gradient(
        dy.numpy(), d, order=3, mode="mirror", X_shape=x_np.shape))
    # for an R-linear operator with real coefficients, torch's Wirtinger
    # convention reduces to x.grad = A^T y.grad — the plain linear
    # transpose, exactly what the shim passes through
    np.testing.assert_allclose(x.grad.numpy(), dx_want, rtol=1e-5,
                               atol=1e-5)


def test_displacement_gradient_through_complex_input():
    """The library's headline beyond-reference feature (gradients w.r.t.
    the displacement grid) must flow through complex inputs: below the
    real/imag channel split everything is real, so the d_cc branch works
    unchanged."""
    x = jnp.asarray(_cimg((14, 13)))
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)) * 2)

    def loss(dd):
        y = core.deform(x, dd, order=3, mode="mirror")
        return jnp.sum(jnp.abs(y) ** 2)

    g = jax.grad(loss)(d)
    eps = 1e-6
    for idx in [(1, 2, 0), (0, 0, 1)]:
        fd = (loss(d.at[idx].add(eps))
              - loss(d.at[idx].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=1e-6)


@pytest.mark.slow
def test_sharded_deform_complex_mesh():
    """Complex batches shard over a mesh like real ones: the in-pipeline
    real/imag channel split is shard_map-transparent (all-static shapes,
    no collectives)."""
    from jax.sharding import Mesh
    from elasticdeform_tpu import parallel
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    n = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), ("batch",))
    x = jnp.asarray(_cimg((n, 24, 20)))
    D = jnp.asarray(RNG.standard_normal((n, 2, 3, 3)) * 2)
    y = parallel.sharded_deform(mesh, x, D, order=3, mode="mirror")
    w = core.deform_batch(x, D, order=3, mode="mirror")
    np.testing.assert_allclose(np.asarray(y), np.asarray(w), rtol=1e-12,
                               atol=1e-12)


def test_api_complex_tuple_params_and_shared_axis():
    """Per-input tuples (order/mode/cval) and the SHARED-axis tuple both
    survive the complex expansion: tuples are per-input for order/mode/
    cval but one shared selection for axis."""
    img = _cimg((10, 12, 2), np.complex64)     # trailing channel axis
    seg = (RNG.random((10, 12)) * 3).astype(np.uint8)
    d = RNG.standard_normal((2, 3, 3)) * 2
    yi, ys = ed.deform_grid([img, seg], d, order=(3, 0),
                            mode=("mirror", "nearest"), cval=(0.0, 0.0),
                            axis=[(0, 1), (0, 1)])
    assert yi.dtype == np.complex64 and ys.dtype == np.uint8
    want = np.asarray(ed.deform_grid(img.real.copy(), d, order=3,
                                     mode="mirror", axis=(0, 1)))
    np.testing.assert_array_equal(np.asarray(yi).real, want)
    # shared tuple axis with a single complex input
    y1 = ed.deform_grid(img, d, order=3, mode="mirror", axis=(0, 1))
    np.testing.assert_array_equal(np.asarray(y1).real, want)


def test_api_complex_wrong_length_lists_still_raise():
    """The expansion must not let a wrong-length per-input list slip
    through by coincidentally matching the expanded input count."""
    img = _cimg((8, 9), np.complex64)
    seg = RNG.random((8, 9))
    d = RNG.standard_normal((2, 3, 3))
    with pytest.raises(AssertionError, match="Number of order"):
        ed.deform_grid([img, seg], d, order=[3, 0, 1])
    with pytest.raises(AssertionError, match="Number of cval"):
        ed.deform_grid([img, seg], d, mode="constant", cval=[0.0, 1.0, 2.0])
