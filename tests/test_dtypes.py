"""Half-precision input coverage: bfloat16 / float16 end-to-end.

TPU training pipelines feed bf16 images (and mixed [bf16 image, uint8
label] pairs); the reference's dtype matrix (deform.c:271-338) covers
numpy dtypes only, so this is TPU-native surface. Contract: compute runs
in float32 (the compute dtype never narrows below f32), the output comes
back in the input dtype, values match the f32 pipeline at the dtype's
resolution, and gradients flow with the input's dtype.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

RNG = np.random.default_rng(5)

HALF_DTYPES = [jnp.bfloat16, jnp.float16]
# resolution: bf16 has 8 mantissa bits, f16 has 11
TOL = {jnp.bfloat16: 2e-2, jnp.float16: 4e-3}


@pytest.mark.parametrize("dtype", HALF_DTYPES)
@pytest.mark.parametrize("order,mode,prefilter", [
    (0, "nearest", True), (1, "constant", True),
    (3, "mirror", True), (3, "wrap", False), (5, "reflect", True),
])
def test_single_half_matches_f32(dtype, order, mode, prefilter):
    X = RNG.random((24, 20)).astype(np.float32)
    d = RNG.standard_normal((2, 3, 3)).astype(np.float32) * 3
    ref = ed.deform(jnp.asarray(X), jnp.asarray(d), order=order, mode=mode,
                    prefilter=prefilter)
    out = ed.deform(jnp.asarray(X, dtype=dtype), jnp.asarray(d),
                    order=order, mode=mode, prefilter=prefilter)
    assert out.dtype == dtype
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=TOL[dtype], atol=TOL[dtype])


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_single_half_3d_crop(dtype):
    X = RNG.random((16, 14, 12)).astype(np.float32)
    d = RNG.standard_normal((3, 3, 3, 3)).astype(np.float32) * 2
    crop = (slice(2, 12), slice(1, 11), slice(None))
    ref = ed.deform(jnp.asarray(X), jnp.asarray(d), order=3, mode="mirror",
                    crop=crop)
    out = ed.deform(jnp.asarray(X, dtype=dtype), jnp.asarray(d), order=3,
                    mode="mirror", crop=crop)
    assert out.dtype == dtype and out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=TOL[dtype], atol=TOL[dtype])


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_batched_half(dtype):
    B = 3
    X = RNG.random((B, 12, 14)).astype(np.float32)
    D = RNG.standard_normal((B, 2, 3, 3)).astype(np.float32) * 3
    ref = ed.deform_batch(jnp.asarray(X), jnp.asarray(D), order=3,
                          mode="mirror")
    out = ed.deform_batch(jnp.asarray(X, dtype=dtype), jnp.asarray(D),
                          order=3, mode="mirror")
    assert out.dtype == dtype
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=TOL[dtype], atol=TOL[dtype])


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_half_gradients(dtype):
    """Input gradients come back in the input dtype (JAX's cotangent
    contract), finite, and matching the f32 gradient at dtype resolution;
    batched too."""
    X = RNG.random((18, 16)).astype(np.float32)
    d = jnp.asarray(RNG.standard_normal((2, 3, 3)).astype(np.float32) * 3)

    def loss(x):
        y = ed.deform(x, d, order=3, mode="mirror")
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss)(jnp.asarray(X))
    g = jax.grad(loss)(jnp.asarray(X, dtype=dtype))
    assert g.dtype == dtype and g.shape == X.shape
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref),
                               rtol=4e-2, atol=4e-2)

    B = 2
    XB = jnp.asarray(RNG.random((B, 10, 12)).astype(np.float32), dtype=dtype)
    DB = jnp.asarray(RNG.standard_normal((B, 2, 3, 3)).astype(np.float32))
    gb = jax.grad(lambda x: jnp.sum(ed.deform_batch(
        x, DB, order=3, mode="mirror").astype(jnp.float32) ** 2))(XB)
    assert gb.dtype == dtype and gb.shape == XB.shape
    assert bool(jnp.all(jnp.isfinite(gb.astype(jnp.float32))))


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_half_image_with_uint8_labels(dtype):
    """Mixed multi-input: half-precision image + uint8 segmentation in one
    call — the uint8 companion keeps the reference's exact integer
    round/clamp writeback (deform.c:287-306) while the half input casts
    plainly."""
    img = RNG.random((20, 22)).astype(np.float32)
    seg = RNG.integers(0, 255, (20, 22)).astype(np.uint8)
    d = RNG.standard_normal((2, 3, 3)).astype(np.float32) * 3
    ref_img, ref_seg = ed.deform(
        [jnp.asarray(img), jnp.asarray(seg)], jnp.asarray(d),
        order=[3, 0], mode="mirror")
    out_img, out_seg = ed.deform(
        [jnp.asarray(img, dtype=dtype), jnp.asarray(seg)], jnp.asarray(d),
        order=[3, 0], mode="mirror")
    assert out_img.dtype == dtype and out_seg.dtype == np.uint8
    np.testing.assert_array_equal(np.asarray(out_seg), np.asarray(ref_seg))
    np.testing.assert_allclose(np.asarray(out_img, np.float32),
                               np.asarray(ref_img),
                               rtol=TOL[dtype], atol=TOL[dtype])


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_half_uint8_prefiltered_multi(dtype):
    """order>1 uint8 WITH prefilter next to a half image: the integer
    prefilter writeback (C truncate+wrap between axes) must stay bit-
    identical to the all-f32 call's uint8 result."""
    img = RNG.random((16, 18)).astype(np.float32)
    seg = RNG.integers(0, 255, (16, 18)).astype(np.uint8)
    d = RNG.standard_normal((2, 3, 3)).astype(np.float32) * 2
    _, ref_seg = ed.deform([jnp.asarray(img), jnp.asarray(seg)],
                           jnp.asarray(d), order=[3, 2], mode="mirror")
    _, out_seg = ed.deform([jnp.asarray(img, dtype=dtype), jnp.asarray(seg)],
                           jnp.asarray(d), order=[3, 2], mode="mirror")
    np.testing.assert_array_equal(np.asarray(out_seg), np.asarray(ref_seg))


@pytest.mark.parametrize("dtype", HALF_DTYPES)
def test_map_coordinates_half(dtype):
    X = RNG.random((20, 24)).astype(np.float32)
    coords = np.stack([RNG.uniform(-2, n + 1, size=(9, 11))
                       for n in (19, 23)]).astype(np.float32)
    ref = ed.map_coordinates(jnp.asarray(X), jnp.asarray(coords), order=3,
                             mode="mirror")
    out = ed.map_coordinates(jnp.asarray(X, dtype=dtype),
                             jnp.asarray(coords), order=3, mode="mirror")
    assert out.dtype == dtype
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=TOL[dtype], atol=TOL[dtype])


def test_torch_shim_bfloat16():
    torch = pytest.importorskip("torch")
    import elasticdeform_tpu.torch as edt

    x32 = torch.rand(18, 16, dtype=torch.float32)
    d = torch.randn(2, 3, 3, dtype=torch.float32) * 3
    ref = edt.deform_grid(x32, d, order=3, mode="mirror")

    x = x32.to(torch.bfloat16).requires_grad_(True)
    y = edt.deform_grid(x, d, order=3, mode="mirror")
    assert y.dtype == torch.bfloat16 and y.shape == x.shape
    np.testing.assert_allclose(y.detach().float().numpy(),
                               ref.detach().float().numpy(),
                               rtol=2e-2, atol=2e-2)
    y.float().pow(2).sum().backward()
    assert x.grad is not None and x.grad.shape == x.shape
    assert bool(torch.isfinite(x.grad.float()).all())


def test_tf_shim_bfloat16():
    tf = pytest.importorskip("tensorflow")
    import elasticdeform_tpu.tf as edtf

    rng = np.random.default_rng(9)
    x32 = rng.random((14, 16)).astype(np.float32)
    d = rng.standard_normal((2, 3, 3)).astype(np.float32) * 3
    ref = edtf.deform_grid(tf.constant(x32), tf.constant(d),
                           order=3, mode="mirror")
    xb = tf.constant(x32, dtype=tf.bfloat16)
    with tf.GradientTape() as tape:
        tape.watch(xb)
        y = edtf.deform_grid(xb, tf.constant(d), order=3, mode="mirror")
        loss = tf.reduce_sum(tf.cast(y, tf.float32) ** 2)
    assert y.dtype == tf.bfloat16
    np.testing.assert_allclose(tf.cast(y, tf.float32).numpy(),
                               ref.numpy().astype(np.float32),
                               rtol=2e-2, atol=2e-2)
    g = tape.gradient(loss, xb)
    assert g is not None and g.shape == xb.shape
    assert bool(np.isfinite(tf.cast(g, tf.float32).numpy()).all())
