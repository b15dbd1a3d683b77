"""Unit tests for the spline-math building blocks."""

import numpy as np
import scipy.ndimage
import pytest

import elasticdeform_tpu as ed

from elasticdeform_tpu.ops.prefilter import (
    filter_matrix, spline_filter1d, spline_filter1d_transpose,
    spline_filter1d_np, spline_poles,
)
from elasticdeform_tpu.ops.bspline import spline_weights_np
from elasticdeform_tpu.ops.modes import (
    map_coordinate_np, mirror_index_np, mode_to_code,
)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 100])
@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_filter_matrix_matches_scipy(n, order):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 5))
    ref = scipy.ndimage.spline_filter1d(x, order=order, axis=0)
    np.testing.assert_allclose(filter_matrix(n, order) @ x, ref,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(spline_filter1d_np(x, order, 0), ref,
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_filter_device_and_transpose(order):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((13, 7))
    y = rng.standard_normal((13, 7))
    fx = np.asarray(spline_filter1d(x, order, 0))
    ref = scipy.ndimage.spline_filter1d(x, order=order, axis=0)
    np.testing.assert_allclose(fx, ref, rtol=1e-10, atol=1e-10)
    # adjoint identity <F x, y> == <x, F^T y>
    fty = np.asarray(spline_filter1d_transpose(y, order, 0))
    np.testing.assert_allclose(np.vdot(fx, y), np.vdot(x, fty), rtol=1e-12)


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5])
def test_weights_partition_of_unity(order):
    cc = np.linspace(-3.3, 12.7, 201)
    w = spline_weights_np(cc, order)
    np.testing.assert_allclose(w.sum(axis=0), 1.0, atol=1e-12)
    assert w.shape[0] == order + 1


@pytest.mark.parametrize("order", [1, 2, 3])
def test_weights_match_scipy_interpolation(order):
    # interpolating with our weights at integer-offset taps must reproduce
    # scipy.ndimage.map_coordinates on interior coordinates
    rng = np.random.default_rng(2)
    n = 30
    x = rng.standard_normal(n)
    cc = np.linspace(5.0, n - 6.0, 40)
    from elasticdeform_tpu.ops.bspline import filter_start
    start = filter_start(cc, order, xp=np).astype(int)
    w = spline_weights_np(cc, order)
    coeffs = scipy.ndimage.spline_filter1d(x, order=order) if order > 1 else x
    mine = sum(w[l] * coeffs[start + l] for l in range(order + 1))
    ref = scipy.ndimage.map_coordinates(x, [cc], order=order)
    np.testing.assert_allclose(mine, ref, rtol=1e-10, atol=1e-12)


def test_mirror_index_fold():
    n = 5
    idx = np.arange(-13, 13)
    folded = mirror_index_np(idx, n)
    assert folded.min() >= 0 and folded.max() <= n - 1
    # mirror period 2n-2: explicit small cases
    np.testing.assert_array_equal(mirror_index_np(np.array([-2, -1, 0, 4, 5, 6]), 5),
                                  np.array([2, 1, 0, 4, 3, 2]))
    np.testing.assert_array_equal(mirror_index_np(np.array([-3, 7]), 1),
                                  np.array([0, 0]))


@pytest.mark.parametrize("mode", ["nearest", "wrap", "reflect", "mirror"])
def test_map_coordinate_in_range(mode):
    code = mode_to_code(mode)
    cc = np.linspace(-17.3, 25.9, 500)
    for n in (2, 3, 8):
        mapped, inside = map_coordinate_np(cc, n, code)
        assert inside.all()
        # pre-1.6 semantics leave at most a 1-wide fringe
        assert mapped.min() > -1.0 - 1e-9
        assert mapped.max() < n + 1e-9
        # in-range coordinates pass through untouched
        mid = (cc >= 0) & (cc <= n - 1)
        np.testing.assert_array_equal(mapped[mid], cc[mid])


def test_map_coordinate_wrap_period():
    # pre-SciPy-1.6 wrap uses period len-1 (reference deform.c:75-79)
    n = 6
    cc = np.array([-0.5, -5.5, 5.5, 10.5])
    mapped, _ = map_coordinate_np(cc, n, mode_to_code("wrap"))
    np.testing.assert_allclose(mapped, [4.5, 4.5, 0.5, 0.5])


def test_poles_match_reference_values():
    np.testing.assert_allclose(spline_poles(3)[0], np.sqrt(3) - 2)
    np.testing.assert_allclose(spline_poles(2)[0], np.sqrt(8) - 3)
    assert len(spline_poles(4)) == 2 and len(spline_poles(5)) == 2


@pytest.mark.parametrize("case", [
    # (padded_spatial, widths, strides, n_lead, C, nbatch, batched)
    ((20, 20, 24), (4, 4, 8), (1, 1, 5), 0, 1, 3, True),
    ((20, 20, 24), (4, 4, 8), (1, 1, 5), 0, 2, 1, False),
    ((36, 40), (4, 32), (1, 29), 0, 1, 2, True),
    ((36, 40), (8, 16), (4, 12), 0, 3, 1, False),
    ((18, 24, 28), (8, 16), (4, 12), 1, 1, 2, True),
    ((140,), (128,), (123,), 0, 1, 1, False),
])
def test_fold_v2_matches_reference_fold(case):
    """The lane-space fold (_fold_table_v2) equals the original per-axis
    contraction fold on every plan shape."""
    import jax.numpy as jnp
    from elasticdeform_tpu.ops import windows as W

    spatial, widths, strides, n_lead, C, nb, batched = case
    rng = np.random.default_rng(42)
    nw = len(spatial) - n_lead
    counts = [(spatial[n_lead + k] - widths[k]) // strides[k] + 1
              for k in range(nw)]
    lead = int(np.prod(spatial[:n_lead])) if n_lead else 1
    rows = nb * lead * int(np.prod(counts))
    lanes = int(np.prod(widths))
    ct = jnp.asarray(rng.random((rows, C * lanes)))
    a = W._fold_table(ct, spatial, widths, strides, n_lead, C, nb, batched)
    b = W._fold_table_v2(ct, spatial, widths, strides, n_lead, C, nb,
                         batched)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12)


def test_onehot_bf16x3_matches_highest(monkeypatch):
    """The 3-pass bf16 split of the one-hot contractions (table build,
    z-fold, per-axis folds) reproduces the HIGHEST-precision f32 results:
    the table bit-exactly, the overlap-add folds to a few f32 ulps."""
    import jax.numpy as jnp
    from elasticdeform_tpu.ops import windows as W

    rng = np.random.default_rng(7)
    padded = (20, 21, 22)
    p = W._make_params(padded, 2, 3, 3, 3, (12, 12, 12), "float32", 2)
    xp = jnp.asarray(rng.standard_normal((3, *padded, 2)).astype(np.float32))
    cc = jnp.asarray((rng.random((3 * 12 ** 3, 3)) * 11).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((3 * 12 ** 3, 2)).astype(np.float32))

    results = {}
    for flag in ("1", "0"):
        monkeypatch.setattr(W, "_BF16X3", flag)
        table, _ = W._build_table_impl(xp, p.widths, p.strides, p.n_lead,
                                       True)
        out = W._windows_op(xp, cc, p, padded, True)
        dxp = W._scatter_fold(g, cc, p, padded, True)
        results[flag] = (np.asarray(table), np.asarray(out), np.asarray(dxp))

    t1, o1, d1 = results["1"]
    t0, o0, d0 = results["0"]
    np.testing.assert_array_equal(t1, t0)  # one pick per output: bit-exact
    np.testing.assert_allclose(o1, o0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-5)


def test_split_bf16x3_elision_proof():
    """The bf16x3 split must round through ``lax.reduce_precision``.

    Written as plain f32->bf16->f32 casts, XLA's excess-precision pass on
    TPU elides the round-trip, the residual parts collapse to zero, and the
    "exact" 3-pass table build silently degrades to single-pass bf16
    (~2^-9 output error — a real regression caught on hardware). Guard
    both the reconstruction identity and the HLO form so a revert to casts
    fails even on backends that do not elide.
    """
    import jax
    import jax.numpy as jnp
    from elasticdeform_tpu.ops import windows as W

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    fn = jax.jit(W._split_bf16x3)
    hi, mid, lo = [np.asarray(v, np.float64) for v in fn(x)]
    np.testing.assert_array_equal(hi + mid + lo,
                                  np.asarray(x, np.float64))
    # the parts must be genuinely bf16-sized (broken split: mid = lo = 0)
    assert np.abs(mid).max() > 0 and np.abs(lo).max() > 0
    hlo = fn.lower(x).as_text()
    assert "reduce_precision" in hlo


def test_spline_filter_select_fuses_pad_exactly():
    """filter-then-pad == the fused row-selected filter matmul, bitwise:
    selecting rows of F only duplicates inner products."""
    import jax.numpy as jnp
    from elasticdeform_tpu.ops.prefilter import (
        spline_filter1d, spline_filter1d_select)
    from elasticdeform_tpu.ops.windows import (
        window_pad_indices, window_pad_axis)
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.random((17, 23)).astype(np.float32))
    for order, axis, pad, extra in [(3, 0, 2, 8), (3, 1, 2, 16),
                                    (5, 0, 3, 8), (2, 1, 1, 4)]:
        idx = window_pad_indices(x.shape[axis], pad, extra)
        fused = spline_filter1d_select(x, order, axis, idx)
        staged = window_pad_axis(spline_filter1d(x, order, axis),
                                 axis, pad, extra)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(staged))


def test_displacement_field_ramp_identity():
    """Interpolating a linear coordinate ramp at the displaced positions
    returns (coordinate + displacement): deform(ramp_h, d, order=1)[v]
    == v_h + displacement_field(d, shape)[h, v] wherever the displaced
    coordinate stays inside the image."""
    import jax.numpy as jnp
    rng = np.random.default_rng(61)
    shape = (24, 31)
    d = rng.standard_normal((2, 3, 3)) * 3
    field = np.asarray(ed.displacement_field(d, shape))
    assert field.shape == (2, *shape)
    coords = np.stack(np.meshgrid(*[np.arange(n, dtype=float) for n in shape],
                                  indexing='ij'))
    displaced = coords + field
    inside = np.ones(shape, dtype=bool)
    for h, n in enumerate(shape):
        inside &= (displaced[h] >= 0) & (displaced[h] <= n - 1)
    for h in range(2):
        ramp = coords[h]
        out = np.asarray(ed.deform(ramp, d, order=1, mode='mirror'))
        np.testing.assert_allclose(out[inside], displaced[h][inside],
                                   rtol=1e-9, atol=1e-9)


def test_displacement_field_crop_and_grad():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(62)
    shape = (20, 18)
    d = jnp.asarray(rng.standard_normal((2, 3, 3)) * 4)
    full = np.asarray(ed.displacement_field(d, shape))
    crop = [slice(5, 15), slice(2, 9)]
    part = np.asarray(ed.displacement_field(d, shape, crop=crop))
    np.testing.assert_allclose(part, full[:, 5:15, 2:9], rtol=1e-12,
                               atol=1e-12)
    g = jax.grad(lambda dd: ed.displacement_field(dd, shape).sum())(d)
    assert g.shape == d.shape and bool(jnp.isfinite(g).all())
    with np.testing.assert_raises(ValueError):
        ed.displacement_field(rng.standard_normal((3, 3, 3)), shape)
