"""Differential tests vs scipy.ndimage for the order-statistic filter
and morphology tier (N-D correlate/convolve, min/max/rank/median/
percentile filters, grey + binary morphology).

scipy is the oracle throughout — these APIs are beyond the reference
library's scope (it has no filtering at all); tolerances are fp-exact
for the order-statistic/Boolean ops (no arithmetic is performed) and
1e-12 for the linear convolutions.
"""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed

MODES = ['reflect', 'constant', 'nearest', 'mirror', 'wrap']


@pytest.fixture
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# N-D correlate / convolve


@pytest.mark.parametrize('mode', MODES)
def test_correlate_nd_matches_scipy(rng, mode):
    x = rng.standard_normal((12, 15))
    w = rng.standard_normal((3, 5))
    want = scipy.ndimage.correlate(x, w, mode=mode, cval=0.4)
    got = ed.correlate(jnp.asarray(x), w, mode=mode, cval=0.4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)
    want = scipy.ndimage.convolve(x, w, mode=mode, cval=0.4)
    got = ed.convolve(jnp.asarray(x), w, mode=mode, cval=0.4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.parametrize('origin', [(0, 0, 0), (1, 0, -1)])
def test_correlate_3d_origin(rng, origin):
    x = rng.standard_normal((7, 8, 9))
    w = rng.standard_normal((3, 2, 3))       # even axis included
    want = scipy.ndimage.correlate(x, w, mode='nearest', origin=origin)
    got = ed.correlate(jnp.asarray(x), w, mode='nearest', origin=origin)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)
    want = scipy.ndimage.convolve(x, w, mode='nearest', origin=origin)
    got = ed.convolve(jnp.asarray(x), w, mode='nearest', origin=origin)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                               atol=1e-12)


def test_correlate_kernel_larger_than_axis(rng):
    x = rng.standard_normal((4, 5))
    w = rng.standard_normal((7, 3))
    for mode in MODES:
        want = scipy.ndimage.correlate(x, w, mode=mode, cval=1.5)
        got = ed.correlate(jnp.asarray(x), w, mode=mode, cval=1.5)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-11,
                                   atol=1e-11, err_msg=mode)


def test_correlate_adjoint_and_jit(rng):
    x = jnp.asarray(rng.standard_normal((10, 11)))
    y = jnp.asarray(rng.standard_normal((10, 11)))
    w = rng.standard_normal((3, 3))
    f = jax.jit(lambda a: ed.correlate(a, w, mode='wrap'))
    gx = f(x)
    (xt,) = jax.vjp(f, x)[1](y)
    np.testing.assert_allclose(float(jnp.vdot(gx, y)),
                               float(jnp.vdot(x, xt)), rtol=1e-12)


def test_correlate_validation(rng):
    with pytest.raises(RuntimeError, match='incorrect shape'):
        ed.correlate(jnp.zeros((4, 4)), np.ones(3))
    with pytest.raises(ValueError, match='invalid origin'):
        ed.correlate(jnp.zeros((4, 4)), np.ones((3, 3)), origin=(0, 9))


def test_correlate_internal_strategies_agree(rng, monkeypatch):
    # apply_correlate routes between a banded-matmul path, an unrolled
    # tap-stack, and XLA's conv primitive by static size gates; all
    # three must agree to fp round-off on the same inputs
    from elasticdeform_tpu.ops import filters as F
    x = rng.standard_normal((7, 9, 11))
    w = rng.standard_normal((3, 4, 3))
    for mode, cval, origin in [("reflect", 0.0, 0),
                               ("constant", 1.25, (1, -1, 0)),
                               ("wrap", 0.0, 0), ("nearest", 0.0, 0),
                               ("mirror", 0.0, (0, 1, 1))]:
        outs = {}
        for name, (mat, taps, onedot) in {
                "matmul": (64 << 20, 4096, False),
                "onedot": (64 << 20, 4096, True),
                "tapstack": (0, 4096, False),
                "conv": (0, 0, False)}.items():
            monkeypatch.setattr(F, "_CORRELATE_MATMUL_BYTES", mat)
            monkeypatch.setattr(F, "_CORRELATE_UNROLL_TAPS", taps)
            if onedot:
                monkeypatch.setenv(
                    "ELASTICDEFORM_TPU_CORRELATE_ONEDOT", "1")
            else:
                monkeypatch.delenv(
                    "ELASTICDEFORM_TPU_CORRELATE_ONEDOT", raising=False)
            outs[name] = np.asarray(ed.correlate(
                jnp.asarray(x), w, mode=mode, cval=cval, origin=origin))
        for name in ("onedot", "tapstack", "conv"):
            np.testing.assert_allclose(outs[name], outs["matmul"],
                                       rtol=1e-12, atol=1e-12,
                                       err_msg=f"{name} {mode}")


# ---------------------------------------------------------------------------
# minimum / maximum filters


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('size', [2, 3, 5])
def test_min_max_filter1d(rng, size, mode):
    x = rng.standard_normal((9, 13))
    for sp, ours in [(scipy.ndimage.minimum_filter1d, ed.minimum_filter1d),
                     (scipy.ndimage.maximum_filter1d, ed.maximum_filter1d)]:
        want = sp(x, size, axis=1, mode=mode, cval=0.25)
        got = ours(jnp.asarray(x), size, axis=1, mode=mode, cval=0.25)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_min_max_filter1d_origin_and_int_dtype(rng):
    x = rng.integers(-50, 50, size=(11, 12)).astype(np.int32)
    for origin in (-1, 0, 1):
        want = scipy.ndimage.minimum_filter1d(x, 4, axis=0, origin=origin)
        got = ed.minimum_filter1d(jnp.asarray(x), 4, axis=0, origin=origin)
        assert np.asarray(got).dtype == np.int32
        np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize('mode', MODES)
def test_min_max_filter_separable(rng, mode):
    x = rng.standard_normal((10, 11, 6))
    for sp, ours in [(scipy.ndimage.minimum_filter, ed.minimum_filter),
                     (scipy.ndimage.maximum_filter, ed.maximum_filter)]:
        want = sp(x, size=(3, 4, 2), mode=mode, cval=-0.7,
                  origin=(0, 1, 0))
        got = ours(jnp.asarray(x), size=(3, 4, 2), mode=mode, cval=-0.7,
                   origin=(0, 1, 0))
        np.testing.assert_array_equal(np.asarray(got), want)


def test_min_max_filter_footprint(rng):
    x = rng.standard_normal((12, 13))
    fp = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool)
    for mode in MODES:
        want = scipy.ndimage.minimum_filter(x, footprint=fp, mode=mode,
                                            cval=0.1)
        got = ed.minimum_filter(jnp.asarray(x), footprint=fp, mode=mode,
                                cval=0.1)
        np.testing.assert_array_equal(np.asarray(got), want)
        want = scipy.ndimage.maximum_filter(x, footprint=fp, mode=mode,
                                            cval=0.1)
        got = ed.maximum_filter(jnp.asarray(x), footprint=fp, mode=mode,
                                cval=0.1)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_min_max_filter_axes_param(rng):
    x = rng.standard_normal((6, 7, 8))
    want = scipy.ndimage.minimum_filter(x, size=3, axes=(0, 2))
    got = ed.minimum_filter(jnp.asarray(x), size=3, axes=(0, 2))
    np.testing.assert_array_equal(np.asarray(got), want)
    fp = np.array([[True, True], [False, True]])
    want = scipy.ndimage.maximum_filter(x, footprint=fp, axes=(1, 2))
    got = ed.maximum_filter(jnp.asarray(x), footprint=fp, axes=(1, 2))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_min_max_filter_per_axis_modes(rng):
    x = rng.standard_normal((9, 10))
    want = scipy.ndimage.minimum_filter(x, size=(3, 4),
                                        mode=['reflect', 'wrap'])
    got = ed.minimum_filter(jnp.asarray(x), size=(3, 4),
                            mode=['reflect', 'wrap'])
    np.testing.assert_array_equal(np.asarray(got), want)


def test_min_max_filter_validation():
    x = jnp.zeros((5, 5))
    with pytest.raises(RuntimeError, match='no footprint'):
        ed.minimum_filter(x)
    with pytest.raises(ValueError, match='All-zero footprint'):
        ed.minimum_filter(x, footprint=np.zeros((3, 3), bool))
    with pytest.raises(ValueError, match='invalid origin'):
        ed.minimum_filter(x, size=3, origin=4)


# ---------------------------------------------------------------------------
# rank / median / percentile


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('rank', [1, 3, -2])
def test_rank_filter(rng, rank, mode):
    x = rng.standard_normal((10, 12))
    want = scipy.ndimage.rank_filter(x, rank, size=3, mode=mode, cval=0.6)
    got = ed.rank_filter(jnp.asarray(x), rank, size=3, mode=mode, cval=0.6)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_rank_filter_short_circuits(rng):
    x = rng.standard_normal((8, 9))
    np.testing.assert_array_equal(
        np.asarray(ed.rank_filter(jnp.asarray(x), 0, size=3)),
        scipy.ndimage.rank_filter(x, 0, size=3))
    np.testing.assert_array_equal(
        np.asarray(ed.rank_filter(jnp.asarray(x), 8, size=3)),
        scipy.ndimage.rank_filter(x, 8, size=3))


@pytest.mark.parametrize('size', [3, (3, 5)])
def test_median_filter(rng, size):
    x = rng.standard_normal((11, 14))
    want = scipy.ndimage.median_filter(x, size)
    got = ed.median_filter(jnp.asarray(x), size)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_median_filter_footprint_3d(rng):
    x = rng.standard_normal((7, 8, 6))
    fp = scipy.ndimage.generate_binary_structure(3, 1)
    want = scipy.ndimage.median_filter(x, footprint=fp, mode='nearest')
    got = ed.median_filter(jnp.asarray(x), footprint=fp, mode='nearest')
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize('percentile', [0, 10, 33.3, 50, 90, 100, -25])
def test_percentile_filter(rng, percentile):
    x = rng.standard_normal((10, 11))
    want = scipy.ndimage.percentile_filter(x, percentile, size=4)
    got = ed.percentile_filter(jnp.asarray(x), percentile, size=4)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_rank_filter_validation(rng):
    x = jnp.zeros((6, 6))
    with pytest.raises(RuntimeError, match='rank not within'):
        ed.rank_filter(x, 9, size=3)
    with pytest.raises(RuntimeError, match='invalid percentile'):
        ed.percentile_filter(x, 150.0, size=3)


def test_median_filter_jit_vmap(rng):
    x = jnp.asarray(rng.standard_normal((4, 9, 9)), jnp.float32)
    f = jax.jit(jax.vmap(lambda a: ed.median_filter(a, 3)))
    got = np.asarray(f(x))
    for i in range(4):
        want = scipy.ndimage.median_filter(
            np.asarray(x[i], np.float32), 3)
        np.testing.assert_array_equal(got[i], want)


# ---------------------------------------------------------------------------
# grey morphology


@pytest.mark.parametrize('mode', MODES)
def test_grey_erosion_dilation_flat(rng, mode):
    x = rng.standard_normal((9, 10))
    for sp, ours in [(scipy.ndimage.grey_erosion, ed.grey_erosion),
                     (scipy.ndimage.grey_dilation, ed.grey_dilation)]:
        want = sp(x, size=(3, 4), mode=mode, cval=0.2, origin=(1, 0))
        got = ours(jnp.asarray(x), size=(3, 4), mode=mode, cval=0.2,
                   origin=(1, 0))
        np.testing.assert_array_equal(np.asarray(got), want)


def test_grey_erosion_dilation_structure(rng):
    x = rng.standard_normal((10, 11))
    structure = rng.standard_normal((3, 3))
    fp = np.array([[1, 0, 1], [1, 1, 1], [0, 1, 0]], bool)
    for sp, ours in [(scipy.ndimage.grey_erosion, ed.grey_erosion),
                     (scipy.ndimage.grey_dilation, ed.grey_dilation)]:
        want = sp(x, structure=structure, mode='nearest')
        got = ours(jnp.asarray(x), structure=structure, mode='nearest')
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-6)
        want = sp(x, footprint=fp, structure=structure, mode='reflect')
        got = ours(jnp.asarray(x), footprint=fp, structure=structure,
                   mode='reflect')
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                                   atol=1e-6)


def test_grey_composites(rng):
    x = rng.standard_normal((12, 13))
    for sp, ours in [
            (scipy.ndimage.grey_opening, ed.grey_opening),
            (scipy.ndimage.grey_closing, ed.grey_closing),
            (scipy.ndimage.morphological_gradient,
             ed.morphological_gradient),
            (scipy.ndimage.morphological_laplace,
             ed.morphological_laplace),
            (scipy.ndimage.white_tophat, ed.white_tophat),
            (scipy.ndimage.black_tophat, ed.black_tophat)]:
        want = sp(x, size=(3, 3))
        got = ours(jnp.asarray(x), size=(3, 3))
        np.testing.assert_array_equal(np.asarray(got), want)


def test_grey_dilation_even_footprint(rng):
    x = rng.standard_normal((9, 9))
    fp = np.ones((2, 4), bool)
    want = scipy.ndimage.grey_dilation(x, footprint=fp)
    got = ed.grey_dilation(jnp.asarray(x), footprint=fp)
    np.testing.assert_array_equal(np.asarray(got), want)


# ---------------------------------------------------------------------------
# binary morphology


def _blob(rng, shape, thresh=0.3):
    x = scipy.ndimage.gaussian_filter(
        rng.standard_normal(shape), 2.0) > thresh * 0.1
    return x


@pytest.mark.parametrize('border_value', [0, 1])
@pytest.mark.parametrize('iterations', [1, 2, 3])
def test_binary_erosion_dilation(rng, iterations, border_value):
    x = _blob(rng, (16, 17))
    structure = scipy.ndimage.generate_binary_structure(2, 2)
    for sp, ours in [(scipy.ndimage.binary_erosion, ed.binary_erosion),
                     (scipy.ndimage.binary_dilation, ed.binary_dilation)]:
        want = sp(x, structure, iterations=iterations,
                  border_value=border_value)
        got = ours(jnp.asarray(x), structure, iterations=iterations,
                   border_value=border_value)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_default_structure_and_origin(rng):
    x = _blob(rng, (14, 15))
    want = scipy.ndimage.binary_erosion(x, origin=(1, -1),
                                        border_value=1)
    got = ed.binary_erosion(jnp.asarray(x), origin=(1, -1),
                            border_value=1)
    np.testing.assert_array_equal(np.asarray(got), want)
    s = np.ones((2, 3), bool)                  # even structure
    want = scipy.ndimage.binary_dilation(x, s)
    got = ed.binary_dilation(jnp.asarray(x), s)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_erosion_mask(rng):
    x = _blob(rng, (13, 13))
    mask = _blob(rng, (13, 13), -0.2)
    want = scipy.ndimage.binary_erosion(x, mask=mask, iterations=2)
    got = ed.binary_erosion(jnp.asarray(x), mask=jnp.asarray(mask),
                            iterations=2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_iterations_to_fixpoint(rng):
    x = _blob(rng, (12, 12))
    mask = _blob(rng, (12, 12), -0.5)
    want = scipy.ndimage.binary_dilation(x, iterations=0, mask=mask)
    got = ed.binary_dilation(jnp.asarray(x), iterations=0,
                             mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_opening_closing(rng):
    x = _blob(rng, (18, 16))
    s = scipy.ndimage.generate_binary_structure(2, 1)
    want = scipy.ndimage.binary_opening(x, s, iterations=2)
    got = ed.binary_opening(jnp.asarray(x), s, iterations=2)
    np.testing.assert_array_equal(np.asarray(got), want)
    want = scipy.ndimage.binary_closing(x, s, iterations=2)
    got = ed.binary_closing(jnp.asarray(x), s, iterations=2)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_propagation_fill_holes(rng):
    x = _blob(rng, (20, 21))
    seed = np.zeros_like(x)
    seed[10, 10] = x[10, 10]
    want = scipy.ndimage.binary_propagation(seed, mask=x)
    got = ed.binary_propagation(jnp.asarray(seed), mask=jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want)

    ring = np.zeros((15, 15), bool)
    ring[3:12, 3:12] = True
    ring[5:10, 5:10] = False
    want = scipy.ndimage.binary_fill_holes(ring)
    got = ed.binary_fill_holes(jnp.asarray(ring))
    np.testing.assert_array_equal(np.asarray(got), want)
    x3 = _blob(rng, (10, 11, 12))
    want = scipy.ndimage.binary_fill_holes(x3)
    got = ed.binary_fill_holes(jnp.asarray(x3))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_hit_or_miss(rng):
    x = _blob(rng, (17, 18))
    s1 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
    want = scipy.ndimage.binary_hit_or_miss(x, s1)
    got = ed.binary_hit_or_miss(jnp.asarray(x), s1)
    np.testing.assert_array_equal(np.asarray(got), want)
    s2 = np.array([[1, 0, 0], [0, 0, 0], [0, 0, 1]], bool)
    want = scipy.ndimage.binary_hit_or_miss(x, s1, s2, origin1=(0, 1))
    got = ed.binary_hit_or_miss(jnp.asarray(x), s1, s2, origin1=(0, 1))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_binary_erosion_jit(rng):
    x = jnp.asarray(_blob(rng, (12, 12)))
    f = jax.jit(lambda a: ed.binary_erosion(a, iterations=2))
    want = scipy.ndimage.binary_erosion(np.asarray(x), iterations=2)
    np.testing.assert_array_equal(np.asarray(f(x)), want)


def test_structure_helpers():
    for rank in (1, 2, 3):
        for conn in (1, rank):
            np.testing.assert_array_equal(
                ed.generate_binary_structure(rank, conn),
                scipy.ndimage.generate_binary_structure(rank, conn))
    s = scipy.ndimage.generate_binary_structure(2, 1)
    for it in (1, 2, 3):
        np.testing.assert_array_equal(
            ed.iterate_structure(s, it),
            scipy.ndimage.iterate_structure(s, it))
    ours, oorig = ed.iterate_structure(s, 2, origin=(0, 0))
    want, worig = scipy.ndimage.iterate_structure(s, 2, origin=(0, 0))
    np.testing.assert_array_equal(ours, want)
    assert list(oorig) == list(worig)


def test_empty_structure_scipy_convention(rng):
    # an all-False structuring element: erosion is the empty
    # conjunction (all True), dilation the empty disjunction (all
    # False) — and hit_or_miss with an all-True s1 implies an all-False
    # s2 (crashed with `array & None` before; found by
    # tools/fuzz_ndimage.py)
    x = rng.random((5, 6)) < 0.5
    st = np.zeros((1, 1), bool)
    np.testing.assert_array_equal(
        np.asarray(ed.binary_erosion(x, st)),
        scipy.ndimage.binary_erosion(x, st))
    np.testing.assert_array_equal(
        np.asarray(ed.binary_dilation(x, st)),
        scipy.ndimage.binary_dilation(x, st))
    s1 = np.ones((1, 2), bool)
    np.testing.assert_array_equal(
        np.asarray(ed.binary_hit_or_miss(x, s1)),
        scipy.ndimage.binary_hit_or_miss(x, s1))


# ---------------------------------------------------------------------------
# scipy's axes= / brute_force kwargs (signature-parity sweep, round 5)


def test_binary_morphology_axes_kwarg():
    rng = np.random.default_rng(41)
    x = rng.random((4, 9, 10)) > 0.5
    for fn in ('binary_erosion', 'binary_dilation', 'binary_opening',
               'binary_closing'):
        want = getattr(scipy.ndimage, fn)(x, axes=(1, 2))
        got = np.asarray(getattr(ed, fn)(x, axes=(1, 2)))
        np.testing.assert_array_equal(got, want, err_msg=fn)
    s = np.ones((3, 3), bool)
    want = scipy.ndimage.binary_erosion(x, s, axes=(0, 2),
                                        origin=(1, 0))
    got = np.asarray(ed.binary_erosion(x, s, axes=(0, 2),
                                       origin=(1, 0)))
    np.testing.assert_array_equal(got, want)


def test_binary_fill_holes_and_hit_or_miss_axes():
    rng = np.random.default_rng(42)
    x = rng.random((3, 12, 13)) > 0.6
    want = scipy.ndimage.binary_fill_holes(x, axes=(1, 2))
    got = np.asarray(ed.binary_fill_holes(x, axes=(1, 2)))
    np.testing.assert_array_equal(got, want)
    want = scipy.ndimage.binary_hit_or_miss(x, axes=(1, 2))
    got = np.asarray(ed.binary_hit_or_miss(x, axes=(1, 2)))
    np.testing.assert_array_equal(got, want)
    want = scipy.ndimage.binary_propagation(
        x, mask=np.ones_like(x), axes=(1, 2))
    got = np.asarray(ed.binary_propagation(
        x, mask=np.ones_like(x), axes=(1, 2)))
    np.testing.assert_array_equal(got, want)


def test_binary_brute_force_accepted():
    rng = np.random.default_rng(43)
    x = rng.random((8, 9)) > 0.5
    a = np.asarray(ed.binary_erosion(x, iterations=2, brute_force=True))
    b = np.asarray(ed.binary_erosion(x, iterations=2))
    np.testing.assert_array_equal(a, b)


def test_correlate_convolve_axes_kwarg():
    rng = np.random.default_rng(44)
    x = rng.standard_normal((3, 10, 11))
    w = rng.standard_normal((3, 4))
    for fn in ('correlate', 'convolve'):
        want = getattr(scipy.ndimage, fn)(x, w, axes=(1, 2),
                                          origin=(1, -1))
        got = np.asarray(getattr(ed, fn)(x, w, axes=(1, 2),
                                         origin=(1, -1)))
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=fn)
