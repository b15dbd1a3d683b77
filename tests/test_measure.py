"""Differential tests vs scipy.ndimage for labeling and region
measurements (label / find_objects / segment statistics).

``label`` runs its propagation on device (pointer-jumping
while_loop, elasticdeform_tpu/measure.py) and must reproduce scipy's
exact 1..n raster-first-occurrence numbering; the statistics are
``jax.ops.segment_*`` reductions checked against scipy's C.
"""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed
from elasticdeform_tpu.measure import label_roots


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def _blobs(rng, shape, thresh=0.5):
    return scipy.ndimage.gaussian_filter(
        rng.standard_normal(shape), 1.5) > thresh * 0.1


# ---------------------------------------------------------------------------
# label


@pytest.mark.parametrize('conn', [1, 2])
@pytest.mark.parametrize('shape', [(20,), (16, 18), (9, 10, 11)])
def test_label_matches_scipy(rng, shape, conn):
    x = _blobs(rng, shape)
    structure = scipy.ndimage.generate_binary_structure(len(shape),
                                                        conn)
    want, wn = scipy.ndimage.label(x, structure)
    got, gn = ed.label(x, structure)
    assert gn == wn
    np.testing.assert_array_equal(got, want)


def test_label_default_structure_and_empty(rng):
    x = _blobs(rng, (14, 15))
    want, wn = scipy.ndimage.label(x)
    got, gn = ed.label(x)
    assert gn == wn
    np.testing.assert_array_equal(got, want)
    got, gn = ed.label(np.zeros((5, 6), bool))
    assert gn == 0
    assert not got.any()
    got, gn = ed.label(np.ones((4, 4), bool))
    assert gn == 1
    np.testing.assert_array_equal(got, np.ones((4, 4), np.int32))


def test_label_worst_case_snake():
    # a single serpentine component the length of the array — the
    # pointer-jumping loop must still converge (O(log) doublings)
    x = np.zeros((12, 12), bool)
    x[::2, :] = True
    x[1::2, -1] = True           # connect rows on alternating ends
    x[3::4, -1] = True
    x[1::4, 0] = True
    x[1::2, :] |= False
    for r in range(1, 12, 2):
        x[r, 0 if (r // 2) % 2 else -1] = True
    want, wn = scipy.ndimage.label(x)
    got, gn = ed.label(x)
    assert gn == wn
    np.testing.assert_array_equal(got, want)


def test_label_roots_jittable(rng):
    x = _blobs(rng, (13, 13))
    f = jax.jit(lambda a: label_roots(a))
    r1 = np.asarray(f(jnp.asarray(x)))
    r2 = np.asarray(label_roots(x))
    np.testing.assert_array_equal(r1, r2)


def test_label_structure_validation():
    with pytest.raises(ValueError, match='must be 3'):
        ed.label(np.ones((4, 4)), np.ones((5, 5), bool))
    with pytest.raises(ValueError, match='symmetric'):
        s = np.zeros((3, 3), bool)
        s[1, 1] = s[0, 1] = True
        ed.label(np.ones((4, 4)), s)


# ---------------------------------------------------------------------------
# find_objects


def test_find_objects(rng):
    x = _blobs(rng, (18, 17))
    labels, n = scipy.ndimage.label(x)
    want = scipy.ndimage.find_objects(labels)
    got = ed.find_objects(labels)
    assert got == want
    want = scipy.ndimage.find_objects(labels, max_label=n + 3)
    got = ed.find_objects(labels, max_label=n + 3)
    assert got == want


# ---------------------------------------------------------------------------
# statistics


def _labeled(rng, shape=(15, 16)):
    x = rng.standard_normal(shape)
    labels, n = scipy.ndimage.label(_blobs(rng, shape))
    index = np.arange(1, n + 1)
    return x, labels, index


def test_sum_mean_variance_std(rng):
    x, labels, index = _labeled(rng)
    for sp, ours in [(scipy.ndimage.sum_labels, ed.sum_labels),
                     (scipy.ndimage.mean, ed.mean),
                     (scipy.ndimage.variance, ed.variance),
                     (scipy.ndimage.standard_deviation,
                      ed.standard_deviation)]:
        want = sp(x, labels, index)
        got = ours(x, labels, index)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                                   atol=2e-6)
        # scalar index / no index / no labels forms
        np.testing.assert_allclose(
            np.asarray(ours(x, labels, 1)), sp(x, labels, 1),
            rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(ours(x, labels)), sp(x, labels),
            rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(ours(x)), sp(x), rtol=2e-5, atol=2e-6)


def test_min_max_and_positions(rng):
    x, labels, index = _labeled(rng)
    np.testing.assert_allclose(
        np.asarray(ed.minimum(x, labels, index)),
        scipy.ndimage.minimum(x, labels, index), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ed.maximum(x, labels, index)),
        scipy.ndimage.maximum(x, labels, index), rtol=1e-6)
    assert (ed.minimum_position(x, labels, index)
            == scipy.ndimage.minimum_position(x, labels, index))
    assert (ed.maximum_position(x, labels, index)
            == scipy.ndimage.maximum_position(x, labels, index))
    assert (ed.maximum_position(x, labels, 2)
            == scipy.ndimage.maximum_position(x, labels, 2))
    we = scipy.ndimage.extrema(x, labels, index)
    ge = ed.extrema(x, labels, index)
    np.testing.assert_allclose(np.asarray(ge[0]), we[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ge[1]), we[1], rtol=1e-6)
    assert ge[2] == we[2] and ge[3] == we[3]


def test_center_of_mass(rng):
    x = np.abs(rng.standard_normal((14, 13))) + 0.1
    labels, n = scipy.ndimage.label(_blobs(rng, (14, 13)))
    index = np.arange(1, n + 1)
    want = scipy.ndimage.center_of_mass(x, labels, index)
    got = ed.center_of_mass(x, labels, index)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(ed.center_of_mass(x)),
        np.asarray(scipy.ndimage.center_of_mass(x)), rtol=2e-5)


def test_median(rng):
    x, labels, index = _labeled(rng)
    np.testing.assert_allclose(ed.median(x, labels, index),
                               scipy.ndimage.median(x, labels, index))
    np.testing.assert_allclose(ed.median(x, labels),
                               scipy.ndimage.median(x, labels))
    np.testing.assert_allclose(ed.median(x), scipy.ndimage.median(x))


def test_histogram(rng):
    x, labels, index = _labeled(rng)
    want = scipy.ndimage.histogram(x, -2.0, 2.0, 8, labels, index)
    got = ed.histogram(x, -2.0, 2.0, 8, labels, index)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    want = scipy.ndimage.histogram(x, -2.0, 2.0, 8, labels, 1)
    got = ed.histogram(x, -2.0, 2.0, 8, labels, 1)
    np.testing.assert_array_equal(got, want)
    want = scipy.ndimage.histogram(x, -2.0, 2.0, 8)
    got = ed.histogram(x, -2.0, 2.0, 8)
    np.testing.assert_array_equal(got, want)


def test_labeled_comprehension(rng):
    x, labels, index = _labeled(rng)
    want = scipy.ndimage.labeled_comprehension(
        x, labels, index, np.mean, float, -1.0)
    got = ed.labeled_comprehension(x, labels, index, np.mean, float,
                                   -1.0)
    np.testing.assert_allclose(got, want)
    fn = lambda v, p: float(np.sum(v * p))
    want = scipy.ndimage.labeled_comprehension(
        x, labels, index, fn, float, 0.0, pass_positions=True)
    got = ed.labeled_comprehension(x, labels, index, fn, float, 0.0,
                                   pass_positions=True)
    np.testing.assert_allclose(got, want)


def test_value_indices(rng):
    labels, _ = scipy.ndimage.label(_blobs(rng, (12, 11)))
    want = scipy.ndimage.value_indices(labels)
    got = ed.value_indices(labels)
    assert set(got) == set(want)
    for k in want:
        for ga, wa in zip(got[k], want[k]):
            np.testing.assert_array_equal(ga, wa)
    want = scipy.ndimage.value_indices(labels, ignore_value=0)
    got = ed.value_indices(labels, ignore_value=0)
    assert set(got) == set(want)


def test_stats_with_absent_index(rng):
    x, labels, index = _labeled(rng)
    big = int(index.max()) + 5
    want = scipy.ndimage.sum_labels(x, labels, [1, big])
    got = ed.sum_labels(x, labels, [1, big])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=1e-6)


def test_duplicate_index_entries():
    # scipy allows repeated index values — every occurrence returns
    # that label's statistic (a value->slot LUT lets the last duplicate
    # win; found by tools/fuzz_ndimage.py)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((4, 5)) * 5
    lab = rng.integers(0, 4, (4, 5)).astype(np.int32)
    idx = [2, 4, 1, 2, 3, 2]
    for op in ("sum_labels", "mean", "variance", "minimum", "maximum",
               "minimum_position", "maximum_position",
               "center_of_mass"):
        got = np.asarray(getattr(ed, op)(x, lab, idx), dtype=np.float64)
        want = np.asarray(getattr(scipy.ndimage, op)(x, lab, idx),
                          dtype=np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=op)


def test_histogram_empty_region_is_none():
    # scipy returns None for an index with NO voxels (its
    # labeled_comprehension default) but a zero histogram for a
    # non-empty region whose values all fall outside [min, max)
    x = np.array([1.0, 2.0, 50.0])
    lab = np.array([1, 1, 2])
    h = ed.histogram(x, 0.0, 10.0, 5, lab, [1, 3, 2])
    hs = scipy.ndimage.histogram(x, 0.0, 10.0, 5, lab, [1, 3, 2])
    assert h[1] is None and hs[1] is None
    np.testing.assert_array_equal(h[0], hs[0])
    np.testing.assert_array_equal(h[2], hs[2])     # zero, not None
    assert h[2].sum() == 0
