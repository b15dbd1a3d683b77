"""Differential tests vs scipy.ndimage for the distance transforms
(edt / cdt / bf).

Distances must match scipy exactly (the separable min-plus
decomposition of the squared EDT is exact; the chamfer relaxation
converges to the same fixpoint as scipy's raster scans). Feature
*indices* are compared by implied distance, not raw value — scipy's
tie-breaking depends on its scan order and is not part of the
contract.
"""

import numpy as np
import pytest
import scipy.ndimage
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed


@pytest.fixture
def rng():
    return np.random.default_rng(41)


def _mask(rng, shape, p=0.75):
    # mostly-foreground mask with scattered background seeds
    return rng.random(shape) < p


# ---------------------------------------------------------------------------
# edt


@pytest.mark.parametrize('shape', [(24,), (17, 21), (9, 11, 10)])
def test_edt_distances(rng, shape):
    x = _mask(rng, shape)
    x.flat[0] = False                      # ensure some background
    want = scipy.ndimage.distance_transform_edt(x)
    got = ed.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_sampling(rng):
    x = _mask(rng, (15, 18))
    x[0, 0] = False
    want = scipy.ndimage.distance_transform_edt(x, sampling=(2.0, 0.5))
    got = ed.distance_transform_edt(x, sampling=(2.0, 0.5))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)
    want = scipy.ndimage.distance_transform_edt(x, sampling=3.0)
    got = ed.distance_transform_edt(x, sampling=3.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_indices_imply_exact_distances(rng):
    x = _mask(rng, (14, 16))
    x[3, 4] = False
    dist, idx = ed.distance_transform_edt(x, return_indices=True)
    idx = np.asarray(idx)
    want = scipy.ndimage.distance_transform_edt(x)
    # every feature is a background voxel...
    feats = np.asarray(x)[idx[0], idx[1]]
    assert not feats.any()
    # ...and its implied distance equals scipy's distance
    ii, jj = np.meshgrid(*map(np.arange, x.shape), indexing='ij')
    implied = np.sqrt((ii - idx[0]) ** 2.0 + (jj - idx[1]) ** 2.0)
    np.testing.assert_allclose(implied, want, rtol=1e-6, atol=1e-6)
    # indices-only and both-return forms
    only_idx = ed.distance_transform_edt(x, return_distances=False,
                                         return_indices=True)
    np.testing.assert_array_equal(np.asarray(only_idx), idx)
    np.testing.assert_allclose(np.asarray(dist), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_jit(rng):
    x = _mask(rng, (12, 12))
    x[0, 0] = False
    f = jax.jit(lambda a: ed.distance_transform_edt(a))
    want = scipy.ndimage.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(x))), want,
                               rtol=1e-5, atol=1e-5)


def test_edt_banded_tier_matches_scipy(rng, monkeypatch):
    """Volumes big enough that the 1-D passes route through the banded
    stencil tier (ladder rungs < n-1); a tiny forced ladder exercises
    both a failing certificate (escalation) and a passing one."""
    x = _mask(rng, (48, 52, 44), p=0.6)
    want = scipy.ndimage.distance_transform_edt(x)
    # default ladder (16, 64): rung 16 applies on every axis
    got = ed.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)
    # forced tiny ladder: first rungs cannot certify (max distance
    # exceeds 2 voxels almost surely), so the cond escalation runs
    monkeypatch.setenv("ELASTICDEFORM_TPU_EDT_BAND_LADDER", "2,5")
    got = ed.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)
    # empty ladder: dense-only path
    monkeypatch.setenv("ELASTICDEFORM_TPU_EDT_BAND_LADDER", "")
    got = ed.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_sparse_background_escalates(rng):
    """A single far-away background voxel defeats every ladder rung on
    at least one pass — the certificate must force the dense fallback
    and still be exact."""
    x = np.ones((90, 70), dtype=bool)
    x[3, 5] = False
    want = scipy.ndimage.distance_transform_edt(x)
    got = ed.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_banded_tier_anisotropic_sampling(rng):
    x = _mask(rng, (40, 56), p=0.7)
    want = scipy.ndimage.distance_transform_edt(
        x, sampling=(2.0, 0.25))
    got = ed.distance_transform_edt(x, sampling=(2.0, 0.25))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_banded_tier_indices(rng):
    x = _mask(rng, (44, 50), p=0.6)
    x[10, 12] = False
    dist, idx = ed.distance_transform_edt(x, return_indices=True)
    idx = np.asarray(idx)
    want = scipy.ndimage.distance_transform_edt(x)
    feats = np.asarray(x)[idx[0], idx[1]]
    assert not feats.any()
    ii, jj = np.meshgrid(*map(np.arange, x.shape), indexing='ij')
    implied = np.sqrt((ii - idx[0]) ** 2.0 + (jj - idx[1]) ** 2.0)
    np.testing.assert_allclose(implied, want, rtol=1e-6, atol=1e-6)


def test_edt_blob_mask_128(rng):
    """Blob-structured 2-D mask at bench scale: interior distances in
    the tens of voxels — certifies only on a later ladder rung."""
    blob = scipy.ndimage.gaussian_filter(
        rng.standard_normal((128, 128)), 12.0) > 0.0
    blob.flat[0] = False
    want = scipy.ndimage.distance_transform_edt(blob)
    got = ed.distance_transform_edt(blob)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


def test_edt_1d_scan_tier(rng):
    """1-D inputs use only the nearest-background scan tier."""
    x = _mask(rng, (257,), p=0.8)
    x[0] = False
    want = scipy.ndimage.distance_transform_edt(x)
    got = ed.distance_transform_edt(x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6,
                               atol=1e-6)
    # all-foreground input has no nearest background: scipy emits an
    # artifact of its border initialization (i+1); we return the huge
    # sentinel. Just pin that the sentinel survives the sqrt.
    y = np.ones((19,), dtype=bool)
    goty = np.asarray(ed.distance_transform_edt(y))
    assert (goty > 1e15).all()


# ---------------------------------------------------------------------------
# cdt


@pytest.mark.parametrize('metric', ['taxicab', 'cityblock',
                                    'chessboard'])
@pytest.mark.parametrize('shape', [(20,), (15, 17), (8, 9, 10)])
def test_cdt_distances(rng, metric, shape):
    x = _mask(rng, shape)
    x.flat[-1] = False
    want = scipy.ndimage.distance_transform_cdt(x, metric)
    got = ed.distance_transform_cdt(x, metric)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_cdt_indices_imply_exact_distances(rng):
    x = _mask(rng, (13, 14))
    x[5, 5] = False
    for metric, norm in [('taxicab',
                          lambda di, dj: np.abs(di) + np.abs(dj)),
                         ('chessboard',
                          lambda di, dj: np.maximum(np.abs(di),
                                                    np.abs(dj)))]:
        d, idx = ed.distance_transform_cdt(x, metric,
                                           return_indices=True)
        d, idx = np.asarray(d), np.asarray(idx)
        feats = np.asarray(x)[idx[0], idx[1]]
        assert not feats.any()
        ii, jj = np.meshgrid(*map(np.arange, x.shape), indexing='ij')
        np.testing.assert_array_equal(norm(ii - idx[0], jj - idx[1]), d)


def test_cdt_custom_structure(rng):
    x = _mask(rng, (12, 13))
    x[0, 0] = False
    s = scipy.ndimage.generate_binary_structure(2, 1)
    want = scipy.ndimage.distance_transform_cdt(x, s)
    got = ed.distance_transform_cdt(x, s)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_cdt_validation():
    with pytest.raises(ValueError, match='invalid metric'):
        ed.distance_transform_cdt(np.ones((4, 4)), 'euclid')
    with pytest.raises(RuntimeError, match='at least one'):
        ed.distance_transform_cdt(np.ones((4, 4)),
                                  return_distances=False)


# ---------------------------------------------------------------------------
# bf


@pytest.mark.parametrize('metric', ['euclidean', 'cityblock',
                                    'chessboard'])
def test_bf_matches_scipy(rng, metric):
    x = _mask(rng, (14, 15))
    x[7, 7] = False
    want = scipy.ndimage.distance_transform_bf(x, metric)
    got = ed.distance_transform_bf(x, metric)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)
    if metric != 'euclidean':
        assert np.asarray(got).dtype == want.dtype == np.uint32


def test_bf_euclidean_sampling(rng):
    x = _mask(rng, (11, 12))
    x[2, 9] = False
    want = scipy.ndimage.distance_transform_bf(x, 'euclidean',
                                               sampling=(1.5, 0.75))
    got = ed.distance_transform_bf(x, 'euclidean',
                                   sampling=(1.5, 0.75))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# watershed_ift


def test_watershed_1d_strict_basins_match_scipy():
    # 1-D strict basins: scipy's queue artifacts do not bite here and
    # both implementations produce the cost-optimal assignment
    x = np.array([0, 1, 2, 40, 2, 1, 0], np.uint8)
    m = np.zeros(7, np.int8)
    m[0], m[6] = 1, 2
    want = scipy.ndimage.watershed_ift(x, m)
    got = np.asarray(ed.watershed_ift(x, m))
    np.testing.assert_array_equal(got, want)
    assert got.dtype == want.dtype


def test_watershed_two_basins_cost_optimal():
    # two strict basins separated by a high ridge: the max-arc-optimal
    # assignment gives each basin to its own marker (scipy's queue
    # version does NOT produce this — see the module docstring); the
    # ridge crest is a genuine tie and may go either way.
    prof = np.array([0, 1, 2, 3, 40, 3, 2, 1, 0], np.uint8)
    x = np.tile(prof, (6, 1))
    markers = np.zeros(x.shape, np.int8)
    markers[3, 0] = 1
    markers[3, 8] = 2
    got = np.asarray(ed.watershed_ift(x, markers))
    np.testing.assert_array_equal(got[:, :4], np.ones((6, 4)))
    np.testing.assert_array_equal(got[:, 5:], np.full((6, 4), 2))
    assert set(np.unique(got[:, 4])) <= {1, 2}


def test_watershed_negative_markers_flood():
    x = np.array([[0, 0, 0, 0, 0],
                  [0, 9, 9, 9, 0],
                  [0, 9, 1, 9, 0],
                  [0, 9, 9, 9, 0],
                  [0, 0, 0, 0, 0]], np.uint8)
    m = np.zeros((5, 5), np.int8)
    m[0, 0] = -1
    m[2, 2] = 2
    got = np.asarray(ed.watershed_ift(x, m))
    # the background marker floods the 0 moat; the interior basin is 2
    assert got[0, 0] == -1 and got[4, 4] == -1 and got[2, 2] == 2
    assert set(np.unique(got)) <= {-1, 2}


def test_watershed_structure_and_jit():
    prof = np.array([0, 2, 30, 2, 0], np.uint8)
    x = np.tile(prof, (5, 1))
    m = np.zeros(x.shape, np.int16)
    m[2, 0], m[2, 4] = 1, 2
    s = np.ones((3, 3), bool)
    got = np.asarray(jax.jit(
        lambda a, b: ed.watershed_ift(a, b, s))(x, m))
    np.testing.assert_array_equal(got[:, :2], np.ones((5, 2)))
    np.testing.assert_array_equal(got[:, 3:], np.full((5, 2), 2))
    assert got.dtype == np.int16


def test_watershed_validation():
    with pytest.raises(TypeError, match='unsigned'):
        ed.watershed_ift(np.zeros((4, 4), np.float32),
                         np.zeros((4, 4), np.int8))
    with pytest.raises(RuntimeError, match='equal shapes'):
        ed.watershed_ift(np.zeros((4, 4), np.uint8),
                         np.zeros((4, 5), np.int8))


# ---------------------------------------------------------------------------
# scipy's distances= / indices= output arrays (signature-parity, round 5)


def test_edt_output_arrays():
    rng = np.random.default_rng(51)
    x = rng.random((7, 9)) > 0.35
    d = np.zeros(x.shape, np.float64)
    assert ed.distance_transform_edt(x, distances=d) is None
    np.testing.assert_allclose(d, scipy.ndimage.distance_transform_edt(x),
                               atol=1e-5)
    i = np.zeros((2,) + x.shape, np.int32)
    r = ed.distance_transform_edt(x, return_indices=True, indices=i)
    # distances still returned (only indices was supplied)
    np.testing.assert_allclose(np.asarray(r),
                               scipy.ndimage.distance_transform_edt(x),
                               atol=1e-5)
    # the filled feature indices must imply the exact distances
    ii, jj = np.meshgrid(np.arange(x.shape[0]), np.arange(x.shape[1]),
                         indexing='ij')
    implied = np.sqrt((ii - i[0]) ** 2 + (jj - i[1]) ** 2)
    np.testing.assert_allclose(implied, np.asarray(r), atol=1e-4)


def test_edt_output_array_validation():
    x = np.ones((4, 5), bool)
    with pytest.raises(RuntimeError, match="float64"):
        ed.distance_transform_edt(x, distances=np.zeros(x.shape,
                                                        np.float32))
    with pytest.raises(RuntimeError, match="return_distances"):
        ed.distance_transform_edt(
            x, return_distances=False, return_indices=True,
            distances=np.zeros(x.shape, np.float64),
            indices=np.zeros((2,) + x.shape, np.int32))
    with pytest.raises(RuntimeError, match="wrong shape"):
        ed.distance_transform_edt(x, distances=np.zeros((3, 3),
                                                        np.float64))


def test_cdt_bf_output_arrays():
    rng = np.random.default_rng(52)
    x = rng.random((8, 8)) > 0.4
    d = np.zeros(x.shape, np.int32)
    assert ed.distance_transform_cdt(x, distances=d) is None
    np.testing.assert_array_equal(
        d, scipy.ndimage.distance_transform_cdt(x))
    du = np.zeros(x.shape, np.uint32)
    assert ed.distance_transform_bf(x, 'chessboard', distances=du) is None
    np.testing.assert_array_equal(
        du, scipy.ndimage.distance_transform_bf(x, 'chessboard'))
