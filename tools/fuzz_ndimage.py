"""Randomized differential fuzz of the scipy.ndimage parity tier.

Draws random (op, params, dtype, shape) configurations and compares
against scipy.ndimage on CPU (float64 path, x64 on): integer/bool ops
must be exact, float ops within 1e-9 relative. Resampler-family modes
are restricted to the ones where this library intentionally matches
*modern* scipy (mirror/constant/wrap — the grid modes keep the
reference's pre-1.6 semantics elsewhere, see docs/source/migration.rst).

Usage:  python tools/fuzz_ndimage.py [N_CASES] [SEED]
Prints one line per mismatch and a final PASS/FAIL summary.
"""

import sys
import os
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import scipy.ndimage as ndi  # noqa: E402

import elasticdeform_tpu as ed  # noqa: E402

N_CASES = int(sys.argv[1]) if len(sys.argv) > 1 else 400
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0

FILTER_MODES = ["reflect", "constant", "nearest", "mirror", "wrap"]
GRID_MODES = ["mirror", "constant", "wrap"]  # modern-scipy-agreeing
# the scipy-convention resamplers carry MODERN semantics for every name
RESAMPLE_MODES = GRID_MODES + ["reflect", "nearest", "grid-mirror",
                               "grid-wrap", "grid-constant"]
# map_coordinates keeps the reference (pre-1.6) classics + grid-* modern
MAPCOORD_MODES = GRID_MODES + ["grid-mirror", "grid-wrap",
                               "grid-constant"]
SPLINE_MODES = ["mirror", "reflect", "nearest", "wrap", "constant",
                "grid-mirror", "grid-wrap", "grid-constant"]


def rand_input(rng, ndim=None, dtypes=("f8", "f4", "i4", "u1")):
    ndim = ndim or int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 14, ndim))
    kind = rng.choice(dtypes)
    if kind == "f8":
        return rng.standard_normal(shape) * 10
    if kind == "f4":
        return (rng.standard_normal(shape) * 10).astype(np.float32)
    if kind == "i4":
        return rng.integers(-100, 100, shape).astype(np.int32)
    return rng.integers(0, 255, shape).astype(np.uint8)


def rand_origin(rng, sizes):
    return tuple(int(rng.integers(-(s // 2), (s - 1) // 2 + 1))
                 for s in sizes)


def compare(name, got, want, float_tol=1e-9):
    got = np.asarray(got)
    want = np.asarray(want)
    if got.shape != want.shape:
        return f"{name}: shape {got.shape} vs {want.shape}"
    if want.dtype.kind in "biu" or got.dtype.kind in "biu":
        if got.dtype != want.dtype:
            return f"{name}: dtype {got.dtype} vs {want.dtype}"
        if not (got == want).all():
            n = int((got != want).sum())
            return f"{name}: {n}/{got.size} int mismatches"
        return None
    scale = max(1.0, float(np.abs(want).max()))
    err = float(np.abs(got.astype(np.float64)
                       - want.astype(np.float64)).max())
    tol = float_tol * scale * (1e5 if want.dtype == np.float32 else 1.0)
    if err > tol:
        return f"{name}: float err {err:.3e} > {tol:.3e}"
    return None


def _compare_or_both_raise(name, f_ed, f_sp):
    """Run both sides; if BOTH reject the config (e.g. an origin off
    the kernel support) that's agreement, if only one raises it's a
    contract mismatch."""
    try:
        got = f_ed()
        ed_err = None
    except (ValueError, RuntimeError) as e:
        got, ed_err = None, e
    try:
        want = f_sp()
        sp_err = None
    except (ValueError, RuntimeError) as e:
        want, sp_err = None, e
    if (ed_err is None) != (sp_err is None):
        return (f"{name}: raise parity — ours {ed_err!r} "
                f"vs scipy {sp_err!r}")
    if ed_err is not None:
        return None
    return compare(name, got, want)


def case_gaussian(rng):
    x = rand_input(rng)
    sigma = float(rng.uniform(0.3, 3.0))
    order = int(rng.integers(0, 3))
    mode = str(rng.choice(FILTER_MODES))
    cval = float(rng.uniform(-2, 2))
    trunc = float(rng.uniform(1.0, 4.0))
    kw = dict(order=order, mode=mode, cval=cval, truncate=trunc)
    return compare("gaussian_filter",
                   ed.gaussian_filter(x, sigma, **kw),
                   ndi.gaussian_filter(x, sigma, **kw))


def case_correlate(rng):
    x = rand_input(rng)
    conv = bool(rng.integers(0, 2))
    kshape = tuple(int(v) for v in rng.integers(1, 5, x.ndim))
    w = rng.standard_normal(kshape)
    mode = str(rng.choice(FILTER_MODES))
    cval = float(rng.uniform(-2, 2))
    origin = rand_origin(rng, kshape)
    f_ed = ed.convolve if conv else ed.correlate
    f_sp = ndi.convolve if conv else ndi.correlate
    name = "convolve" if conv else "correlate"
    return _compare_or_both_raise(
        name,
        lambda: f_ed(x, w, mode=mode, cval=cval, origin=origin),
        lambda: f_sp(x, w, mode=mode, cval=cval, origin=origin))


def case_correlate1d(rng):
    x = rand_input(rng)
    conv = bool(rng.integers(0, 2))
    k = int(rng.integers(1, 7))
    w = rng.standard_normal(k)
    axis = int(rng.integers(0, x.ndim))
    mode = str(rng.choice(FILTER_MODES))
    lo = -(k // 2)
    hi = (k - 1) // 2
    if conv:
        lo, hi = -((k - 1) // 2), k // 2
    origin = int(rng.integers(lo, hi + 1))
    f_ed = ed.convolve1d if conv else ed.correlate1d
    f_sp = ndi.convolve1d if conv else ndi.correlate1d
    return _compare_or_both_raise(
        "correlate1d",
        lambda: f_ed(x, w, axis=axis, mode=mode, origin=origin),
        lambda: f_sp(x, w, axis=axis, mode=mode, origin=origin))


def case_uniform(rng):
    x = rand_input(rng)
    sizes = tuple(int(v) for v in rng.integers(1, 5, x.ndim))
    mode = str(rng.choice(FILTER_MODES))
    origin = rand_origin(rng, sizes)
    return compare("uniform_filter",
                   ed.uniform_filter(x, sizes, mode=mode, origin=origin),
                   ndi.uniform_filter(x, sizes, mode=mode, origin=origin))


def case_minmax(rng):
    x = rand_input(rng)
    use_fp = bool(rng.integers(0, 2))
    mx = bool(rng.integers(0, 2))
    mode = str(rng.choice(FILTER_MODES))
    f_ed = ed.maximum_filter if mx else ed.minimum_filter
    f_sp = ndi.maximum_filter if mx else ndi.minimum_filter
    if use_fp:
        fshape = tuple(int(v) for v in rng.integers(1, 4, x.ndim))
        fp = rng.random(fshape) < 0.6
        if not fp.any():
            fp.flat[0] = True
        origin = rand_origin(rng, fshape)
        return compare("minmax_fp",
                       f_ed(x, footprint=fp, mode=mode, origin=origin),
                       f_sp(x, footprint=fp, mode=mode, origin=origin))
    sizes = tuple(int(v) for v in rng.integers(1, 5, x.ndim))
    origin = rand_origin(rng, sizes)
    return compare("minmax_size",
                   f_ed(x, sizes, mode=mode, origin=origin),
                   f_sp(x, sizes, mode=mode, origin=origin))


def case_rank(rng):
    x = rand_input(rng)
    fshape = tuple(int(v) for v in rng.integers(1, 4, x.ndim))
    fp = rng.random(fshape) < 0.7
    if not fp.any():
        fp.flat[0] = True
    k = int(fp.sum())
    mode = str(rng.choice(FILTER_MODES))
    origin = rand_origin(rng, fshape)
    which = rng.choice(["rank", "median", "percentile"])
    if which == "rank":
        r = int(rng.integers(-k, k))
        return compare("rank_filter",
                       ed.rank_filter(x, r, footprint=fp, mode=mode,
                                      origin=origin),
                       ndi.rank_filter(x, r, footprint=fp, mode=mode,
                                       origin=origin))
    if which == "median":
        return compare("median_filter",
                       ed.median_filter(x, footprint=fp, mode=mode,
                                        origin=origin),
                       ndi.median_filter(x, footprint=fp, mode=mode,
                                         origin=origin))
    p = float(rng.uniform(0, 100))
    return compare("percentile_filter",
                   ed.percentile_filter(x, p, footprint=fp, mode=mode,
                                        origin=origin),
                   ndi.percentile_filter(x, p, footprint=fp, mode=mode,
                                         origin=origin))


def case_grey(rng):
    x = rand_input(rng)
    sizes = tuple(int(v) for v in rng.integers(1, 4, x.ndim))
    mode = str(rng.choice(FILTER_MODES))
    op = rng.choice(["grey_erosion", "grey_dilation", "grey_opening",
                     "grey_closing", "morphological_gradient",
                     "morphological_laplace", "white_tophat",
                     "black_tophat"])
    return compare(op,
                   getattr(ed, op)(x, size=sizes, mode=mode),
                   getattr(ndi, op)(x, size=sizes, mode=mode))


def case_binary(rng):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 16, ndim))
    x = rng.random(shape) < rng.uniform(0.2, 0.8)
    conn = int(rng.integers(1, ndim + 1))
    st = ndi.generate_binary_structure(ndim, conn)
    op = rng.choice(["binary_erosion", "binary_dilation",
                     "binary_opening", "binary_closing"])
    iters = int(rng.integers(1, 4))
    bv = int(rng.integers(0, 2))
    mask = (rng.random(shape) < 0.85) if rng.integers(0, 2) else None
    kw = dict(structure=st, iterations=iters, mask=mask,
              border_value=bv)
    return compare(op, getattr(ed, op)(x, **kw),
                   getattr(ndi, op)(x, **kw))


def case_fill_prop(rng):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 16, ndim))
    x = rng.random(shape) < rng.uniform(0.2, 0.7)
    conn = int(rng.integers(1, ndim + 1))
    st = ndi.generate_binary_structure(ndim, conn)
    if rng.integers(0, 2):
        return compare("binary_fill_holes",
                       ed.binary_fill_holes(x, st),
                       ndi.binary_fill_holes(x, st))
    mask = rng.random(shape) < 0.8
    seed = x & (rng.random(shape) < 0.4)
    return compare("binary_propagation",
                   ed.binary_propagation(seed, st, mask),
                   ndi.binary_propagation(seed, st, mask))


def case_label(rng):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 16, ndim))
    x = rng.random(shape) < rng.uniform(0.2, 0.8)
    conn = int(rng.integers(1, ndim + 1))
    st = ndi.generate_binary_structure(ndim, conn)
    a, na = ed.label(x, st)
    b, nb = ndi.label(x, st)
    if na != nb:
        return f"label: count {na} vs {nb}"
    return compare("label", a, b)


def case_edt(rng):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 16, ndim))
    x = rng.random(shape) < rng.uniform(0.3, 0.9)
    if x.all():
        # all-foreground EDT is undefined (no zero exists); scipy
        # emits an index-artifact ramp, this library a sentinel — a
        # documented deviation, not a fuzz target
        x.flat[int(rng.integers(0, x.size))] = False
    sampling = (tuple(float(v) for v in rng.uniform(0.5, 2.0, ndim))
                if rng.integers(0, 2) else None)
    got = ed.distance_transform_edt(x, sampling=sampling)
    want = ndi.distance_transform_edt(x, sampling=sampling)
    return compare("edt", got, want, float_tol=1e-7)


def case_deriv(rng):
    x = rand_input(rng, dtypes=("f8",))
    mode = str(rng.choice(FILTER_MODES))
    op = rng.choice(["sobel", "prewitt", "laplace"])
    if op == "laplace":
        return compare("laplace", ed.laplace(x, mode=mode),
                       ndi.laplace(x, mode=mode))
    axis = int(rng.integers(0, x.ndim))
    return compare(op, getattr(ed, op)(x, axis=axis, mode=mode),
                   getattr(ndi, op)(x, axis=axis, mode=mode))


def case_fourier(rng):
    ndim = int(rng.integers(1, 3))
    shape = tuple(int(v) for v in rng.integers(4, 12, ndim))
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    which = rng.choice(["gaussian", "uniform", "shift"])
    if which == "gaussian":
        s = float(rng.uniform(0.5, 3.0))
        return compare("fourier_gaussian", ed.fourier_gaussian(z, s),
                       ndi.fourier_gaussian(z, s))
    if which == "uniform":
        s = float(rng.uniform(1.0, 4.0))
        return compare("fourier_uniform", ed.fourier_uniform(z, s),
                       ndi.fourier_uniform(z, s))
    sh = tuple(float(v) for v in rng.uniform(-3, 3, ndim))
    return compare("fourier_shift", ed.fourier_shift(z, sh),
                   ndi.fourier_shift(z, sh))


def case_resample(rng):
    x = rand_input(rng, dtypes=("f8",))
    order = int(rng.integers(0, 6))
    cval = float(rng.uniform(-2, 2))
    which = rng.choice(["shift", "rotate", "affine", "mapcoords"])
    mode = str(rng.choice(MAPCOORD_MODES if which == "mapcoords"
                          else RESAMPLE_MODES))
    if which == "shift":
        sh = tuple(float(v) for v in rng.uniform(-2, 2, x.ndim))
        return compare("shift",
                       ed.shift(x, sh, order=order, mode=mode, cval=cval),
                       ndi.shift(x, sh, order=order, mode=mode,
                                 cval=cval), 1e-8)
    if which == "rotate" and x.ndim >= 2:
        ang = float(rng.uniform(-90, 90))
        return compare("rotate",
                       ed.rotate(x, ang, reshape=False, order=order,
                                 mode=mode, cval=cval),
                       ndi.rotate(x, ang, reshape=False, order=order,
                                  mode=mode, cval=cval), 1e-8)
    if which == "affine":
        mat = np.eye(x.ndim) + rng.standard_normal(
            (x.ndim, x.ndim)) * 0.1
        off = rng.uniform(-2, 2, x.ndim)
        return compare("affine_transform",
                       ed.affine_transform(x, mat, off, order=order,
                                           mode=mode, cval=cval),
                       ndi.affine_transform(x, mat, off, order=order,
                                            mode=mode, cval=cval), 1e-8)
    coords = np.indices(x.shape).astype(np.float64)
    coords = coords + rng.standard_normal(coords.shape) * 1.5
    return compare("map_coordinates",
                   ed.map_coordinates(x, coords, order=order, mode=mode,
                                      cval=cval),
                   ndi.map_coordinates(x, coords, order=order, mode=mode,
                                       cval=cval), 1e-8)


def case_measure(rng):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 12, ndim))
    x = rng.standard_normal(shape) * 5
    lab = rng.integers(0, 5, shape).astype(np.int32)
    k = int(rng.integers(1, 6))
    index = list(rng.integers(0, 6, k))
    op = rng.choice(["sum_labels", "mean", "variance",
                     "standard_deviation", "minimum", "maximum",
                     "median", "center_of_mass", "minimum_position",
                     "maximum_position"])
    if op == "median":
        # scipy's median of an EMPTY region returns a sort-block
        # artifact (e.g. 1.0); this library returns NaN — keep the
        # fuzz on defined behaviour only
        present = np.unique(lab)
        index = [int(v) for v in present[
            rng.integers(0, len(present), k)]]
    got = np.asarray(getattr(ed, op)(x, lab, index), np.float64)
    want = np.asarray(getattr(ndi, op)(x, lab, index), np.float64)
    if not (np.isnan(got) == np.isnan(want)).all():
        return f"{op}: NaN pattern differs"
    return compare(op, np.nan_to_num(got), np.nan_to_num(want), 1e-9)


def case_grey_structure(rng):
    # non-flat structuring elements (integer inputs follow this
    # library's documented trunc contract, so float only here)
    x = rand_input(rng, dtypes=("f8",))
    sshape = tuple(int(v) for v in rng.integers(1, 4, x.ndim))
    st = rng.standard_normal(sshape) * 2
    mode = str(rng.choice(FILTER_MODES))
    op = rng.choice(["grey_erosion", "grey_dilation"])
    return compare(op,
                   getattr(ed, op)(x, structure=st, mode=mode),
                   getattr(ndi, op)(x, structure=st, mode=mode))


def case_hit_or_miss(rng):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(4, 14, ndim))
    x = rng.random(shape) < rng.uniform(0.3, 0.7)
    s1 = rng.random(tuple(int(v) for v in
                          rng.integers(1, 4, ndim))) < 0.5
    if not s1.any():
        s1.flat[0] = True
    return compare("binary_hit_or_miss",
                   ed.binary_hit_or_miss(x, s1),
                   ndi.binary_hit_or_miss(x, s1))


def case_gauss_deriv(rng):
    x = rand_input(rng, dtypes=("f8",))
    sigma = float(rng.uniform(0.5, 2.5))
    mode = str(rng.choice(FILTER_MODES))
    op = rng.choice(["gaussian_laplace", "gaussian_gradient_magnitude"])
    return compare(op, getattr(ed, op)(x, sigma, mode=mode),
                   getattr(ndi, op)(x, sigma, mode=mode))


def case_zoom(rng):
    x = rand_input(rng, dtypes=("f8",))
    order = int(rng.integers(0, 6))
    mode = str(rng.choice(RESAMPLE_MODES))
    z = float(rng.uniform(0.5, 2.0))
    if rng.integers(0, 2):
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            a = ed.zoom(x, z, order=order, mode=mode, grid_mode=True)
            b = ndi.zoom(x, z, order=order, mode=mode, grid_mode=True)
        return compare("zoom_grid_mode", a, b, 1e-8)
    return compare("zoom",
                   ed.zoom(x, z, order=order, mode=mode),
                   ndi.zoom(x, z, order=order, mode=mode), 1e-8)


def case_spline_filter(rng):
    x = rand_input(rng, dtypes=("f8",))
    order = int(rng.integers(2, 6))
    mode = str(rng.choice(SPLINE_MODES))
    if rng.integers(0, 2):
        axis = int(rng.integers(0, x.ndim))
        return compare("spline_filter1d",
                       ed.spline_filter1d(x, order=order, axis=axis,
                                          mode=mode),
                       ndi.spline_filter1d(x, order=order, axis=axis,
                                           mode=mode, output=np.float64),
                       1e-8)
    return compare("spline_filter",
                   ed.spline_filter(x, order=order, mode=mode),
                   ndi.spline_filter(x, order=order, mode=mode,
                                     output=np.float64), 1e-8)


def case_binary_iterstruct(rng):
    # iterations>1 with origin and iterate_structure interplay
    ndim = int(rng.integers(1, 3))
    shape = tuple(int(v) for v in rng.integers(5, 16, ndim))
    x = rng.random(shape) < rng.uniform(0.3, 0.7)
    st = ndi.generate_binary_structure(ndim, int(rng.integers(1, ndim + 1)))
    origin = tuple(int(rng.integers(-1, 2)) for _ in range(ndim))
    op = rng.choice(["binary_erosion", "binary_dilation"])
    it = int(rng.integers(1, 4))
    return compare(op + "_origin",
                   getattr(ed, op)(x, st, iterations=it, origin=origin),
                   getattr(ndi, op)(x, st, iterations=it, origin=origin))


def case_cdt_bf(rng):
    # chamfer / brute-force distance transforms (distances only: index
    # tie-breaking is implementation-defined in scipy)
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 16, ndim))
    x = rng.random(shape) < rng.uniform(0.3, 0.9)
    if x.all():
        x.flat[int(rng.integers(0, x.size))] = False
    which = int(rng.integers(0, 3))
    if which == 0:
        metric = str(rng.choice(["chessboard", "taxicab"]))
        return compare("cdt_" + metric,
                       ed.distance_transform_cdt(x, metric),
                       ndi.distance_transform_cdt(x, metric))
    if which == 1:
        metric = str(rng.choice(["chessboard", "taxicab"]))
        return compare("bf_" + metric,
                       ed.distance_transform_bf(x, metric),
                       ndi.distance_transform_bf(x, metric))
    sampling = (tuple(float(v) for v in rng.uniform(0.5, 2.0, ndim))
                if rng.integers(0, 2) else None)
    return compare("bf_euclidean",
                   ed.distance_transform_bf(x, "euclidean",
                                            sampling=sampling),
                   ndi.distance_transform_bf(x, "euclidean",
                                             sampling=sampling), 1e-7)


def case_measure2(rng):
    # the labeled-statistics surface the original case_measure misses:
    # extrema, histogram, find_objects, labeled_comprehension,
    # value_indices, and the deprecated `sum` alias
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 12, ndim))
    x = rng.standard_normal(shape) * 5
    lab = rng.integers(0, 5, shape).astype(np.int32)
    k = int(rng.integers(1, 6))
    index = [int(v) for v in rng.integers(0, 6, k)]
    which = int(rng.integers(0, 6))
    if which == 0:
        g = ed.extrema(x, lab, index)
        w = ndi.extrema(x, lab, index)
        for name, a, b in zip(("min", "max", "minpos", "maxpos"),
                              g, w):
            r = compare("extrema_" + name,
                        np.asarray(a, np.float64),
                        np.asarray(b, np.float64))
            if r:
                return r
        return None
    if which == 1:
        lo, hi = np.sort(rng.standard_normal(2) * 5)
        if hi - lo < 0.1:
            hi = lo + 1.0
        bins = int(rng.integers(1, 8))
        g = ed.histogram(x, lo, hi, bins, lab, index)
        w = ndi.histogram(x, lo, hi, bins, lab, index)
        for i, (a, b) in enumerate(zip(g, w)):
            if (a is None) != (b is None):
                return f"histogram[{i}]: None parity {a} vs {b}"
            if a is not None:
                r = compare(f"histogram[{i}]", np.asarray(a),
                            np.asarray(b))
                if r:
                    return r
        return None
    if which == 2:
        ml = int(rng.integers(0, 7))
        g = ed.find_objects(lab, max_label=ml)
        w = ndi.find_objects(lab, max_label=ml)
        return None if g == w else f"find_objects: {g} vs {w}"
    if which == 3:
        g = ed.labeled_comprehension(x, lab, index, np.sum,
                                     np.float64, -1.0)
        w = ndi.labeled_comprehension(x, lab, index, np.sum,
                                      np.float64, -1.0)
        return compare("labeled_comprehension", g, w)
    if which == 4:
        ign = int(rng.integers(0, 5)) if rng.integers(0, 2) else None
        g = ed.value_indices(lab, ignore_value=ign)
        w = ndi.value_indices(lab, ignore_value=ign)
        if sorted(g.keys()) != sorted(w.keys()):
            return f"value_indices: keys {sorted(g)} vs {sorted(w)}"
        for key in w:
            for a, b in zip(g[key], w[key]):
                if not (np.asarray(a) == np.asarray(b)).all():
                    return f"value_indices[{key}]: index mismatch"
        return None
    return compare("sum_alias", ed.sum(x, lab, index),
                   ndi.sum(x, lab, index))


def case_filter1d(rng):
    # the 1-D separable filter entry points with random axis/origin
    x = rand_input(rng)
    axis = int(rng.integers(-x.ndim, x.ndim))
    mode = str(rng.choice(FILTER_MODES))
    which = int(rng.integers(0, 4))
    if which == 0:
        sigma = float(rng.uniform(0.3, 3.0))
        order = int(rng.integers(0, 4))
        return compare(
            "gaussian_filter1d",
            ed.gaussian_filter1d(x, sigma, axis=axis, order=order,
                                 mode=mode),
            ndi.gaussian_filter1d(x, sigma, axis=axis, order=order,
                                  mode=mode))
    size = int(rng.integers(1, 7))
    origin = int(rng.integers(-(size // 2), (size - 1) // 2 + 1))
    name = ["uniform_filter1d", "minimum_filter1d",
            "maximum_filter1d"][which - 1]
    return compare(
        name,
        getattr(ed, name)(x, size, axis=axis, mode=mode, origin=origin),
        getattr(ndi, name)(x, size, axis=axis, mode=mode,
                           origin=origin))


def case_generic(rng):
    # user-callable filters; the callable CONTRACTS differ by design
    # (traced functional vs scipy's per-voxel/in-place buffers), so each
    # side gets its own adapter computing the same math
    x = rand_input(rng, dtypes=("f8",))
    mode = str(rng.choice(FILTER_MODES))
    which = int(rng.integers(0, 4))
    if which == 0:
        sizes = tuple(int(v) for v in rng.integers(1, 4, x.ndim))
        origin = rand_origin(rng, sizes)
        fn = lambda v: (v * v).sum()  # noqa: E731
        return compare(
            "generic_filter",
            ed.generic_filter(x, fn, size=sizes, mode=mode,
                              origin=origin),
            ndi.generic_filter(x, fn, size=sizes, mode=mode,
                               origin=origin))
    if which == 1:
        size = int(rng.integers(1, 6))
        axis = int(rng.integers(-x.ndim, x.ndim))
        n = x.shape[axis]

        def ours(line):  # extended line -> output line (length n)
            return sum(line[i:i + n] for i in range(size)) / size

        def theirs(iline, oline):  # scipy's in-place contract
            m = oline.size
            acc = np.zeros(m)
            for i in range(size):
                acc += iline[i:i + m]
            oline[...] = acc / size

        return compare(
            "generic_filter1d",
            ed.generic_filter1d(x, ours, size, axis=axis, mode=mode),
            ndi.generic_filter1d(x, theirs, size, axis=axis, mode=mode))
    kern = rng.standard_normal(3)
    if which == 2:
        return compare(
            "generic_laplace",
            ed.generic_laplace(
                x, lambda inp, ax, m, cv: ed.correlate1d(
                    inp, kern, axis=ax, mode=m, cval=cv), mode=mode),
            ndi.generic_laplace(
                x, lambda inp, ax, out, m, cv: ndi.correlate1d(
                    inp, kern, axis=ax, output=out, mode=m, cval=cv),
                mode=mode))
    return compare(
        "generic_gradient_magnitude",
        ed.generic_gradient_magnitude(
            x, lambda inp, ax, m, cv: ed.correlate1d(
                inp, kern, axis=ax, mode=m, cval=cv), mode=mode),
        ndi.generic_gradient_magnitude(
            x, lambda inp, ax, out, m, cv: ndi.correlate1d(
                inp, kern, axis=ax, output=out, mode=m, cval=cv),
            mode=mode))


def case_fourier_ellipsoid(rng):
    # operates on "fourier coefficients"; random real input exercises
    # the multiplier directly (scipy limits this one to 1-3 D)
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(v) for v in rng.integers(3, 14, ndim))
    x = rng.standard_normal(shape)
    size = (float(rng.uniform(0.5, 4.0)) if rng.integers(0, 2)
            else tuple(float(v) for v in rng.uniform(0.5, 4.0, ndim)))
    n = -1 if rng.integers(0, 2) else shape[-1]
    return compare("fourier_ellipsoid",
                   ed.fourier_ellipsoid(x, size, n=n),
                   ndi.fourier_ellipsoid(x, size, n=n), 1e-8)


def case_geometric(rng):
    # shared mapping lambda: works on scipy's int tuples AND on traces
    x = rand_input(rng, dtypes=("f8",))
    order = int(rng.integers(0, 6))
    mode = str(rng.choice(RESAMPLE_MODES))
    scale = rng.uniform(0.5, 1.5, x.ndim)
    off = rng.uniform(-2.0, 2.0, x.ndim)
    mapping = lambda c: tuple(  # noqa: E731
        c[i] * scale[i] + off[i] for i in range(len(c)))
    out_shape = (tuple(int(v) for v in rng.integers(2, 10, x.ndim))
                 if rng.integers(0, 2) else None)
    return compare(
        "geometric_transform",
        ed.geometric_transform(x, mapping, output_shape=out_shape,
                               order=order, mode=mode),
        ndi.geometric_transform(x, mapping, output_shape=out_shape,
                                order=order, mode=mode), 1e-8)


CASES = [case_gaussian, case_correlate, case_correlate1d, case_uniform,
         case_minmax, case_rank, case_grey, case_binary, case_fill_prop,
         case_label, case_edt, case_deriv, case_fourier, case_resample,
         case_measure, case_grey_structure, case_hit_or_miss,
         case_gauss_deriv, case_zoom, case_spline_filter,
         case_binary_iterstruct, case_cdt_bf, case_measure2,
         case_filter1d, case_generic, case_fourier_ellipsoid,
         case_geometric]


def main():
    rng = np.random.default_rng(SEED)
    failures = []
    errors = []
    per_case = {}
    for i in range(N_CASES):
        fn = CASES[i % len(CASES)]
        per_case[fn.__name__] = per_case.get(fn.__name__, 0) + 1
        sub = np.random.default_rng(rng.integers(0, 2**63))
        try:
            msg = fn(sub)
        except Exception as e:  # noqa: BLE001 — report, keep fuzzing
            errors.append(f"{i:4d} {fn.__name__}: EXCEPTION {e!r}")
            traceback.print_exc()
            continue
        if msg:
            failures.append(f"{i:4d} {msg}")
            print("MISMATCH", failures[-1], flush=True)
        if (i + 1) % 50 == 0:
            print(f"... {i+1}/{N_CASES} "
                  f"({len(failures)} mismatches, {len(errors)} errors)",
                  flush=True)
    print(f"cases per generator: {per_case}")
    if failures or errors:
        print(f"FAIL: {len(failures)} mismatches, {len(errors)} errors")
        for m in failures[:40]:
            print(" ", m)
        for m in errors[:40]:
            print(" ", m)
        sys.exit(1)
    print(f"PASS: {N_CASES} randomized configs match scipy")


if __name__ == "__main__":
    main()
