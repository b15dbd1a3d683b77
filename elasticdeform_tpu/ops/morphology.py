"""Order-statistic filters and mathematical morphology, TPU-first
(``scipy.ndimage`` filter/morphology parity).

The reference library (gvtulder/elasticdeform) has no filtering at all;
this tier completes the image-processing toolbox around the resampler
the way scipy.ndimage pairs its interpolation module with filters and
morphology — registration and augmentation pipelines routinely need
both (masks eroded before sampling, median-denoised similarity images,
binary hole-filling of segmentations fed back as deformation targets).

Design (nothing here resembles scipy's C; the formulations are chosen
for XLA):

* Boundary handling is a *precomputed index fold*: the scipy filter
  modes (reflect / nearest / mirror / wrap) are data-independent maps of
  axis positions, so each padded axis is one static ``jnp.take`` with a
  trace-time numpy index vector (``constant`` pads with ``cval`` via
  ``jnp.pad``).  Any pad width works — folds repeat exactly like
  scipy's.
* Separable box min/max filters are ``lax.reduce_window`` calls — the
  native TPU windowed-reduction primitive — preserving integer dtypes
  exactly (no arithmetic is performed).
* Arbitrary footprints unroll into a static stack of shifted slices
  (one ``lax.slice`` of the padded array per footprint tap) reduced by
  ``jnp.minimum``/``maximum`` — displacement-free stencils need no
  gather at all, so there is no scatter/gather wall here.
* Rank / median / percentile filters select the k-th smallest of that
  same tap stack with a pruned Batcher min/max comparator network
  (``_rank_select``) — a static-shape formulation of the
  order-statistic filter (scipy's C maintains a histogram per line; on
  TPU each compare-exchange is one fused ``minimum``/``maximum`` pair
  vectorized over every output voxel, 17.6x faster than the
  ``jnp.sort`` primitive it replaced — 3710 vs 210 Mvox/s on a 3^3
  median over 128^3).
* Binary morphology iterates the Boolean stencil under ``lax.fori_loop``
  (fixed ``iterations``) or ``lax.while_loop`` (``iterations <= 0``:
  run to the fixpoint), entirely on device and jit-traceable.

Semantics follow scipy.ndimage exactly (footprint/structure/origin
conventions, the grey-dilation footprint reflection, border_value,
masks); differential-tested against scipy in tests/test_morphology.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from elasticdeform_tpu.ops.filters import (
    check_mode, normalize_sequence, pad_all, pad_axis)


def footprint_centers(fshape, origins):
    """Per-axis center tap (``k//2 + origin``), validated like scipy."""
    centers = []
    for k, o in zip(fshape, origins):
        c = k // 2 + int(o)
        if not 0 <= c < k:
            raise ValueError("invalid origin")
        centers.append(c)
    return centers


def footprint_tap_stack(X, footprint, origins, mode, cval):
    """Stack the footprint taps of every output voxel along a new
    trailing axis (raster order of the footprint — scipy's window
    order): pad once, then one static ``lax.slice`` per tap. Shared by
    the rank filters and ``generic_filter``."""
    X = jnp.asarray(X)
    footprint = np.asarray(footprint, dtype=bool)
    md = check_mode(mode)
    centers = footprint_centers(footprint.shape, origins)
    pads = [(c, k - 1 - c) for c, k in zip(centers, footprint.shape)]
    Xp = pad_all(X, pads, [md] * X.ndim, cval)
    taps = list(zip(*np.nonzero(footprint)))
    return jnp.stack(_tap_slices(Xp, X.shape, taps), axis=-1)


def _tap_slices(Xp, out_shape, taps):
    """Static shifted views of the padded array, one per footprint tap
    offset (each is a single ``lax.slice`` — no gather)."""
    views = []
    for off in taps:
        start = [int(o) for o in off]
        limit = [int(s) + int(o) for s, o in zip(out_shape, off)]
        views.append(lax.slice(Xp, start, limit))
    return views


def _expand_to_ndim(arr, ndim, axes):
    """Insert singleton dims so a ``len(axes)``-D footprint/structure
    covers the full input rank (scipy ``_expand_footprint``)."""
    arr = np.asarray(arr)
    if arr.ndim == ndim:
        return arr
    return np.expand_dims(
        arr, tuple(ax for ax in range(ndim) if ax not in axes))


def _normalize_axes(axes, ndim):
    if axes is None:
        return tuple(range(ndim))
    if np.isscalar(axes):
        axes = (axes,)
    axes = tuple(int(a) % ndim for a in axes)
    if len(set(axes)) != len(axes):
        raise ValueError("axes must be unique")
    return axes


# ---------------------------------------------------------------------------
# min / max filters


def min_max_filter1d(X, size, axis, mode, cval, origin, minimum):
    """``scipy.ndimage.minimum_filter1d`` / ``maximum_filter1d``:
    pad + ``lax.reduce_window`` (dtype-preserving — no arithmetic)."""
    X = jnp.asarray(X)
    size = int(size)
    if size < 1:
        raise RuntimeError("incorrect filter size")
    axis = axis % X.ndim
    mode = check_mode(mode)
    c = size // 2 + int(origin)
    if not 0 <= c < size:
        raise ValueError("invalid origin")
    Xp = pad_axis(X, axis, c, size - 1 - c, mode, cval)
    if jnp.issubdtype(X.dtype, jnp.integer):
        info = jnp.iinfo(X.dtype)
        init = info.max if minimum else info.min
    elif X.dtype == jnp.bool_:
        init = True if minimum else False
    else:
        init = jnp.inf if minimum else -jnp.inf
    window = [1] * X.ndim
    window[axis] = size
    return lax.reduce_window(
        Xp, jnp.asarray(init, X.dtype),
        lax.min if minimum else lax.max,
        window_dimensions=window, window_strides=[1] * X.ndim,
        padding="VALID")


def _resolve_footprint(ndim, axes, size, footprint, structure):
    """scipy ``_min_or_max_filter`` front half: decide separable box vs
    explicit footprint (+ optional non-flat structure)."""
    separable = False
    sizes = None
    if structure is None:
        if footprint is None:
            if size is None:
                raise RuntimeError("no footprint provided")
            sizes = normalize_sequence(size, len(axes), "size")
            separable = True
        else:
            footprint = np.asarray(footprint, dtype=bool)
            if not footprint.any():
                raise ValueError("All-zero footprint is not supported.")
            if footprint.all():
                sizes = list(footprint.shape)
                footprint = None
                separable = True
    else:
        structure = np.asarray(structure, dtype=np.float64)
        if footprint is None:
            footprint = np.ones(structure.shape, bool)
        else:
            footprint = np.asarray(footprint, dtype=bool)
    return separable, sizes, footprint, structure


def min_max_filter(X, size, footprint, structure, mode, cval, origin,
                   minimum, axes=None):
    """N-D minimum/maximum filter (grey erosion/dilation when
    ``structure`` is non-flat). Matches scipy's separable decomposition
    for box footprints; otherwise reduces a static stack of shifted
    slices."""
    X = jnp.asarray(X)
    axes = _normalize_axes(axes, X.ndim)
    separable, sizes, footprint, structure = _resolve_footprint(
        X.ndim, axes, size, footprint, structure)
    origins = normalize_sequence(origin, len(axes), "origin")
    modes = normalize_sequence(mode, len(axes), "mode")
    if separable:
        for ax, s, o, md in zip(axes, sizes, origins, modes):
            if int(s) > 1:
                X = min_max_filter1d(X, int(s), ax, md, cval, o, minimum)
        return X
    if len({check_mode(m) for m in modes}) != 1:
        raise RuntimeError("A sequence of modes is not supported for "
                           "non-separable footprints")
    md = check_mode(modes[0])
    footprint = _expand_to_ndim(footprint, X.ndim, axes)
    if structure is not None:
        structure = _expand_to_ndim(structure, X.ndim, axes)
    full_origins = [0] * X.ndim
    for ax, o in zip(axes, origins):
        full_origins[ax] = int(o)
    centers = footprint_centers(footprint.shape, full_origins)
    pads = [(c, k - 1 - c) for c, k in zip(centers, footprint.shape)]
    flat = structure is None or not np.any(structure)
    work = X
    if not flat and not jnp.issubdtype(X.dtype, jnp.floating):
        work = X.astype(jnp.float64 if jax.config.jax_enable_x64
                        else jnp.float32)
    Xp = pad_all(work, pads, [md] * X.ndim, cval)
    taps = list(zip(*np.nonzero(footprint)))
    views = _tap_slices(Xp, X.shape, taps)
    reduce_fn = jnp.minimum if minimum else jnp.maximum
    acc = None
    for off, v in zip(taps, views):
        if not flat:
            s = float(structure[off])
            v = v - s if minimum else v + s
        acc = v if acc is None else reduce_fn(acc, v)
    if acc.dtype != X.dtype and jnp.issubdtype(X.dtype, jnp.integer):
        # scipy's C casts double->int by truncation toward zero; its
        # non-flat int path additionally truncates the STRUCTURE per
        # tap (except the raster-first tap — an accidental first-tap
        # inconsistency in NI_MinOrMaxFilter we deliberately do not
        # replicate): we truncate the double min/max, documented in
        # docs/source/migration.rst
        acc = jnp.trunc(acc).astype(X.dtype)
    elif acc.dtype != X.dtype:
        acc = acc.astype(X.dtype)
    return acc


# ---------------------------------------------------------------------------
# rank / median / percentile


# Footprints up to this many taps select the rank with a pruned
# Batcher min/max network (fused VPU compare-exchanges, no sort
# primitive); larger footprints fall back to jnp.sort. The cap is
# measured, not guessed: at 27 taps the network is 17.6x faster than
# the sort (3710 vs 210 Mvox/s on 128^3 v5e), but at 125 taps the
# 1211-comparator network over 128 live tap buffers stops fusing
# cheaply and measures within 9% of the sort (44.4 vs 48.6 ms/vol).
_RANK_NETWORK_MAX_TAPS = 64


@functools.lru_cache(maxsize=None)
def _batcher_pairs(n):
    """Batcher odd-even mergesort comparator list for power-of-two n
    (classic recursive construction; (i, j) means wire i gets the min,
    wire j the max)."""
    pairs = []

    def merge(lo, m, r):
        step = r * 2
        if step < m:
            merge(lo, m, step)
            merge(lo + r, m, step)
            for i in range(lo + r, lo + m - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort(lo, hi):
        if hi - lo >= 1:
            mid = lo + (hi - lo) // 2
            sort(lo, mid)
            sort(mid + 1, hi)
            merge(lo, hi - lo + 1, 1)

    sort(0, n - 1)
    return tuple(pairs)


@functools.lru_cache(maxsize=None)
def _rank_network(k, rank):
    """Comparators of the Batcher network for k padded to a power of
    two, pruned backwards to only the compare-exchanges that can reach
    sorted position ``rank`` (the standard single-output pruning —
    typically halves the network for the median)."""
    n = 1 << max(0, (int(k) - 1).bit_length())
    pairs = _batcher_pairs(n) if n > 1 else ()
    live = {int(rank)}
    kept = []
    for i, j in reversed(pairs):
        if i in live or j in live:
            kept.append((i, j))
            live.add(i)
            live.add(j)
    return n, tuple(reversed(kept))


def _pad_max_value(dtype):
    dtype = jnp.dtype(dtype)
    if dtype == jnp.dtype(bool):
        return True
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.asarray(jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).max, dtype)


def _rank_select(stack, rank):
    """k-th smallest along the trailing tap axis via the pruned
    network: each comparator is one fused minimum/maximum pair over
    the whole volume — no sort primitive, no gathers. Padding wires
    hold the dtype's +max so the lowest k positions sort identically
    to the unpadded multiset. NaN note: min/max propagate NaN to both
    wires, so any-NaN windows return NaN (jnp.sort would order NaNs
    last); scipy's C selection leaves NaN windows unspecified too."""
    k = int(stack.shape[-1])
    n, pairs = _rank_network(k, rank)
    arrs = [stack[..., t] for t in range(k)]
    if n > k:
        pad = jnp.full(stack.shape[:-1], _pad_max_value(stack.dtype),
                       stack.dtype)
        arrs += [pad] * (n - k)
    for i, j in pairs:
        a, b = arrs[i], arrs[j]
        arrs[i] = jnp.minimum(a, b)
        arrs[j] = jnp.maximum(a, b)
    return arrs[rank]


def rank_filter(X, rank, size, footprint, mode, cval, origin,
                operation="rank", axes=None):
    """Order-statistic filter: sort the footprint taps along a new
    trailing axis and pick ``rank`` (scipy ``_rank_filter`` semantics,
    including the min/max short-circuits)."""
    X = jnp.asarray(X)
    axes = _normalize_axes(axes, X.ndim)
    if footprint is None:
        if size is None:
            raise RuntimeError("no footprint or filter size provided")
        sizes = normalize_sequence(size, len(axes), "size")
        footprint = np.ones(sizes, dtype=bool)
    else:
        footprint = np.asarray(footprint, dtype=bool)
    footprint = _expand_to_ndim(footprint, X.ndim, axes)
    origins = normalize_sequence(origin, len(axes), "origin")
    full_origins = [0] * X.ndim
    for ax, o in zip(axes, origins):
        full_origins[ax] = int(o)
    filter_size = int(footprint.sum())
    if operation == "median":
        rank = filter_size // 2
    elif operation == "percentile":
        percentile = float(rank)
        if percentile < 0.0:
            percentile += 100.0
        if percentile < 0 or percentile > 100:
            raise RuntimeError("invalid percentile")
        if percentile == 100.0:
            rank = filter_size - 1
        else:
            rank = int(float(filter_size) * percentile / 100.0)
    rank = int(rank)
    if rank < 0:
        rank += filter_size
    if rank < 0 or rank >= filter_size:
        raise RuntimeError("rank not within filter footprint size")
    if rank == 0:
        return min_max_filter(X, None, footprint, None, mode, cval,
                              full_origins, True)
    if rank == filter_size - 1:
        return min_max_filter(X, None, footprint, None, mode, cval,
                              full_origins, False)
    if not isinstance(mode, str):
        raise RuntimeError("A sequence of modes is not supported by "
                           "non-separable rank filters")
    stack = footprint_tap_stack(X, footprint, full_origins, mode, cval)
    if filter_size <= _RANK_NETWORK_MAX_TAPS:
        return _rank_select(stack, rank)
    return jnp.sort(stack, axis=-1)[..., rank]


# ---------------------------------------------------------------------------
# binary morphology


def generate_binary_structure(rank, connectivity):
    """scipy ``generate_binary_structure``: taps within L1 distance
    ``connectivity`` of the center of a 3^rank cube."""
    if connectivity < 1:
        connectivity = 1
    if rank < 1:
        return np.asarray(True)
    output = np.fabs(np.indices([3] * rank) - 1)
    output = np.add.reduce(output, 0)
    return output <= connectivity


def iterate_structure(structure, iterations, origin=None):
    """scipy ``iterate_structure``: the structure dilated with itself
    ``iterations - 1`` times (computed in numpy at trace time)."""
    structure = np.asarray(structure, dtype=bool)
    if iterations < 2:
        out = structure.copy()
    else:
        ni = int(iterations) - 1
        shape = [ii + ni * (ii - 1) for ii in structure.shape]
        pos = [ni * (structure.shape[ii] // 2)
               for ii in range(len(shape))]
        slc = tuple(slice(pos[ii], pos[ii] + structure.shape[ii])
                    for ii in range(len(shape)))
        out = np.zeros(shape, bool)
        out[slc] = structure != 0
        out = np.asarray(_host_binary_dilation(out, structure, ni))
    if origin is None:
        return out
    origin = normalize_sequence(origin, structure.ndim, "origin")
    return out, [int(iterations) * o for o in origin]


def _host_binary_dilation(x, structure, iterations):
    """Tiny trace-time helper for iterate_structure (numpy-only)."""
    structure = np.asarray(structure, bool)
    offs = [tuple(int(t) - s // 2 for t, s in
                  zip(off, structure.shape))
            for off in zip(*np.nonzero(structure[tuple(
                slice(None, None, -1) for _ in structure.shape)]))]
    for _ in range(int(iterations)):
        out = np.zeros_like(x)
        for off in offs:
            src = [slice(max(0, -o), x.shape[d] - max(0, o))
                   for d, o in enumerate(off)]
            dst = [slice(max(0, o), x.shape[d] - max(0, -o))
                   for d, o in enumerate(off)]
            out[tuple(dst)] |= x[tuple(src)]
        x = out
    return x


def _binary_stencil(shape, structure, origin, dilation):
    """Static tap offsets + pad widths for one binary erosion/dilation
    step. Dilation reflects the structure and mirrors the origin
    (scipy convention)."""
    structure = np.asarray(structure, dtype=bool)
    origins = normalize_sequence(origin, structure.ndim, "origin")
    if dilation:
        structure = structure[tuple(slice(None, None, -1)
                                    for _ in structure.shape)]
        origins = [-o for o in origins]
        for ii, s in enumerate(structure.shape):
            if not s & 1:
                origins[ii] -= 1
    centers = footprint_centers(structure.shape, origins)
    pads = [(c, k - 1 - c) for c, k in zip(centers, structure.shape)]
    taps = list(zip(*np.nonzero(structure)))
    return taps, pads


def _binary_step(x, taps, pads, border_value, dilation, out_shape):
    if not taps:
        # empty structuring element: erosion is the empty conjunction
        # (all True), dilation the empty disjunction (all False) —
        # scipy's convention; found by tools/fuzz_ndimage.py via
        # binary_hit_or_miss with an all-True s1 (=> all-False s2)
        return jnp.full(out_shape, not dilation)
    Xp = jnp.pad(x, pads, constant_values=bool(border_value))
    views = _tap_slices(Xp, out_shape, taps)
    acc = None
    for v in views:
        if dilation:
            acc = v if acc is None else acc | v
        else:
            acc = v if acc is None else acc & v
    return acc


def binary_erosion_dilation(input, structure, iterations, mask,
                            border_value, origin, dilation):
    """Shared driver for ``binary_erosion`` / ``binary_dilation``:
    the Boolean stencil iterated under ``fori_loop`` (fixed count) or
    ``while_loop`` (``iterations <= 0``: to the fixpoint), mask-gated
    per step like scipy."""
    x = jnp.asarray(input) != 0
    if structure is None:
        structure = generate_binary_structure(x.ndim, 1)
    structure = np.asarray(structure, dtype=bool)
    if structure.ndim != x.ndim:
        raise RuntimeError("structure rank must equal input rank")
    taps, pads = _binary_stencil(x.shape, structure, origin, dilation)
    border = bool(border_value)
    m = None if mask is None else (jnp.asarray(mask) != 0)

    def step(v):
        out = _binary_step(v, taps, pads, border, dilation, x.shape)
        if m is not None:
            out = jnp.where(m, out, v)
        return out

    iterations = int(iterations)
    if iterations == 1:
        return step(x)
    if iterations > 1:
        return lax.fori_loop(0, iterations, lambda i, v: step(v), x)

    # fixpoint: plain stencil sweeps under one while_loop. A
    # segmented-OR-scan boost (the measure.label_roots trick) was
    # A/B-ed on chip and LOSES here by ~18x (c14 1219 -> 66 Mvox/s,
    # bench_artifacts/tpu_ci_20260819_183023.json): a boolean stencil
    # sweep costs ~15 us on 128^3 v5e so even ~100 sweeps finish in
    # ~1.5 ms, while one associative-scan sweep costs ~ms — scans only
    # pay when each sweep carries expensive int32 jump gathers (label).
    def cond(carry):
        v, changed = carry
        return changed

    def body(carry):
        v, _ = carry
        nv = step(v)
        return nv, jnp.any(nv != v)

    out, _ = lax.while_loop(cond, body, (x, jnp.asarray(True)))
    return out


# ---------------------------------------------------------------------------
# watershed (image foresting transform)


def watershed_ift(input, markers, structure=None):
    """Watershed by image foresting transform
    (``scipy.ndimage.watershed_ift`` equivalent up to plateau
    tie-breaking — see below): every non-marker voxel is claimed by the
    marker with the cheapest path, where a path's cost is lexicographic
    ``(max intensity along the path, path length, marker label)``.

    This is the *textbook* IFT watershed (Falcão 2004: each voxel joins
    the marker minimizing the max-arc path cost), realized as
    data-parallel lexicographic relaxation (Bellman–Ford style)
    iterated to the fixpoint in one ``lax.while_loop`` — deterministic
    and jit-traceable. It intentionally does NOT reproduce scipy's
    voxel-for-voxel output: scipy's C floods with a bucket queue whose
    results are queue-order artifacts rather than cost-optimal
    assignments (observed: with two markers on an image with a single
    200-high ridge, scipy labels voxels that have a strictly
    cheaper-by-200 path to marker 1 with marker 2; on an all-zero image
    nearly everything goes to whichever marker was queued last).
    tests/test_distance.py pins the 1-D strict-basin cases where scipy
    agrees, and the basin semantics directly elsewhere.

    ``markers``: positive = seeds, negative = background seeds (they
    flood too, as in scipy); output has the markers' dtype.
    """
    x = jnp.asarray(input)
    if x.dtype not in (jnp.uint8, jnp.uint16):
        raise TypeError("only 8 and 16 unsigned inputs are supported")
    markers = jnp.asarray(markers)
    if markers.shape != x.shape:
        raise RuntimeError("input and markers must have equal shapes")
    ndim = x.ndim
    if structure is None:
        structure = generate_binary_structure(ndim, 1)
    structure = np.asarray(structure, dtype=bool)
    if structure.shape != (3,) * ndim:
        raise RuntimeError("structure dimensions must be equal to 3")
    offs = [tuple(int(t) - 1 for t in off)
            for off in zip(*np.nonzero(structure))]
    offs = [o for o in offs if o != (0,) * ndim]

    shape = x.shape
    big_c = jnp.int32(np.iinfo(np.int32).max // 4)
    seeded = markers != 0
    cost0 = jnp.where(seeded, x.astype(jnp.int32), big_c)
    steps0 = jnp.where(seeded, jnp.int32(0), big_c)
    lab0 = jnp.where(seeded, markers.astype(jnp.int32), jnp.int32(0))
    xi = x.astype(jnp.int32)
    pads = [(1, 1)] * ndim

    def step(carry):
        c, s, l, _ = carry
        cp = jnp.pad(c, pads, constant_values=big_c)
        sp = jnp.pad(s, pads, constant_values=big_c)
        lp = jnp.pad(l, pads, constant_values=0)
        nc, ns, nl = c, s, l
        for off in offs:
            start = [1 + o for o in off]
            limit = [1 + o + sz for o, sz in zip(off, shape)]
            cc = jnp.maximum(lax.slice(cp, start, limit), xi)
            cs = lax.slice(sp, start, limit) + 1
            cl = lax.slice(lp, start, limit)
            valid = cl != 0
            better = valid & (
                (cc < nc)
                | ((cc == nc) & (cs < ns))
                | ((cc == nc) & (cs == ns) & (cl < nl)))
            nc = jnp.where(better, cc, nc)
            ns = jnp.where(better, cs, ns)
            nl = jnp.where(better, cl, nl)
        changed = jnp.any((nc != c) | (ns != s) | (nl != l))
        return nc, ns, nl, changed

    _, _, lab, _ = lax.while_loop(
        lambda carry: carry[3], step,
        (cost0, steps0, lab0, jnp.asarray(True)))
    return lab.astype(markers.dtype)
