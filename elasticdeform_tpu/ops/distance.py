"""Distance transforms (``scipy.ndimage.distance_transform_*``
parity), TPU-first.

scipy's exact Euclidean distance transform is Felzenszwalb's
lower-envelope scan — a sequential, data-dependent-stack algorithm that
does not vectorize. The TPU-native formulation exploits that the
*separable decomposition* of the squared EDT is exact regardless of how
each 1-D min-plus is evaluated:

    f_k(i) = min_j [ f_{k-1}(j) + s_k^2 (i - j)^2 ]

Three evaluation tiers, all exact:

1. **First axis** — the input of the first pass is binary, so the pass
   degenerates to *distance to the nearest background voxel along the
   line*: two ``lax.cummax`` scans (left / right nearest-background
   index), O(n) work, no min-plus at all.
2. **Banded min-plus with an exactness certificate** — a width-``W``
   stencil of static shifted slices evaluates
   ``min_{|i-j|<=W} f(j) + s^2 (i-j)^2`` in O(nW) elementwise work. If
   every voxel of the banded result satisfies ``d <= (sW)^2`` the pass
   is *provably* exact (any out-of-band minimizer would have to beat a
   value its own distance term alone already exceeds), so the result
   is certified on device and ``lax.cond`` escalates through a ladder
   of widths (default 16, 64; ``ELASTICDEFORM_TPU_EDT_BAND_LADDER``)
   only when certification fails. Typical volumes certify at the first
   rung — distances are short wherever background is dense.
3. **Dense min-plus contraction** — the always-exact fallback: a
   broadcast add + min-reduce against the static (n, n) matrix
   ``s^2 (i - j)^2``, lines processed in VMEM-sized chunks under
   ``lax.map`` (per-platform chunk budget,
   ``ELASTICDEFORM_TPU_EDT_CHUNK_BYTES``).

The feature transform (``return_indices``) rides the same passes: the
per-stage argmin composes exactly because the final minimum is
attained through a per-stage minimizer.

The chamfer transform (``distance_transform_cdt``) is bounded-increment
label relaxation: ``d <- min(d, min_neighbors(d) + 1)`` iterated to the
fixpoint in one ``lax.while_loop`` (the same displacement-free stencil
slices as ops/morphology.py). For the cityblock (cross) and chessboard
(full) structures the chamfer metric equals L1 / Linf exactly, which is
also what backs the brute-force entry point.

Tie-breaking for feature indices is unspecified in scipy (it depends on
its scan order); tests assert the *implied distance* of our features
matches scipy's distances exactly instead of comparing raw indices.

Differential-tested against scipy.ndimage in tests/test_distance.py.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from elasticdeform_tpu.ops.filters import normalize_sequence
from elasticdeform_tpu.ops.morphology import generate_binary_structure

_BIG32 = float(np.finfo(np.float32).max / 16)


def _edt_chunk_bytes():
    """Per-pass chunk budget for the (chunk, n, n) dense min-plus
    intermediate. Measured on TPU v5e (tools/probe_edt.py): 16 MiB
    chunks beat 64 MiB 2.4x at n=128 (the intermediate blows past the
    fusion-friendly size well before 64 MiB); CPU keeps the larger
    chunk (fewer ``lax.map`` iterations, no VMEM to respect)."""
    v = os.environ.get("ELASTICDEFORM_TPU_EDT_CHUNK_BYTES")
    if v:
        return int(v)
    try:
        cpu = jax.devices()[0].platform == "cpu"
    except Exception:
        cpu = True
    return (64 << 20) if cpu else (16 << 20)


def _edt_band_ladder():
    """Escalation ladder of banded-pass half-widths tried (with an
    on-device exactness certificate) before the dense fallback."""
    v = os.environ.get("ELASTICDEFORM_TPU_EDT_BAND_LADDER")
    if v is not None:
        v = v.strip()
        return tuple(int(t) for t in v.split(",") if t.strip()) if v \
            else ()
    return (16, 64)


def _float_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _nearest_bg_last(fg):
    """Index distance to the nearest False along the last axis via two
    ``cummax`` scans. Returns ``(d, j)`` int32 with ``d == 2n`` (and
    ``j`` clipped in-range) where the line has no background."""
    n = fg.shape[-1]
    ax = fg.ndim - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    bg = ~fg
    none = jnp.int32(-1)
    left = lax.cummax(jnp.where(bg, idx, none), axis=ax)
    right_rev = lax.cummax(jnp.where(bg[..., ::-1], idx, none), axis=ax)
    right_rev = right_rev[..., ::-1]
    right = jnp.where(right_rev >= 0, n - 1 - right_rev, jnp.int32(n))
    sent = jnp.int32(2 * n)
    dl = jnp.where(left >= 0, idx - left, sent)
    dr = jnp.where(right < n, right - idx, sent)
    take_l = dl <= dr
    d = jnp.where(take_l, dl, dr)
    j = jnp.clip(jnp.where(take_l, left, right), 0, n - 1)
    return d, j


def _banded_last(g, spacing, W, want_j):
    """Banded min-plus along the last axis:
    ``out[i] = min_{|o|<=W} g[i+o] + (s o)^2`` as 2W static shifted
    slices (plus o=0). Exact at every voxel where ``out <= (sW)^2``."""
    n = g.shape[-1]
    big = jnp.asarray(_BIG32, g.dtype)
    pads = [(0, 0)] * (g.ndim - 1) + [(W, W)]
    gp = jnp.pad(g, pads, constant_values=big)
    best = g
    bestj = None
    if want_j:
        idx = jnp.arange(n, dtype=jnp.int32)
        bestj = jnp.broadcast_to(idx, g.shape)
    for o in sorted(range(-W, W + 1), key=abs):
        if o == 0:
            continue
        cand = lax.slice_in_dim(gp, W + o, W + o + n, axis=-1) \
            + jnp.asarray((spacing * o) ** 2, g.dtype)
        if want_j:
            take = cand < best
            best = jnp.where(take, cand, best)
            bestj = jnp.where(take, jnp.clip(idx + o, 0, n - 1), bestj)
        else:
            best = jnp.minimum(best, cand)
    return best, bestj


def _matrix_last(flat_in, idx_flat, spacing, n):
    """Dense exact min-plus over (m, n) lines against the static (n, n)
    cost matrix, chunked under ``lax.map`` to bound the (chunk, n, n)
    intermediate. Returns ``(out (m, n), new idx list or None)``."""
    D = (float(spacing) ** 2
         * (np.arange(n)[:, None] - np.arange(n)[None, :]) ** 2)
    D = jnp.asarray(D, flat_in.dtype)                 # (i, j)
    m = flat_in.shape[0]
    chunk = max(1, _edt_chunk_bytes()
                // (n * n * flat_in.dtype.itemsize))
    pad = (-m) % chunk
    flat = flat_in
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.zeros((pad, n), flat.dtype)], axis=0)
        if idx_flat is not None:
            idx_flat = [jnp.concatenate(
                [ix, jnp.zeros((pad, n), ix.dtype)], axis=0)
                for ix in idx_flat]
    nb = flat.shape[0] // chunk
    flat = flat.reshape(nb, chunk, n)
    if idx_flat is None:
        def body(rows):
            # rows: (chunk, n) -> min over j of rows[:, j] + D[i, j]
            return jnp.min(rows[:, None, :] + D[None], axis=-1)
        return lax.map(body, flat).reshape(-1, n)[:m], None

    idx_flat = [ix.reshape(nb, chunk, n) for ix in idx_flat]

    def body(args):
        rows = args[0]
        ixs = args[1:]
        cost = rows[:, None, :] + D[None]             # (chunk, i, j)
        jstar = jnp.argmin(cost, axis=-1)             # (chunk, i)
        val = jnp.take_along_axis(cost, jstar[..., None],
                                  axis=-1)[..., 0]
        new_ixs = tuple(jnp.take_along_axis(ix, jstar, axis=-1)
                        for ix in ixs)
        return (val,) + new_ixs

    res = lax.map(body, (flat,) + tuple(idx_flat))
    out = res[0].reshape(-1, n)[:m]
    new_idx = [ix.reshape(-1, n)[:m] for ix in res[1:]]
    return out, new_idx


def _minplus_pass(f, axis, spacing, idx_list):
    """One exact 1-D squared-EDT pass along ``axis``: certificate-
    escalated banded stencils, dense fallback (module docstring tier 2
    then 3); updates the feature-index arrays in ``idx_list`` (or
    None) through the same argmin."""
    n = int(f.shape[axis])
    want = idx_list is not None
    moved = jnp.moveaxis(f, axis, -1)
    midx = [jnp.moveaxis(ix, axis, -1) for ix in idx_list] if want \
        else None
    lead_shape = moved.shape[:-1]
    m = int(np.prod(lead_shape)) if lead_shape else 1

    ladder = [w for w in _edt_band_ladder() if 0 < w < n - 1]

    def dense():
        flat = moved.reshape(m, n)
        iflat = [ix.reshape(m, n) for ix in midx] if want else None
        out, new_idx = _matrix_last(flat, iflat, spacing, n)
        out = out.reshape(lead_shape + (n,))
        if not want:
            return out, ()
        return out, tuple(ix.reshape(lead_shape + (n,))
                          for ix in new_idx)

    def level(k):
        if k == len(ladder):
            return dense()
        W = ladder[k]
        out, bestj = _banded_last(moved, spacing, W, want)
        res_idx = tuple(jnp.take_along_axis(ix, bestj, axis=-1)
                        for ix in midx) if want else ()
        cert = jnp.all(out <= jnp.asarray((float(spacing) * W) ** 2,
                                          out.dtype))
        return lax.cond(cert, lambda: (out, res_idx),
                        lambda: level(k + 1))

    out, new_midx = level(0)
    out = jnp.moveaxis(out, -1, axis)
    if not want:
        return out, None
    return out, [jnp.moveaxis(ix, -1, axis) for ix in new_midx]


def edt_core(input, sampling=None, return_indices=False):
    """Squared-EDT core: returns (squared_distances, index_arrays or
    None), fully jit-traceable."""
    x = jnp.asarray(input)
    fg = x != 0
    ndim = fg.ndim
    samplings = [float(s) for s in normalize_sequence(
        1.0 if sampling is None else sampling, ndim, "sampling")]
    dt = _float_dtype()
    big = jnp.asarray(_BIG32, dt)
    idx_list = None
    if return_indices:
        idx_list = []
        for ax in range(ndim):
            view = [1] * ndim
            view[ax] = fg.shape[ax]
            coord = jnp.arange(fg.shape[ax],
                               dtype=jnp.int32).reshape(view)
            idx_list.append(jnp.broadcast_to(coord, fg.shape))
    if ndim == 0:
        return jnp.where(fg, big, jnp.zeros(fg.shape, dt)), idx_list

    # tier 1: the first pass sees binary input — nearest-background
    # scans (O(n)) replace the min-plus entirely
    moved_fg = jnp.moveaxis(fg, 0, -1)
    n0 = fg.shape[0]
    d0, j0 = _nearest_bg_last(moved_fg)
    f = jnp.where(d0 < 2 * n0,
                  (jnp.asarray(samplings[0], dt) * d0.astype(dt)) ** 2,
                  big)
    f = jnp.moveaxis(f, -1, 0)
    if return_indices:
        j0 = jnp.moveaxis(j0, -1, 0)
        # gathering the coordinate grids along axis 0 at j0 leaves all
        # but the axis-0 grid unchanged
        idx_list[0] = j0
    for ax in range(1, ndim):
        f, idx_list = _minplus_pass(f, ax, samplings[ax], idx_list)
    return f, idx_list


def _fill_out_arrays(results, return_flags, out_arrays, dtypes, shapes):
    """scipy's distance-transform output contract: a supplied
    ``distances``/``indices`` array is validated (scipy's error
    strings), filled in place (eager callers only — under jit pass
    ``None``), and omitted from the return; ``None`` is returned when
    every requested output was supplied."""
    ret = []
    for res, (name, flag), arr, dt, shp in zip(
            results, return_flags, out_arrays, dtypes, shapes):
        if arr is None:
            if flag:
                ret.append(res)
            continue
        if not flag:
            raise RuntimeError(
                f"return_{name} must be True if {name} is supplied")
        arr = np.asarray(arr) if not isinstance(arr, np.ndarray) else arr
        if arr.dtype != np.dtype(dt):
            raise RuntimeError(f"{name} array must be {np.dtype(dt).name}")
        if arr.shape != shp:
            raise RuntimeError(f"{name} array has wrong shape")
        arr[...] = np.asarray(res).astype(dt)
    if not ret:
        return None
    return ret[0] if len(ret) == 1 else ret


def distance_transform_edt(input, sampling=None, return_distances=True,
                           return_indices=False, distances=None,
                           indices=None):
    """``scipy.ndimage.distance_transform_edt`` equivalent (see module
    docstring for the TPU formulation). Returns distances, indices
    (as one ``(ndim, *shape)`` int32 array), or ``[distances,
    indices]`` exactly like scipy; feature tie-breaking may differ
    from scipy's scan order (the distances are identical). Supplied
    ``distances``/``indices`` arrays are filled in place and omitted
    from the return, like scipy (eager callers only)."""
    if not (return_distances or return_indices):
        raise RuntimeError("at least one of distances/indices must be "
                           "returned")
    x = jnp.asarray(input)
    f, idx_list = edt_core(input, sampling, return_indices or
                           indices is not None)
    dist = jnp.sqrt(f) if return_distances else None
    idx = (jnp.stack(idx_list, axis=0)
           if (return_indices or indices is not None) else None)
    return _fill_out_arrays(
        [dist, idx],
        [("distances", return_distances), ("indices", return_indices)],
        [distances, indices],
        [np.float64, np.int32],
        [x.shape, (x.ndim,) + x.shape])


def _cdt_structure(metric, ndim):
    if isinstance(metric, str):
        m = metric.lower()
        if m in ("cityblock", "taxicab"):
            return generate_binary_structure(ndim, 1)
        if m == "chessboard":
            return generate_binary_structure(ndim, ndim)
        raise ValueError(f"invalid metric provided: {metric!r}")
    return np.asarray(metric, dtype=bool)


def cdt_core(input, structure, return_indices=False):
    """Chamfer-distance fixpoint relaxation; returns (int32 distances,
    raveled feature indices or None)."""
    x = jnp.asarray(input)
    fg = x != 0
    ndim = fg.ndim
    shape = fg.shape
    n = int(np.prod(shape)) if shape else 1
    structure = np.asarray(structure, dtype=bool)
    if structure.shape != (3,) * ndim:
        raise RuntimeError("structure dimensions must be 3")
    offs = [tuple(int(t) - 1 for t in off)
            for off in zip(*np.nonzero(structure))]
    offs = [o for o in offs if o != (0,) * ndim]
    big = jnp.int32(np.iinfo(np.int32).max // 4)
    d0 = jnp.where(fg, big, jnp.int32(0))
    pads = [(1, 1)] * ndim
    idx0 = jnp.arange(n, dtype=jnp.int32).reshape(shape)

    def step(carry):
        d, ix, _ = carry
        dp = jnp.pad(d, pads, constant_values=big)
        ixp = jnp.pad(ix, pads, constant_values=0)
        nd, nix = d, ix
        for off in offs:
            start = [1 + o for o in off]
            limit = [1 + o + s for o, s in zip(off, shape)]
            cand = lax.slice(dp, start, limit) + 1
            cix = lax.slice(ixp, start, limit)
            take = cand < nd
            nd = jnp.where(take, cand, nd)
            nix = jnp.where(take, cix, nix)
        return nd, nix, jnp.any(nd != d)

    d, ix, _ = lax.while_loop(
        lambda c: c[2], step, (d0, idx0, jnp.asarray(True)))
    return d, (ix if return_indices else None)


def distance_transform_cdt(input, metric="chessboard",
                           return_distances=True,
                           return_indices=False, distances=None,
                           indices=None):
    """``scipy.ndimage.distance_transform_cdt`` equivalent: chamfer
    distance (int32) for the cityblock/taxicab or chessboard metric
    (or a custom 3^ndim structure), via on-device fixpoint relaxation.
    Supplied ``distances``/``indices`` arrays are filled in place and
    omitted from the return, like scipy."""
    if not (return_distances or return_indices):
        raise RuntimeError("at least one of distances/indices must be "
                           "returned")
    x = jnp.asarray(input)
    structure = _cdt_structure(metric, x.ndim)
    want_ix = return_indices or indices is not None
    d, ix = cdt_core(x, structure, want_ix)
    coords = None
    if want_ix:
        coords = jnp.stack(
            jnp.unravel_index(ix, x.shape), axis=0).astype(jnp.int32)
    return _fill_out_arrays(
        [d if return_distances else None, coords],
        [("distances", return_distances), ("indices", return_indices)],
        [distances, indices],
        [np.int32, np.int32],
        [x.shape, (x.ndim,) + x.shape])


def distance_transform_bf(input, metric="euclidean", sampling=None,
                          return_distances=True, return_indices=False,
                          distances=None, indices=None):
    """``scipy.ndimage.distance_transform_bf`` equivalent. The
    Euclidean metric routes to the exact separable EDT; cityblock /
    chessboard route to the chamfer relaxation (exact for those
    metrics), cast to scipy's uint32. Supplied ``distances``/``indices``
    arrays are filled in place and omitted from the return, like
    scipy."""
    if not (return_distances or return_indices):
        raise RuntimeError("at least one of distances/indices must be "
                           "returned")
    m = metric.lower() if isinstance(metric, str) else metric
    if m in ("euclidean", 1):
        return distance_transform_edt(input, sampling,
                                      return_distances, return_indices,
                                      distances, indices)
    if m in ("cityblock", "taxicab", 2):
        name = "taxicab"
    elif m in ("chessboard", 3):
        name = "chessboard"
    else:
        raise RuntimeError(f"{metric} metric not supported")
    x = jnp.asarray(input)
    want_ix = return_indices or indices is not None
    d, ix = cdt_core(x, _cdt_structure(name, x.ndim), want_ix)
    coords = None
    if want_ix:
        coords = jnp.stack(
            jnp.unravel_index(ix, x.shape), axis=0).astype(jnp.int32)
    return _fill_out_arrays(
        [d.astype(jnp.uint32) if return_distances else None, coords],
        [("distances", return_distances), ("indices", return_indices)],
        [distances, indices],
        [np.uint32, np.int32],
        [x.shape, (x.ndim,) + x.shape])
