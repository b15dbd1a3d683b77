"""Boundary-mode coordinate mapping.

Semantics match the reference C library (reference deform.c:47-128,
``map_coordinate``), which keeps the *pre-SciPy-1.6* conventions:

* ``wrap`` uses a period of ``len - 1`` (reference deform.c:75-79, 114-116),
* the boundary mode is applied ONCE to the floating-point sample coordinate;
  any interpolation-filter taps that still fall outside the array are always
  folded back with MIRROR index arithmetic regardless of mode (reference
  deform.c:664-686, 791-813),
* ``constant`` returns a ``-1`` sentinel (here: an explicit validity mask).

Mode codes match reference deform_grid.py:440-454 (`_extend_mode_to_code`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# integer codes, identical to reference deform_grid.py:443-452
MODE_NEAREST = 0
MODE_WRAP = 1
MODE_REFLECT = 2
MODE_MIRROR = 3
MODE_CONSTANT = 4

_MODE_NAMES = {
    "nearest": MODE_NEAREST,
    "wrap": MODE_WRAP,
    "reflect": MODE_REFLECT,
    "mirror": MODE_MIRROR,
    "constant": MODE_CONSTANT,
}


def mode_to_code(mode) -> int:
    """Convert a boundary-mode name to its integer code.

    Mirrors reference deform_grid.py:440-454 including the error behaviour.
    """
    if isinstance(mode, int):
        if mode in (0, 1, 2, 3, 4):
            return mode
        raise RuntimeError("boundary mode not supported")
    try:
        return _MODE_NAMES[mode]
    except KeyError:
        raise RuntimeError("boundary mode not supported") from None


def map_coordinate(cc, length: int, mode: int):
    """Map floating-point coordinates outside ``[0, length-1]`` into range.

    Vectorized, branchless equivalent of reference deform.c:47-128. ``mode``
    and ``length`` are static Python ints; ``cc`` is an array.

    Returns ``(mapped, inside)`` where ``inside`` is a boolean mask that is
    all-True except for ``constant`` mode, where it marks in-range samples
    (the reference uses a ``-1`` sentinel + per-voxel ``break``,
    deform.c:84-87, 819-823 — in vectorized code that becomes this mask).
    """
    cc = jnp.asarray(cc)
    inside = jnp.ones(cc.shape, dtype=bool)
    below = cc < 0
    above = cc > length - 1

    if mode == MODE_CONSTANT:
        inside = ~(below | above)
        # mapped value is irrelevant where outside; keep it in-range so the
        # downstream gather index math stays valid.
        return jnp.clip(cc, 0, length - 1), inside

    if mode == MODE_NEAREST:
        return jnp.clip(cc, 0, length - 1), inside

    if length <= 1:
        return jnp.zeros_like(cc), inside

    if mode == MODE_MIRROR:
        sz2 = 2 * length - 2
        # below: fold into (-sz2, 0], then reflect (deform.c:52-59)
        neg = sz2 * jnp.trunc(-cc / sz2) + cc
        neg = jnp.where(neg <= 1 - length, neg + sz2, -neg)
        # above: fold into [0, sz2), then reflect (deform.c:90-98)
        pos = cc - sz2 * jnp.trunc(cc / sz2)
        pos = jnp.where(pos >= length, sz2 - pos, pos)
        return jnp.where(below, neg, jnp.where(above, pos, cc)), inside

    if mode == MODE_REFLECT:
        sz2 = 2 * length
        # below (deform.c:61-69): only pre-fold when cc < -sz2
        neg0 = jnp.where(cc < -sz2, sz2 * jnp.trunc(-cc / sz2) + cc, cc)
        neg = jnp.where(neg0 < -length, neg0 + sz2, -neg0 - 1)
        # above (deform.c:100-108)
        pos = cc - sz2 * jnp.trunc(cc / sz2)
        pos = jnp.where(pos >= length, sz2 - pos - 1, pos)
        return jnp.where(below, neg, jnp.where(above, pos, cc)), inside

    if mode == MODE_WRAP:
        sz = length - 1  # pre-SciPy-1.6 period (deform.c:75-79)
        neg = cc + sz * (jnp.trunc(-cc / sz) + 1)
        pos = cc - sz * jnp.trunc(cc / sz)
        return jnp.where(below, neg, jnp.where(above, pos, cc)), inside

    raise RuntimeError("boundary mode not supported")


def mirror_index_np(idx, length: int):
    """Integer mirror index fold, numpy, for static index tables.

    Equivalent to the tap-edge handling in reference deform.c:668-686 and
    791-813: fold any integer index into ``[0, length-1]`` with mirror
    (period ``2*length - 2``) semantics. Used to build the displacement
    interpolation matrices and the static mirror-padding index vectors.
    """
    idx = np.asarray(idx, dtype=np.int64)
    if length <= 1:
        return np.zeros_like(idx)
    s2 = 2 * length - 2
    m = np.mod(idx, s2)
    return np.where(m >= length, s2 - m, m)


def map_coordinate_np(cc, length: int, mode: int):
    """Numpy twin of :func:`map_coordinate` (used by the test oracle and the
    host-side reference path). Same semantics as reference deform.c:47-128."""
    cc = np.asarray(cc, dtype=np.float64)
    inside = np.ones(cc.shape, dtype=bool)
    below = cc < 0
    above = cc > length - 1

    if mode == MODE_CONSTANT:
        inside = ~(below | above)
        return np.clip(cc, 0, length - 1), inside
    if mode == MODE_NEAREST:
        return np.clip(cc, 0, length - 1), inside
    if length <= 1:
        return np.zeros_like(cc), inside
    if mode == MODE_MIRROR:
        sz2 = 2 * length - 2
        neg = sz2 * np.trunc(-cc / sz2) + cc
        neg = np.where(neg <= 1 - length, neg + sz2, -neg)
        pos = cc - sz2 * np.trunc(cc / sz2)
        pos = np.where(pos >= length, sz2 - pos, pos)
        return np.where(below, neg, np.where(above, pos, cc)), inside
    if mode == MODE_REFLECT:
        sz2 = 2 * length
        neg0 = np.where(cc < -sz2, sz2 * np.trunc(-cc / sz2) + cc, cc)
        neg = np.where(neg0 < -length, neg0 + sz2, -neg0 - 1)
        pos = cc - sz2 * np.trunc(cc / sz2)
        pos = np.where(pos >= length, sz2 - pos - 1, pos)
        return np.where(below, neg, np.where(above, pos, cc)), inside
    if mode == MODE_WRAP:
        sz = length - 1
        neg = cc + sz * (np.trunc(-cc / sz) + 1)
        pos = cc - sz * np.trunc(cc / sz)
        return np.where(below, neg, np.where(above, pos, cc)), inside
    raise RuntimeError("boundary mode not supported")
