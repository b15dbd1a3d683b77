"""B-spline interpolation weights, orders 0-5.

Closed-form polynomial weights matching the reference
``get_spline_interpolation_weights`` (reference deform.c:160-268), including
the "last weight = 1 - sum(others)" trick (deform.c:261-265). Written
generically over the array module so the same code serves:

* ``jnp`` — traced, differentiable weights on device (this makes the whole
  deformation differentiable w.r.t. the displacement field for free, which
  the reference never supported),
* ``np`` — host-side construction of the static displacement-interpolation
  matrices.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def filter_start(cc, order: int, xp=jnp):
    """First tap index of the (order+1)-wide filter window.

    Matches reference deform.c:783-788: ``floor(cc) - order//2`` for odd
    orders, ``floor(cc + 0.5) - order//2`` for even orders (incl. order 0).
    Returned as the *floating* floor; callers cast to int.
    """
    if order & 1:
        return xp.floor(cc) - order // 2
    return xp.floor(cc + 0.5) - order // 2


def spline_weights(cc, order: int, xp=jnp):
    """Per-tap interpolation weights for a (mapped) coordinate array.

    Returns a list of ``order + 1`` arrays, each with the shape of ``cc``.
    Polynomials follow reference deform.c:160-268 exactly; the distance to
    the middle knot is ``x = cc - floor(cc)`` (odd order) or
    ``cc - floor(cc + 0.5)`` (even order), per deform.c:166-167.
    """
    if order == 0:
        # order 0 uses a single tap and skips weighting entirely
        # (reference deform.c:896-898 guards with ``orders[ii] > 0``)
        return [xp.ones_like(cc)]

    if order & 1:
        x = cc - xp.floor(cc)
    else:
        x = cc - xp.floor(cc + 0.5)

    if order == 1:
        w0 = 1.0 - x
        return [w0, 1.0 - w0]

    if order == 2:
        w1 = 0.75 - x * x
        y = 0.5 - x
        w0 = 0.5 * y * y
        return [w0, w1, 1.0 - w0 - w1]

    if order == 3:
        y = x
        z = 1.0 - x
        w1 = (y * y * (y - 2.0) * 3.0 + 4.0) / 6.0
        w2 = (z * z * (z - 2.0) * 3.0 + 4.0) / 6.0
        w0 = z * z * z / 6.0
        return [w0, w1, w2, 1.0 - w0 - w1 - w2]

    if order == 4:
        t = x * x
        w2 = t * (t * 0.25 - 0.625) + 115.0 / 192.0
        y = 1.0 + x
        w1 = y * (y * (y * (5.0 - y) / 6.0 - 1.25) + 5.0 / 24.0) + 55.0 / 96.0
        z = 1.0 - x
        w3 = z * (z * (z * (5.0 - z) / 6.0 - 1.25) + 5.0 / 24.0) + 55.0 / 96.0
        y = 0.5 - x
        t = y * y
        w0 = t * t / 24.0
        return [w0, w1, w2, w3, 1.0 - w0 - w1 - w2 - w3]

    if order == 5:
        y = x
        z = 1.0 - x
        t = y * y
        w2 = t * (t * (0.25 - y / 12.0) - 0.5) + 0.55
        t = z * z
        w3 = t * (t * (0.25 - z / 12.0) - 0.5) + 0.55
        y1 = 1.0 + x
        w1 = y1 * (y1 * (y1 * (y1 * (y1 / 24.0 - 0.375) + 1.25) - 1.75)
                   + 0.625) + 0.425
        z1 = 2.0 - x
        w4 = z1 * (z1 * (z1 * (z1 * (z1 / 24.0 - 0.375) + 1.25) - 1.75)
                   + 0.625) + 0.425
        y2 = 1.0 - x
        t = y2 * y2
        w0 = y2 * t * t / 120.0
        return [w0, w1, w2, w3, w4, 1.0 - w0 - w1 - w2 - w3 - w4]

    raise ValueError("order should be 0, 1, 2, 3, 4 or 5.")


def spline_weights_np(cc, order: int):
    """Numpy float64 twin of :func:`spline_weights` (stacked: (order+1, ...))."""
    cc = np.asarray(cc, dtype=np.float64)
    return np.stack(spline_weights(cc, order, xp=np))


def bspline3_np(x, d: int = 0):
    """Cubic B-spline basis value (``d=0``) or derivative (``d=1,2``) at
    ``x``, vectorized numpy float64.

    The evaluation form of the same polynomials as
    :func:`spline_weights(order=3)` (reference deform.c:200-214): the
    tap weight at column ``k`` for coordinate ``c`` is ``bspline3_np(c - k)``.
    Used for host-side construction of derivative interpolation matrices
    (ops/displacement.py) and the analytic regularization Gram matrices
    (ops/regularize.py).
    """
    ax = np.abs(np.asarray(x, dtype=np.float64))
    s = np.sign(x)
    inner = ax <= 1.0
    outer = (ax > 1.0) & (ax < 2.0)
    out = np.zeros_like(ax)
    if d == 0:
        out[inner] = (4.0 - 6.0 * ax[inner] ** 2
                      + 3.0 * ax[inner] ** 3) / 6.0
        out[outer] = (2.0 - ax[outer]) ** 3 / 6.0
    elif d == 1:
        out[inner] = s[inner] * (-12.0 * ax[inner]
                                 + 9.0 * ax[inner] ** 2) / 6.0
        out[outer] = -s[outer] * (2.0 - ax[outer]) ** 2 / 2.0
    elif d == 2:
        out[inner] = 3.0 * ax[inner] - 2.0
        out[outer] = 2.0 - ax[outer]
    else:
        raise ValueError("d must be 0, 1 or 2")
    return out
