"""Probe: exact-EDT min-plus scaling (VERDICT r4 task 4).

Measures on-chip:
  1. the current O(n^2)-per-line min-plus pass cost across axis lengths
     (64..1024 at constant total voxels) and chunk budgets,
  2. a sub-quadratic exact candidate: divide-and-conquer monotone argmin
     (the cost matrix f(j) + (i-j)^2 is totally monotone, so the argmin
     j*(i) is nondecreasing in i; refining segment boundaries level by
     level costs O(n log n) per line with log n sequential levels),
  3. end-to-end 128^3 EDT with the best settings.

Correctness of the D&C candidate is asserted against the current pass.
Writes bench_artifacts/probe_edt_<stamp>.json. One TPU job at a time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

TOTAL = int(os.environ.get("PROBE_TOTAL", str(2 ** 21)))  # voxels per pass


def timeit(fn, iters=3):
    float(jnp.sum(fn()))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def minplus_quadratic(f, chunk_bytes):
    """The current ops/distance.py formulation on (m, n) lines."""
    m, n = f.shape
    D = jnp.asarray((np.arange(n)[:, None] - np.arange(n)[None, :]) ** 2,
                    f.dtype)
    chunk = max(1, chunk_bytes // (n * n * f.dtype.itemsize))
    pad = (-m) % chunk
    if pad:
        f = jnp.concatenate([f, jnp.zeros((pad, n), f.dtype)], axis=0)
    nb = f.shape[0] // chunk
    f = f.reshape(nb, chunk, n)

    def body(rows):
        return jnp.min(rows[:, None, :] + D[None], axis=-1)

    return lax.map(body, f).reshape(-1, n)[:m]


def minplus_dc(f):
    """Divide-and-conquer monotone argmin: O(n log n) work per line,
    log2(n) sequential levels, each level one take_along_axis gather.

    Level k partitions rows into 2^k segments with known candidate
    ranges [lo_s, hi_s] (nondecreasing argmin => children ranges split
    at the parent center's argmin). The center row of every segment is
    evaluated over its (static, padded) range; the argmins become the
    next level's boundaries. The last level evaluates every row over a
    range of O(1) + parents' slack."""
    m, n = f.shape
    assert n & (n - 1) == 0, "power-of-two axis for the probe"
    levels = int(np.log2(n))
    iota = jnp.arange(n, dtype=jnp.int32)

    # segment boundaries as (m, 2^k + 1) arrays of j-range edges
    lo = jnp.zeros((m, 1), jnp.int32)
    hi = jnp.full((m, 1), n - 1, jnp.int32)
    d = jnp.zeros((m, 0), f.dtype)  # computed centers, appended per level

    # we accumulate center results into a full (m, n) output via masks
    out = jnp.zeros((m, n), f.dtype)
    done = jnp.zeros((n,), bool)

    seg_lo, seg_hi = lo, hi                      # (m, S)
    for k in range(levels + 1):
        S = seg_lo.shape[1]
        width = n // S
        centers = (jnp.arange(S, dtype=jnp.int32) * width + width // 2)
        span = n // S + 2                         # static padded range
        # candidate j for each (line, segment): seg_lo .. seg_lo+span
        j = jnp.minimum(seg_lo[:, :, None]
                        + jnp.arange(span, dtype=jnp.int32)[None, None],
                        n - 1)                    # (m, S, span)
        vals = jnp.take_along_axis(
            f[:, None, :].repeat(1, axis=1), j, axis=-1) \
            if False else jnp.take_along_axis(
                jnp.broadcast_to(f[:, None, :], (m, S, n)), j, axis=-1)
        i = centers[None, :, None]
        cost = vals + (i - j).astype(f.dtype) ** 2
        valid = j <= seg_hi[:, :, None]
        big = jnp.asarray(np.finfo(np.float32).max / 8, f.dtype)
        cost = jnp.where(valid, cost, big)
        amin = jnp.argmin(cost, axis=-1)          # (m, S)
        dmin = jnp.take_along_axis(cost, amin[..., None], axis=-1)[..., 0]
        jstar = jnp.take_along_axis(j, amin[..., None], axis=-1)[..., 0]
        # write center results
        out = out.at[:, centers].set(dmin)
        # next level boundaries: children [lo, j*], [j*, hi]
        if k < levels:
            seg_lo = jnp.stack([seg_lo, jstar], axis=-1).reshape(m, 2 * S)
            seg_hi = jnp.stack([jstar, seg_hi], axis=-1).reshape(m, 2 * S)
    return out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    out = {"total_voxels": TOTAL}

    # correctness of D&C on small lines (CPU-checkable too)
    f_small = jnp.asarray(
        np.where(rng.random((64, 128)) < 0.5, 1e12, 0.0).astype(np.float32))
    a = np.asarray(minplus_quadratic(f_small, 64 << 20))
    b = np.asarray(minplus_dc(f_small))
    ok = bool(np.allclose(a, b))
    out["dc_matches_quadratic"] = ok
    print("dc matches quadratic:", ok, flush=True)
    if not ok:
        bad = np.argwhere(~np.isclose(a, b))
        print("first mismatches:", bad[:5], a[tuple(bad[0])],
              b[tuple(bad[0])], flush=True)

    # axis-length sweep at constant total voxels
    out["axis_sweep"] = {}
    for n in (64, 128, 256, 512, 1024):
        m = TOTAL // n
        f = jnp.asarray(
            np.where(rng.random((m, n)) < 0.5, 1e12, 0.0)
            .astype(np.float32))
        rec = {}
        for cb_name, cb in (("16MiB", 16 << 20), ("64MiB", 64 << 20),
                            ("128MiB", 128 << 20)):
            g = jax.jit(lambda f: minplus_quadratic(f, cb))
            rec[f"quad_{cb_name}_ms"] = round(timeit(lambda: g(f)) * 1e3, 2)
        gdc = jax.jit(minplus_dc)
        rec["dc_ms"] = round(timeit(lambda: gdc(f)) * 1e3, 2)
        match = bool(np.allclose(np.asarray(gdc(f)),
                                 np.asarray(jax.jit(
                                     lambda f: minplus_quadratic(
                                         f, 64 << 20))(f))))
        rec["dc_match"] = match
        out["axis_sweep"][n] = rec
        print(f"n={n}: {rec}", flush=True)

    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_artifacts", f"probe_edt_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
