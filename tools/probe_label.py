"""Probe: connected-component label cost on the chip (VERDICT r4 task 3).

Measures, on 128^3 masks of three characters (50% random percolation,
smooth blobs, sparse dots):

  1. sweep count of the current pointer-jumping while_loop,
  2. per-op costs: neighbor_min stencil, the l[l] jump gather, a
     segmented min-scan along an axis,
  3. end-to-end variants:
       A  current measure.label_roots (neighbor_min + jump^2)
       B  scan-boosted: directional segmented min-scans along each axis
          (both directions) replace the axis neighbor offsets, then one
          jump per iteration
       C  cheap-jump variant of A (take instead of concatenate+gather)

Writes bench_artifacts/probe_label_<stamp>.json. One TPU job at a time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU") == "1":
    # the ambient env may force the axon platform regardless of
    # JAX_PLATFORMS (see tests/conftest.py) — override the config
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from elasticdeform_tpu.measure import label_roots, _structure_offsets

N = int(os.environ.get("PROBE_N", "128"))


def timeit(fn, sync, iters=3):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def sync(x):
    float(jnp.sum(x if isinstance(x, jnp.ndarray) else x[0]))


# ---------------------------------------------------------------------------
# building blocks (copies of the measure.py pieces, parameterized)


def make_masks():
    rng = np.random.default_rng(0)
    rand = rng.random((N, N, N)) < 0.5
    from scipy import ndimage as ndi
    blob = ndi.gaussian_filter(rng.standard_normal((N, N, N)), 6.0) > 0.0
    dots = rng.random((N, N, N)) < 0.01
    return {"rand50": rand, "blob": blob, "dots1pct": dots}


def init_labels(fg):
    n = fg.size
    return jnp.where(fg, jnp.arange(n, dtype=jnp.int32).reshape(fg.shape),
                     jnp.int32(n))


def neighbor_min(l, fg, offs, big):
    shape = l.shape
    pads = [(1, 1)] * l.ndim
    lp = jnp.pad(l, pads, constant_values=big)
    m = l
    for off in offs:
        start = [1 + o for o in off]
        limit = [1 + o + s for o, s in zip(off, shape)]
        m = jnp.minimum(m, lax.slice(lp, start, limit))
    return jnp.where(fg, m, big)


def jump_concat(l, n):
    flat = jnp.concatenate([l.reshape(-1), jnp.full((1,), n, jnp.int32)])
    return flat[l]


def jump_take(l, n):
    flat = l.reshape(-1)
    taken = jnp.take(flat, jnp.where(l >= n, 0, l).reshape(-1),
                     mode="clip").reshape(l.shape)
    return jnp.where(l >= n, jnp.int32(n), taken)


def seg_min_scan(l, fg, axis, reverse, big):
    """Propagate the running min along contiguous foreground runs in one
    direction: segmented min-scan (reset at background)."""
    vals = jnp.where(fg, l, big)
    seg_start = ~fg

    def combine(a, b):
        v1, s1 = a
        v2, s2 = b
        return jnp.where(s2, v2, jnp.minimum(v1, v2)), s1 | s2

    v, _ = lax.associative_scan(combine, (vals, seg_start), axis=axis,
                                reverse=reverse)
    return jnp.where(fg, jnp.minimum(l, v), big)


def _converge(l0, step):
    """Run ``step`` until fixpoint; return (labels, iterations)."""
    def body(carry):
        l, it, _ = carry
        ln = step(l)
        return ln, it + 1, jnp.any(ln != l)

    out, iters, _ = lax.while_loop(
        lambda c: c[2], body, (l0, jnp.int32(0), jnp.asarray(True)))
    return out, iters


def variant_a(fg, offs):
    """Current library algorithm (neighbor_min + concat-jump^2)."""
    n = fg.size
    big = jnp.int32(n)
    return _converge(init_labels(fg), lambda l: jump_concat(
        jump_concat(neighbor_min(l, fg, offs, big), n), n))


def variant_c(fg, offs):
    """A with the cheaper take-based jump."""
    n = fg.size
    big = jnp.int32(n)
    return _converge(init_labels(fg), lambda l: jump_take(
        jump_take(neighbor_min(l, fg, offs, big), n), n))


def _scan_all_axes(m, fg, offs, big):
    ndim = fg.ndim
    axis_offs = [o for o in offs if sum(1 for c in o if c != 0) == 1]
    diag_offs = [o for o in offs if sum(1 for c in o if c != 0) > 1]
    for ax in range(ndim):
        if any(o[ax] != 0 for o in axis_offs):
            m = seg_min_scan(m, fg, ax, False, big)
            m = seg_min_scan(m, fg, ax, True, big)
    if diag_offs:
        m = neighbor_min(m, fg, diag_offs, big)
    return m


def variant_b(fg, offs):
    """Directional scans for the axis offsets + diagonal stencil + one
    jump per iteration."""
    n = fg.size
    big = jnp.int32(n)
    return _converge(init_labels(fg), lambda l: jump_take(
        _scan_all_axes(l, fg, offs, big), n))


def variant_e(fg, offs):
    """One scan-cycle seed, then the C loop (scans collapse every
    axis-run to its min before any gather happens)."""
    n = fg.size
    big = jnp.int32(n)
    l = _scan_all_axes(init_labels(fg), fg, offs, big)
    return _converge(l, lambda m: jump_take(
        jump_take(neighbor_min(m, fg, offs, big), n), n))


def variant_f(fg, offs):
    """Three stencil passes per sweep (cheap on VPU) + jump^2 —
    trades elementwise passes for fewer expensive gathers."""
    n = fg.size
    big = jnp.int32(n)

    def step(l):
        m = neighbor_min(l, fg, offs, big)
        m = neighbor_min(m, fg, offs, big)
        m = neighbor_min(m, fg, offs, big)
        return jump_take(jump_take(m, n), n)

    return _converge(init_labels(fg), step)


def variant_g(fg, offs):
    """Scan-cycle + jump^2 every sweep (B with a second jump)."""
    n = fg.size
    big = jnp.int32(n)
    return _converge(init_labels(fg), lambda l: jump_take(jump_take(
        _scan_all_axes(l, fg, offs, big), n), n))


def variant_h(fg, offs):
    """Scans + jump + scans: spread the jumped labels along runs
    before the convergence check (costs one extra scan-cycle per
    sweep, may halve the jump count)."""
    n = fg.size
    big = jnp.int32(n)
    return _converge(init_labels(fg), lambda l: _scan_all_axes(
        jump_take(_scan_all_axes(l, fg, offs, big), n), fg, offs, big))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    masks = make_masks()
    offs = _structure_offsets(None, 3)
    out = {"n": N}

    # per-op microbenches on the rand50 mask
    fg = jnp.asarray(masks["rand50"])
    n = fg.size
    big = jnp.int32(n)
    l0 = init_labels(fg)
    ops = {
        "neighbor_min6": jax.jit(
            lambda l: neighbor_min(l, fg, offs, big)),
        "jump_concat": jax.jit(lambda l: jump_concat(l, n)),
        "jump_take": jax.jit(lambda l: jump_take(l, n)),
        "seg_scan_ax0": jax.jit(
            lambda l: seg_min_scan(l, fg, 0, False, big)),
        "seg_scan_ax2": jax.jit(
            lambda l: seg_min_scan(l, fg, 2, False, big)),
    }
    out["ops_ms"] = {}
    for name, f in ops.items():
        dt = timeit(lambda: f(l0), sync, iters=10)
        out["ops_ms"][name] = round(dt * 1e3, 2)
        print(f"op {name}: {dt*1e3:.2f} ms", flush=True)

    variants = {"A_current": jax.jit(lambda m: variant_a(m, offs)),
                "B_scans": jax.jit(lambda m: variant_b(m, offs)),
                "C_cheapjump": jax.jit(lambda m: variant_c(m, offs)),
                "E_seed": jax.jit(lambda m: variant_e(m, offs)),
                "F_stencil3": jax.jit(lambda m: variant_f(m, offs)),
                "G_scans_jump2": jax.jit(lambda m: variant_g(m, offs)),
                "H_scan_jump_scan": jax.jit(
                    lambda m: variant_h(m, offs))}
    only = os.environ.get("PROBE_VARIANTS")
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items()
                    if any(k.startswith(p) for p in keep)}
    for mname, mask in masks.items():
        fg = jnp.asarray(mask)
        rec = {}
        ref = None
        for vname, f in variants.items():
            dt = timeit(lambda: f(fg)[0], sync, iters=3)
            res, iters = f(fg)
            res = np.asarray(res)
            if ref is None:
                ref = res
            rec[vname + "_ms"] = round(dt * 1e3, 1)
            rec[vname + "_sweeps"] = int(iters)
            rec[vname + "_match"] = bool((res == ref).all())
            print(f"{mname} {vname}: {dt*1e3:.1f} ms "
                  f"sweeps={int(iters)} match={rec[vname + '_match']}",
                  flush=True)
        out[mname] = rec

    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_artifacts", f"probe_label_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
