"""Microbenchmark: backward row-scatter strategies on the TPU.

The backward pass scatter-adds one 128-lane row per output voxel into the
window-table cotangent (the reference's scatter-add gradient loop,
deform.c:953-995).  Round 2 measured the `at[idx].add` formulation at
~99 M rows/s, invariant to index order, update width and destination size
— an RMW-serialization wall.  Hypothesis tested here: with the z-stride-5
window plan, CONSECUTIVE output voxels along z share a destination row in
runs of ~5, and back-to-back same-address read-modify-writes serialize.

Variants (all scatter the same realistic index stream: row indices derived
from identity + smooth random displacement on a 64^3 volume, i.e. the
actual run-length structure of the workload):

  base        dt.at[idx].add(vals)                       (current path)
  hint        same + indices_are_sorted/unique hints on sorted input
  sortseg     per-chunk argsort + jax.ops.segment_sum(indices_are_sorted)
  combine{k}  k rounds of pairwise run-combining, dummies to distinct
              rows of a spill region, then at[].add
  runsum      exact run combining via sorted-boundary segment_sum inside
              the chunk, then scatter of the (still chunk-sized) result
  unique      synthetic all-distinct consecutive idx (upper bound: what a
              conflict-free index stream scatters at)
  stream      plain streamed add of equal-shaped arrays (HBM RMW ceiling)

Run:  python tools/probe_scatter.py [names...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def make_realistic_idx(size=64, stride=5, pad=2, sigma=15.0, seed=0):
    """Row indices with the real workload's run structure.

    Table dims mimic the (4,4,8)/(1,1,5) plan on a padded 64^3 volume:
    t0,t1 from unit-stride axes, t2 = i_z // 5.
    """
    rng = np.random.default_rng(seed)
    # smooth displacement: coarse 3-grid, linear upsample is close enough
    # for index statistics
    from scipy.ndimage import zoom as nd_zoom
    n = size
    disp = [nd_zoom(rng.standard_normal((3, 3, 3)) * sigma,
                    n / 3, order=1)[:n, :n, :n] for _ in range(3)]
    co = np.indices((n, n, n)).astype(np.float64)
    cc = [np.clip(co[h] + disp[h], 0, n - 1) for h in range(3)]
    i = [np.floor(c).astype(np.int64) - 1 + pad for c in cc]  # filter start
    padded = (n + 2 * pad + 4, n + 2 * pad + 4, n + 2 * pad + 8)
    T0 = padded[0] - 4 + 1
    T1 = padded[1] - 4 + 1
    T2 = (padded[2] - 8) // stride + 1
    t0 = np.clip(i[0], 0, T0 - 1)
    t1 = np.clip(i[1], 0, T1 - 1)
    t2 = np.clip(i[2] // stride, 0, T2 - 1)
    idx = (t0 * (T1 * T2) + t1 * T2 + t2).astype(np.int32).ravel()
    n_rows = T0 * T1 * T2
    return idx, n_rows


def make_vals(n_idx, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((n_idx, LANES), dtype=np.float32))


CHUNK = 65536


def _chunked(idx, vals, n_rows, body, extra_rows=0):
    """Apply body(dt, idx_c, vals_c) over 64K-row chunks (the real path's
    structure: no scan carry, in-place alias across steps)."""
    n = idx.shape[0]
    dt = jnp.zeros((n_rows + extra_rows, LANES), jnp.float32)
    for v0 in range(0, n, CHUNK):
        dt = body(dt, idx[v0:v0 + CHUNK], vals[v0:v0 + CHUNK])
    return dt


def probe_base(idx, vals, n_rows):
    @jax.jit
    def f(idx, vals):
        return _chunked(idx, vals, n_rows,
                        lambda dt, i, v: dt.at[i].add(v))
    return timeit(f, idx, vals)


def probe_hint(idx, vals, n_rows):
    # globally sorted once (cheating on sort cost: measures the scatter
    # alone under the strongest possible hints)
    order = jnp.argsort(idx)
    idx_s = idx[order]
    vals_s = vals[order]

    @jax.jit
    def f(idx, vals):
        return _chunked(
            idx, vals, n_rows,
            lambda dt, i, v: dt.at[i].add(
                v, indices_are_sorted=True, unique_indices=False))
    return timeit(f, idx_s, vals_s)


def probe_sortseg(idx, vals, n_rows):
    @jax.jit
    def f(idx, vals):
        def body(dt, i, v):
            o = jnp.argsort(i)
            return dt + jax.ops.segment_sum(
                v[o], i[o], num_segments=n_rows, indices_are_sorted=True)
        return _chunked(idx, vals, n_rows, body)
    return timeit(f, idx, vals)


def probe_sortseg_scatter(idx, vals, n_rows):
    """Sort per chunk, then at[].add with sorted hint (pays the sort)."""
    @jax.jit
    def f(idx, vals):
        def body(dt, i, v):
            o = jnp.argsort(i)
            return dt.at[i[o]].add(v[o], indices_are_sorted=True)
        return _chunked(idx, vals, n_rows, body)
    return timeit(f, idx, vals)


def _combine_rounds(i, v, spill_base, k):
    """k rounds of pairwise run combining.

    After each round, odd positions whose index equals their even partner
    have been folded into the partner and are redirected to a DISTINCT
    spill row (spill_base + position) so the dummy stores don't themselves
    collide."""
    m = i.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    for r in range(k):
        step = 1 << r
        # compare element j with j+step for j in blocks of 2*step
        j = pos
        partner = j + step
        valid = (j % (2 * step) == 0) & (partner < m)
        same = valid & (i[jnp.minimum(partner, m - 1)] == i)
        # fold partner's value into j where same
        gain = jnp.where(same[:, None],
                         v[jnp.minimum(partner, m - 1)],
                         jnp.zeros((), v.dtype))
        v = v + gain
        # partner becomes a spill row with zero value
        was_folded = jnp.zeros((m,), bool).at[
            jnp.where(same, jnp.minimum(partner, m - 1), m - 1)
        ].set(True, mode='drop') if False else None
        # simpler: recompute per-position "I was folded into my left
        # neighbor at distance step"
        left = j - step
        folded = (j % (2 * step) == step) & (left >= 0) & \
                 (i[jnp.maximum(left, 0)] == i)
        i = jnp.where(folded, spill_base + j, i)
        v = jnp.where(folded[:, None], jnp.zeros((), v.dtype), v)
    return i, v


def probe_combine(idx, vals, n_rows, k=3):
    @jax.jit
    def f(idx, vals):
        def body(dt, i, v):
            i2, v2 = _combine_rounds(i, v, n_rows, k)
            return dt.at[i2].add(v2)
        return _chunked(idx, vals, n_rows, body, extra_rows=CHUNK)
    return timeit(f, idx, vals)


def probe_combine2(idx, vals, n_rows):
    return probe_combine(idx, vals, n_rows, k=2)


def probe_unique(idx, vals, n_rows):
    """Upper bound: all-distinct consecutive indices."""
    n = idx.shape[0]
    # distinct per chunk, wrapping over the destination
    idx_u = jnp.asarray((np.arange(n) % n_rows).astype(np.int32))

    @jax.jit
    def f(idx, vals):
        return _chunked(idx, vals, n_rows,
                        lambda dt, i, v: dt.at[i].add(v, unique_indices=False))
    return timeit(f, idx_u, vals)


def probe_unique_hint(idx, vals, n_rows):
    n = idx.shape[0]
    idx_u = jnp.asarray((np.arange(n) % n_rows).astype(np.int32))

    @jax.jit
    def f(idx, vals):
        return _chunked(
            idx, vals, n_rows,
            lambda dt, i, v: dt.at[i].add(
                v, indices_are_sorted=False, unique_indices=True))
    return timeit(f, idx_u, vals)


def probe_stream(idx, vals, n_rows):
    """HBM RMW ceiling: chunk-shaped adds into a rolling slice."""
    @jax.jit
    def f(idx, vals):
        def body(dt, i, v):
            return dt.at[:v.shape[0]].add(v)
        return _chunked(idx, vals, n_rows, body)
    return timeit(f, idx, vals)


PROBES = {
    "base": probe_base,
    "hint": probe_hint,
    "sortseg": probe_sortseg,
    "sortscat": probe_sortseg_scatter,
    "combine3": probe_combine,
    "combine2": probe_combine2,
    "unique": probe_unique,
    "uniqhint": probe_unique_hint,
    "stream": probe_stream,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    idx_np, n_rows = make_realistic_idx()
    # run-length stats of the real stream
    runs = np.diff(np.flatnonzero(np.concatenate(
        ([True], idx_np[1:] != idx_np[:-1], [True]))))
    print(f"n_idx={idx_np.size}  n_rows={n_rows}  "
          f"mean run={runs.mean():.2f}  p90 run={np.percentile(runs, 90):.0f}",
          flush=True)
    idx = jnp.asarray(idx_np)
    vals = make_vals(idx_np.size)
    for name in names:
        try:
            dt = PROBES[name](idx, vals, n_rows)
            rate = idx_np.size / dt / 1e6
            print(f"{name:10s} {dt*1e3:8.2f} ms  {rate:8.1f} M rows/s",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:10s} FAILED: {type(e).__name__}: {msg}", flush=True)
