"""Round-4 backward-scatter probes (VERDICT r3 task 1).

Attacks the ~100 M rows/s ``.at[].add`` wall from the dY side with the two
reformulations named by the round-3 verdict, plus span statistics that
decide their viability:

  A. span stats — per-voxel-chunk row_base span on REALISTIC smooth
     coordinate streams (the real displacement_field of the bench grids),
     for several chunk sizes and displacement scales. The private-table
     ideas only work if the span is far below the table size.
  B. two-phase private-table scatter — scatter each chunk into a
     dynamically-positioned private (S, 128) block, then add the block
     into the full table with one dynamic-slice add:
       B1: private .at[].add (tests whether a small live destination
           helps — r3 measured destination-size invariance, re-check);
       B2: private one-hot matmul (onehot(r_local) @ vals on the MXU,
           fused one-hot, precision HIGHEST for exactness).
  C. gather-from-dY work factor — per-table-row candidate windows are
     bounded by max|displacement|; reports the arithmetic work multiple
     vs the forward's one weighted row per voxel (analytic, from the
     measured field bound).

Run ON the TPU, alone:   python tools/probe_scatter3.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from elasticdeform_tpu.ops import windows as W                # noqa: E402
from elasticdeform_tpu.ops.resample import pad_amount         # noqa: E402


def timeit(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def smooth_cc(size, sigma, seed=0):
    """Realistic per-voxel sample coordinates: meshgrid + the dense field
    of a random 3x3x3 control grid (exactly what deform feeds the op)."""
    import elasticdeform_tpu as ed
    rng = np.random.default_rng(seed)
    d = jnp.asarray(rng.standard_normal((3, 3, 3, 3)).astype(np.float32)
                    * sigma)
    fld = np.asarray(ed.displacement_field(d, (size,) * 3))
    mesh = np.stack(np.meshgrid(*[np.arange(size, dtype=np.float32)] * 3,
                                indexing="ij"))
    cc = (mesh + fld).reshape(3, -1).T  # (N, 3) unclipped, like the op
    return jnp.asarray(cc), float(np.abs(fld).max())


def main(size=64, sigma=15.0):
    print(jax.devices(), flush=True)
    plan = W.window_plan(3, 3, (size,) * 3)
    n_lead, widths, strides = plan
    pad = pad_amount(3)
    padded = tuple(size + 2 * pad + e for e in widths)
    p = W._make_params(padded, 1, 1, 3, 3, (size,) * 3, "float32", pad,
                       plan=plan)
    n_out = size ** 3
    print(f"plan {widths}/{strides} rows/sample={p.rows_per_sample} "
          f"lanes={p.lane_count}", flush=True)

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.random((n_out, 1), dtype=np.float32))

    for sig in (sigma, 5.0, 2.0):
        cc, dmax = smooth_cc(size, sig)
        # ---- A: span statistics --------------------------------------
        row_base = jax.jit(
            lambda c: W._chunk_weights(c, p)[0])(cc)
        rb = np.asarray(row_base)
        for vchunk in (8192, 32768, 65536):
            spans = [int(rb[v:v + vchunk].max() - rb[v:v + vchunk].min())
                     for v in range(0, n_out, vchunk)]
            print(f"sigma={sig:5.1f} max|disp|={dmax:5.1f} chunk={vchunk:6d} "
                  f"span med={int(np.median(spans))} max={max(spans)} "
                  f"(table {p.rows_per_sample})", flush=True)
        # ---- C: gather-from-dY work factor ---------------------------
        m = int(np.ceil(dmax))
        cand = (widths[0] + 2 * m) * (widths[1] + 2 * m) \
            * (widths[2] + 2 * m) / strides[-1]
        fwd_work = n_out  # one weighted row per voxel
        bwd_work = p.rows_per_sample * cand
        print(f"sigma={sig:5.1f} gather-from-dY candidates/row ~{cand:.0f} "
              f"-> work x{bwd_work / fwd_work:.1f} vs forward", flush=True)

    # ---- baseline: production scatter --------------------------------
    cc, dmax = smooth_cc(size, sigma)
    base = jax.jit(lambda g, c: W._scatter_group(g, c, p, 1))
    t = timeit(base, g, cc)
    print(f"baseline _scatter_group: {t * 1e3:7.2f} ms "
          f"({n_out / t / 1e6:.0f} M rows/s)", flush=True)

    # ---- B: two-phase private tables ----------------------------------
    vchunk = 32768
    for S, form in ((16384, "scatter"), (32768, "scatter"),
                    (8192, "matmul"), (16384, "matmul"), (32768, "matmul")):
        def two_phase(g, cc, S=S, form=form):
            dt = jnp.zeros((p.rows_per_sample + S, p.lane_count),
                           jnp.float32)
            for v0 in range(0, n_out, vchunk):
                v1 = min(v0 + vchunk, n_out)
                cc_c = cc[v0:v1]
                g_c = g[v0:v1]
                row_base, wrow, weights = W._chunk_weights(cc_c, p)
                vals = g_c * wrow
                lo = jnp.min(row_base)
                r_local = jnp.clip(row_base - lo, 0, S - 1)
                # (overflow voxels clamp to S-1: probe-only; production
                # would route them through a residual scatter)
                if form == "scatter":
                    priv = jnp.zeros((S, p.lane_count), jnp.float32)
                    priv = priv.at[r_local].add(vals)
                else:
                    onehot = (r_local[None, :]
                              == jnp.arange(S, dtype=jnp.int32)[:, None]
                              ).astype(jnp.float32)
                    priv = jax.lax.dot_general(
                        onehot, vals, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST)
                dt = jax.lax.dynamic_update_slice(
                    dt,
                    jax.lax.dynamic_slice(dt, (lo, 0),
                                          (S, p.lane_count)) + priv,
                    (lo, 0))
            return dt[:p.rows_per_sample]

        try:
            t = timeit(jax.jit(two_phase), g, cc, n=3)
            print(f"two-phase {form:7s} S={S:6d}: {t * 1e3:7.2f} ms "
                  f"({n_out / t / 1e6:.0f} M rows/s)", flush=True)
        except Exception as e:
            print(f"two-phase {form:7s} S={S:6d}: FAIL "
                  f"{type(e).__name__} {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, float(a[1]) if len(a) > 1 else 15.0)
