"""Probe: forward gather+weights — joint lane-row reduce vs staged per-axis.

The current chunk resample builds the full (M, lanes) weight row (outer
product of the per-axis shifted vectors) and does one multiply+reduce with
the gathered rows. The staged alternative reshapes the gathered rows to
(M, C, w1, ..., wnw) and contracts one axis at a time with the small
per-axis vectors — far less intermediate HBM traffic when lanes is large.
(Numerics: different summation association, ~1e-7 relative — would relax
the cross-plan 1e-12 bitwise equivalence if landed.)

Run:  python tools/probe_wchain.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.ops import windows as W


def stream_time(fn, args, K, n=5):
    @jax.jit
    def fK(args):
        def body(c, a):
            return c, fn(*a)
        _, outs = jax.lax.scan(body, 0.0, args)
        return jax.tree_util.tree_map(jnp.sum, outs)

    out = fK(args)
    jax.tree_util.tree_map(float, out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fK(args)
        jax.tree_util.tree_map(float, out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best / K


def _rows_and_vectors(cc, p):
    """row_base + per-windowed-axis shifted weight vectors (no outer)."""
    naxis = cc.shape[-1]
    row_base = None
    wvs = []
    for k in range(naxis):
        c = cc[:, k]
        i_h = W.filter_start(c, p.order).astype(jnp.int32) + p.pad
        if p.strides[k] == 1:
            t_h, o_h = i_h, jnp.zeros_like(i_h)
        else:
            t_h = i_h // p.strides[k]
            o_h = i_h - t_h * p.strides[k]
        term = t_h * p.tstrides[k] if p.tstrides[k] != 1 else t_h
        row_base = term if row_base is None else row_base + term
        taps = [w.astype(p.compute_dtype)
                for w in W.spline_weights(c, p.order)]
        wvs.append(W._shifted_weight_vector(taps, o_h, p.widths[k], p.order,
                                            p.compute_dtype))
    return row_base, wvs


def staged_chunk(table2, cc, p):
    """Forward chunk with the per-axis staged reduction (n_lead == 0)."""
    row_base, wvs = _rows_and_vectors(cc, p)
    rows = jnp.take(table2, row_base, axis=0, mode="clip")
    t = rows.reshape(-1, p.channels, *p.widths)
    for k in range(len(p.widths) - 1, -1, -1):
        wv = wvs[k].reshape(wvs[k].shape[0], 1,
                            *((1,) * k), p.widths[k])
        t = jnp.sum(t * wv, axis=2 + k)
    return t


def run_case(name, naxis, widths, strides, n_out, counts, C=1):
    K = 8
    rng = np.random.default_rng(0)
    lanes = int(np.prod(widths))
    table_rows = int(np.prod(counts))
    tstrides = []
    acc = 1
    for h in range(naxis - 1, -1, -1):
        tstrides.insert(0, acc)
        acc *= counts[h]
    p = W._StageParams(
        order=3, widths=tuple(widths), strides=tuple(strides), n_lead=0,
        tstrides=tuple(tstrides), pad=2, channels=C, lane_count=lanes,
        compute_dtype="float32", n_out_s=n_out, rows_per_sample=table_rows,
        nbatch=1)
    tables = jnp.asarray(
        rng.random((K, table_rows, C * lanes), dtype=np.float32))
    hi = [c * s - 8 for c, s in zip(counts, strides)]
    ccs = jnp.asarray(
        (rng.random((K, n_out, naxis)) * np.array(hi) + 2)
        .astype(np.float32))

    t_joint = stream_time(
        lambda tb, c: W._resample_chunk(tb, c, None, p), (tables, ccs), K)
    t_staged = stream_time(
        lambda tb, c: staged_chunk(tb, c, p), (tables, ccs), K)

    # numeric sanity: same taps, different association
    a = W._resample_chunk(tables[0], ccs[0], None, p)
    b = staged_chunk(tables[0], ccs[0], p)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    print(f"{name}: joint {t_joint*1e6:7.1f} us  staged {t_staged*1e6:7.1f}"
          f" us  ratio {t_staged/t_joint:5.2f}  relerr {err:.1e}",
          flush=True)


def main():
    print(jax.devices(), flush=True)
    # c1-like: 2D (8,16) plan, 60K voxels, ~1K-row table
    run_case("c1 2D (8,16)   ", 2, (8, 16), (5, 13), 60000, (41, 24))
    # c3-like: 3D (8,8,8) plan, 262K voxels, 27^3-row table
    run_case("c3 3D (8,8,8)  ", 3, (8, 8, 8), (5, 5, 5), 64 ** 3,
             (27, 27, 27))
    # c4-like: 3D (4,4,8) plan, 262K voxels, 69*69*15 rows
    run_case("c4 3D (4,4,8)  ", 3, (4, 4, 8), (1, 1, 5), 64 ** 3,
             (69, 69, 15))


if __name__ == "__main__":
    main()
