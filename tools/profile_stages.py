"""Stage-by-stage TPU profile of the flagship fwd+grad pipeline.

Times each stage of the batched 64x 64^3 order-3 pair in isolation (jit'd,
scalar-fetch synchronized — block_until_ready does not synchronize over
remote tunnels). Run it ALONE: concurrent TPU jobs contaminate timings.

    python tools/profile_stages.py [batch] [size] [--json out.json]

Respects ELASTICDEFORM_TPU_PLAN3D (window geometry) and the other tuning
env vars, so A/B runs are just env changes.  With ``--json`` the stage
timings (ms) land in a machine-readable file next to bench_results.json —
the per-round perf regression record (VERDICT r2 task 7).

Reference numbers (1x v5e, end of round 2, plan 448):
    build ~32 ms | gather ~54 ms | scatter ~170 ms | fold ~26 ms |
    transpose prefilter ~9 ms  ->  pair ~356 ms = 47 Mvox/s.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.ops import windows as W                # noqa: E402
from elasticdeform_tpu.ops.prefilter import (                 # noqa: E402
    spline_filter1d, spline_filter1d_transpose,
)


def timeit(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def main(batch=64, size=64, order=3, json_path=None):
    stages = {}
    plan = W.window_plan(3, order, (size, size, size))
    n_lead, widths, strides = plan
    from elasticdeform_tpu.ops.resample import pad_amount
    pad = pad_amount(order)
    padded = tuple(size + 2 * pad + e for e in widths)
    p = W._make_params(padded, 1, batch, 3, order, (size,) * 3,
                       "float32", pad, plan=plan)
    print(f"plan: widths={widths} strides={strides} pad={pad} "
          f"rows/sample={p.rows_per_sample} lanes={p.lane_count}",
          flush=True)
    rng = np.random.default_rng(0)
    n_out = batch * size ** 3
    cc = jnp.asarray(rng.random((n_out, 3), dtype=np.float32) * (size - 1))
    g = jnp.asarray(rng.random((n_out, 1), dtype=np.float32))
    xp = jnp.asarray(rng.random((batch, *padded, 1), dtype=np.float32))

    build = jax.jit(lambda x: W._build_table_impl(
        x, p.widths, p.strides, p.n_lead, True)[0])
    table = build(xp)
    stages["build_ms"] = timeit(build, xp) * 1e3
    print(f"table build : {stages['build_ms']:7.1f} ms "
          f"(table {table.shape}, {table.nbytes/2**30:.2f} GiB)", flush=True)

    prim = jax.jit(lambda tb, c: W._stage_primal(tb, c, p))
    dt = timeit(prim, table, cc)
    stages["gather_ms"] = dt * 1e3
    print(f"row gather  : {dt*1e3:7.1f} ms ({n_out/dt/1e6:.0f} M rows/s)",
          flush=True)

    def scat_only(gg, c):
        return sum(W._scatter_group(
            gg[b * p.n_out_s:(b + 1) * p.n_out_s],
            c[b * p.n_out_s:(b + 1) * p.n_out_s], p, 1).sum()
            for b in range(batch))
    dt = timeit(jax.jit(scat_only), g, cc)
    stages["scatter_ms"] = dt * 1e3
    print(f"row scatter : {dt*1e3:7.1f} ms ({n_out/dt/1e6:.0f} M rows/s)",
          flush=True)

    sf = jax.jit(lambda gg, c: W._scatter_fold(gg, c, p, padded, True))
    stages["scatter_fold_ms"] = timeit(sf, g, cc) * 1e3
    print(f"scatter+fold: {stages['scatter_fold_ms']:7.1f} ms", flush=True)

    def tpf(x):
        for d in range(3, 0, -1):
            x = spline_filter1d_transpose(x, order, d)
        return x
    stages["transpose_pf_ms"] = timeit(jax.jit(tpf), xp) * 1e3
    print(f"transpose pf: {stages['transpose_pf_ms']:7.1f} ms", flush=True)

    # --- the "other" stages of the real pipeline ---
    from elasticdeform_tpu.ops.displacement import dense_displacement
    from elasticdeform_tpu.ops import modes as modes_mod

    xv = jnp.asarray(rng.random((batch, size, size, size), dtype=np.float32))
    disp_f = jnp.asarray(rng.standard_normal((batch, 3, 3, 3, 3))
                         .astype(np.float32))

    def fpf(x):
        for d in range(1, 4):
            x = spline_filter1d(x, order, d)
        return x
    stages["forward_pf_ms"] = timeit(jax.jit(fpf), xv) * 1e3
    print(f"forward pf  : {stages['forward_pf_ms']:7.1f} ms", flush=True)

    def dd(df):
        return jax.vmap(lambda d: dense_displacement(
            d, (size,) * 3, (size,) * 3, (0, 0, 0), jnp.float32))(df)
    displ = dd(disp_f)
    stages["dense_displ_ms"] = timeit(jax.jit(dd), disp_f) * 1e3
    print(f"dense displ : {stages['dense_displ_ms']:7.1f} ms", flush=True)

    def mapping(displ):
        out_spatial = (size,) * 3
        ccs = []
        for h in range(3):
            co = jax.lax.broadcasted_iota(jnp.float32,
                                          (batch,) + out_spatial, h + 1)
            m, _ = modes_mod.map_coordinate(co + displ[:, h], size, 3)
            ccs.append(m.reshape(batch * size ** 3))
        return jnp.stack(ccs, axis=-1)
    stages["coord_map_ms"] = timeit(jax.jit(mapping), displ) * 1e3
    print(f"coord map   : {stages['coord_map_ms']:7.1f} ms", flush=True)

    def wpad(x):
        for h in range(1, 4):
            x = W.window_pad_axis(x, h, pad, widths[h - 1])
        return x
    stages["window_pad_ms"] = timeit(jax.jit(wpad), xv) * 1e3
    print(f"window pad  : {stages['window_pad_ms']:7.1f} ms", flush=True)

    # --- the actual headline pair, end to end ---
    from elasticdeform_tpu.parallel.sharding import batched_deform
    dgrid = jnp.asarray(rng.standard_normal((batch, 3, 3, 3, 3))
                        .astype(np.float32) * 15)
    gy = jnp.asarray(rng.random((batch, size, size, size), dtype=np.float32))

    @jax.jit
    def pair(x, d, gy):
        y, vjp = jax.vjp(
            lambda x_: batched_deform(x_, d, order=order, mode='mirror'), x)
        (gx,) = vjp(gy)
        return jnp.sum(y), jnp.sum(gx)

    def psync(out):
        for s_ in out:
            float(s_)
    outp = pair(xv, dgrid, gy)
    psync(outp)
    t0 = time.perf_counter()
    for _ in range(5):
        outp = pair(xv, dgrid, gy)
    psync(outp)
    dt = (time.perf_counter() - t0) / 5
    stages["pair_ms"] = dt * 1e3
    stages["pair_mvox_s"] = n_out / dt / 1e6
    print(f"FULL PAIR   : {dt*1e3:7.1f} ms ({n_out/dt/1e6:.1f} Mvox/s)",
          flush=True)

    if json_path:
        import os
        stages["plan"] = {"widths": list(widths), "strides": list(strides),
                          "batch": batch, "size": size, "order": order,
                          "plan3d": os.environ.get(
                              "ELASTICDEFORM_TPU_PLAN3D", "448")}
        with open(json_path, "w") as f:
            json.dump({k: (round(v, 2) if isinstance(v, float) else v)
                       for k, v in stages.items()}, f, indent=2)
        print(f"wrote {json_path}", flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [int(a) for a in argv[:2]]
    main(*args, json_path=json_path)
