"""Stage profile of the small-2D forward (bench c1 config) on TPU.

Every stage is timed as a ``lax.scan`` stream over K independent inputs
inside ONE jit — the same device-sequential structure bench.py uses for
the sub-ms configs — so per-stage numbers reflect device time, not the
remote tunnel's ~1 ms dispatch floor (which dominated the r2 version of
this profile).

    python tools/profile_c1.py [--json out.json]
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import elasticdeform_tpu as ed                                # noqa: E402
from elasticdeform_tpu.ops import windows as W                # noqa: E402
from elasticdeform_tpu.ops.prefilter import spline_filter1d   # noqa: E402
from elasticdeform_tpu.ops.displacement import (              # noqa: E402
    dense_displacement,
)

K = 64


def stream_time(stage, args, n=5):
    """Per-iteration time of ``stage`` over a K-long scan stream."""
    @jax.jit
    def fK(args):
        def body(c, a):
            return c, stage(*a) if isinstance(a, tuple) else stage(a)
        _, outs = jax.lax.scan(body, 0.0, args)
        return jax.tree_util.tree_map(jnp.sum, outs)

    out = fK(args)
    jax.tree_util.tree_map(lambda s: float(s), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fK(args)
    jax.tree_util.tree_map(lambda s: float(s), out)
    return (time.perf_counter() - t0) / n / K


def main(json_path=None):
    rng = np.random.default_rng(0)
    res = {}
    xs = jnp.asarray(rng.random((K, 200, 300), dtype=np.float32))
    ds = jnp.asarray(rng.standard_normal((K, 2, 3, 3)).astype(np.float32)
                     * 25)

    dt = stream_time(lambda x, d: ed.deform(x, d, order=3, mode='mirror'),
                     (xs, ds))
    res["full_fwd_us"] = dt * 1e6
    print(f"full fwd    : {dt*1e6:7.1f} us/image "
          f"({200*300/dt/1e6:.0f} Mvox/s)", flush=True)

    dt = stream_time(lambda x: spline_filter1d(
        spline_filter1d(x, 3, 0), 3, 1), xs)
    res["prefilter_us"] = dt * 1e6
    print(f"prefilter   : {dt*1e6:7.1f} us", flush=True)

    def disp(dd):
        return dense_displacement(dd, (200, 300), (200, 300), (0, 0),
                                  jnp.float32, prefilter_grid=True)
    dt = stream_time(disp, ds)
    res["displacement_us"] = dt * 1e6
    print(f"displacement: {dt*1e6:7.1f} us", flush=True)

    plan = W.window_plan(2, 3)
    n_lead, widths, strides = plan
    pad = 2
    xps = jnp.asarray(rng.random(
        (K, 200 + 2 * pad + widths[0], 300 + 2 * pad + widths[1], 1),
        dtype=np.float32))
    dt = stream_time(
        lambda v: W._build_table_impl(v, widths, strides, n_lead)[0], xps)
    res["table_build_us"] = dt * 1e6
    print(f"table build : {dt*1e6:7.1f} us (plan {widths}/{strides})",
          flush=True)

    p = W._make_params(tuple(xps.shape[1:-1]), 1, 1, 2, 3, (200, 300),
                       "float32", pad)
    table = jax.jit(
        lambda v: W._build_table_impl(v, widths, strides, n_lead)[0])(xps[0])
    tables = jnp.broadcast_to(table, (K, *table.shape))
    ccs = jnp.asarray((rng.random((K, 60000, 2)) * 190).astype(np.float32))
    dt = stream_time(lambda tb, c: W._stage_primal(tb, c, p), (tables, ccs))
    res["gather_us"] = dt * 1e6
    print(f"gather+wts  : {dt*1e6:7.1f} us "
          f"({60000/dt/1e6:.0f} M rows/s)", flush=True)

    # weights alone (no gather): replaces the row fetch with a broadcast
    def wts_only(c):
        row_base, wrow, _ = W._chunk_weights(c, p)
        return jnp.sum(wrow) + jnp.sum(row_base)
    dt = stream_time(wts_only, ccs)
    res["weights_us"] = dt * 1e6
    print(f"weights only: {dt*1e6:7.1f} us", flush=True)

    # coordinate map alone
    from elasticdeform_tpu.ops import modes as modes_mod

    def coords(displ):
        cc = []
        for h in range(2):
            co = jax.lax.broadcasted_iota(jnp.float32, (200, 300), h)
            m, _ = modes_mod.map_coordinate(co + displ[h], (200, 300)[h], 3)
            cc.append(m.reshape(60000))
        return jnp.stack(cc, axis=-1)
    displs = jnp.asarray(rng.random((K, 2, 200, 300), dtype=np.float32) * 10)
    dt = stream_time(coords, displs)
    res["coord_map_us"] = dt * 1e6
    print(f"coord map   : {dt*1e6:7.1f} us", flush=True)

    def wpad(x):
        x = x[..., None]
        for h in range(2):
            x = W.window_pad_axis(x, h, pad, widths[h])
        return x
    dt = stream_time(wpad, xs)
    res["window_pad_us"] = dt * 1e6
    print(f"window pad  : {dt*1e6:7.1f} us", flush=True)

    if json_path:
        with open(json_path, "w") as f:
            json.dump({k: round(v, 1) for k, v in res.items()}, f, indent=2)
        print(f"wrote {json_path}", flush=True)


if __name__ == "__main__":
    jp = None
    if "--json" in sys.argv:
        jp = sys.argv[sys.argv.index("--json") + 1]
    main(jp)
