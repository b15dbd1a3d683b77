"""Stage profile of the 3D crop forward (bench c3 config) on TPU.

Scan-stream timing like profile_c1 (device time, not dispatch floor).

    python tools/profile_c3.py [--json out.json]
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

K = 8
N = 128
OUT = 64
CROP = (slice(32, 96),) * 3


def stream_time(stage, args, n=5):
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
    xs = jnp.asarray(rng.random((K, N, N, N), dtype=np.float32))
    ds = jnp.asarray(rng.standard_normal((K, 3, 3, 3, 3)).astype(np.float32)
                     * 15)

    dt = stream_time(
        lambda x, d: ed.deform(x, d, order=3, mode='mirror', crop=CROP),
        (xs, ds))
    res["full_fwd_us"] = dt * 1e6
    print(f"full fwd    : {dt*1e6:8.1f} us/vol "
          f"({OUT**3/dt/1e6:.1f} Mvox/s out)", flush=True)

    def pf(x):
        for d in range(3):
            x = spline_filter1d(x, 3, d)
        return x
    dt = stream_time(pf, xs)
    res["prefilter_us"] = dt * 1e6
    print(f"prefilter   : {dt*1e6:8.1f} us", flush=True)

    plan = W.window_plan(3, 3, (N, N, N))
    n_lead, widths, strides = plan
    pad = 2
    padded = tuple(N + 2 * pad + w for w in widths)
    xps = jnp.asarray(rng.random((K, *padded, 1), dtype=np.float32))
    dt = stream_time(
        lambda v: W._build_table_impl(v, widths, strides, n_lead)[0], xps)
    res["table_build_us"] = dt * 1e6
    print(f"table build : {dt*1e6:8.1f} us (plan {widths}/{strides})",
          flush=True)

    def wpad(x):
        x = x[..., None]
        for h in range(3):
            x = W.window_pad_axis(x, h, pad, widths[h])
        return x
    dt = stream_time(wpad, xs)
    res["window_pad_us"] = dt * 1e6
    print(f"window pad  : {dt*1e6:8.1f} us", flush=True)

    def disp(dd):
        return dense_displacement(dd, (OUT,) * 3, (N,) * 3, (32,) * 3,
                                  jnp.float32, prefilter_grid=True)
    dt = stream_time(disp, ds)
    res["displacement_us"] = dt * 1e6
    print(f"displacement: {dt*1e6:8.1f} us", flush=True)

    p = W._make_params(padded, 1, 1, 3, 3, (OUT,) * 3, "float32", pad,
                       plan=plan)
    table = jax.jit(
        lambda v: W._build_table_impl(v, widths, strides, n_lead)[0])(xps[0])
    tables = jnp.broadcast_to(table, (K, *table.shape))
    ccs = jnp.asarray((rng.random((K, OUT ** 3, 3)) * (N - 10) + 2)
                      .astype(np.float32))
    dt = stream_time(lambda tb, c: W._stage_primal(tb, c, p),
                     (tables, ccs))
    res["gather_us"] = dt * 1e6
    print(f"gather+wts  : {dt*1e6:8.1f} us "
          f"({OUT**3/dt/1e6:.0f} M rows/s)", flush=True)

    if json_path:
        with open(json_path, "w") as f:
            json.dump({k: round(v, 1) for k, v in res.items()}, f, indent=2)
        print(f"wrote {json_path}", flush=True)


if __name__ == "__main__":
    jp = None
    if "--json" in sys.argv:
        jp = sys.argv[sys.argv.index("--json") + 1]
    main(jp)
