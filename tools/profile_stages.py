"""Stage-by-stage TPU profile of the flagship fwd+grad pipeline.

Times each stage of the batched 64x 64^3 order-3 pair in isolation (jit'd,
scalar-fetch synchronized — block_until_ready does not synchronize over
remote tunnels). Run it ALONE: concurrent TPU jobs contaminate timings.

    python tools/profile_stages.py [batch] [size]

Reference numbers (1x v5e, end of round 2):
    build ~42 ms | gather ~165 ms | scatter ~170 ms | fold ~26 ms |
    transpose prefilter ~10 ms  ->  pair ~455 ms = 36.7 Mvox/s.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.ops import windows as W                # noqa: E402
from elasticdeform_tpu.ops.prefilter import (                 # noqa: E402
    spline_filter1d_transpose,
)


def timeit(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def main(batch=64, size=64, order=3):
    pad = 2
    padded = tuple(size + 2 * pad + e for e in (4, 4, 8))
    p = W._make_params(padded, 1, batch, 3, order, (size,) * 3,
                       "float32", pad)
    rng = np.random.default_rng(0)
    n_out = batch * size ** 3
    cc = jnp.asarray(rng.random((n_out, 3), dtype=np.float32) * (size - 1))
    g = jnp.asarray(rng.random((n_out, 1), dtype=np.float32))
    xp = jnp.asarray(rng.random((batch, *padded, 1), dtype=np.float32))

    build = jax.jit(lambda x: W._build_table_impl(
        x, p.widths, p.strides, p.n_lead, True)[0])
    table = build(xp)
    print(f"table build : {timeit(build, xp)*1e3:7.1f} ms "
          f"(table {table.shape}, {table.nbytes/2**30:.2f} GiB)")

    prim = jax.jit(lambda tb, c: W._stage_primal(tb, c, p))
    dt = timeit(prim, table, cc)
    print(f"row gather  : {dt*1e3:7.1f} ms ({n_out/dt/1e6:.0f} M rows/s)")

    def scat_only(gg, c):
        return sum(W._scatter_group(
            gg[b * p.n_out_s:(b + 1) * p.n_out_s],
            c[b * p.n_out_s:(b + 1) * p.n_out_s], p, 1).sum()
            for b in range(batch))
    dt = timeit(jax.jit(scat_only), g, cc)
    print(f"row scatter : {dt*1e3:7.1f} ms ({n_out/dt/1e6:.0f} M rows/s)")

    sf = jax.jit(lambda gg, c: W._scatter_fold(gg, c, p, padded, True))
    print(f"scatter+fold: {timeit(sf, g, cc)*1e3:7.1f} ms")

    def tpf(x):
        for d in range(3, 0, -1):
            x = spline_filter1d_transpose(x, order, d)
        return x
    print(f"transpose pf: {timeit(jax.jit(tpf), xp)*1e3:7.1f} ms")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    main(*args)
