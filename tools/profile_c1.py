"""Stage profile of the small-2D forward (bench c1 config) on TPU.

    python tools/profile_c1.py
"""
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


def timeit(fn, *args, n=50):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((200, 300), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal((2, 3, 3)).astype(np.float32) * 25)

    full = jax.jit(lambda x, d: ed.deform(x, d, order=3, mode='mirror'))
    print(f"full fwd    : {timeit(full, x, d)*1e3:7.3f} ms", flush=True)

    pf = jax.jit(lambda x: spline_filter1d(
        spline_filter1d(x, 3, 0), 3, 1))
    print(f"prefilter   : {timeit(pf, x)*1e3:7.3f} ms", flush=True)

    def disp(dd):
        for ax in range(1, 3):
            dd = spline_filter1d(dd, 3, ax)
        return dense_displacement(dd, (200, 300), (200, 300), (0, 0),
                                  jnp.float32)
    dispj = jax.jit(disp)
    print(f"displacement: {timeit(dispj, d)*1e3:7.3f} ms", flush=True)

    # table build alone (2D order-3 plan: widths (4,32), strides (1,29))
    pad = 2
    xp = jnp.asarray(rng.random((200 + 2 * pad + 4, 300 + 2 * pad + 32, 1),
                                dtype=np.float32))
    build = jax.jit(lambda v: W._build_table_impl(v, (4, 32), (1, 29), 0)[0])
    table = build(xp)
    print(f"table build : {timeit(build, xp)*1e3:7.3f} ms "
          f"(table {table.shape})", flush=True)

    W._BF16X3 = "0"
    build_h = jax.jit(
        lambda v: W._build_table_impl(v, (4, 32), (1, 29), 0)[0] + 0.0)
    print(f"build HIGHEST: {timeit(build_h, xp)*1e3:7.3f} ms", flush=True)
    W._BF16X3 = "auto"

    # gather stage alone
    p = W._make_params(tuple(xp.shape[:-1]), 1, 1, 2, 3, (200, 300),
                       "float32", pad)
    cc = jnp.asarray((rng.random((60000, 2)) * 190).astype(np.float32))
    prim = jax.jit(lambda tb, c: W._stage_primal(tb, c, p))
    print(f"gather+wts  : {timeit(prim, table, cc)*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
