"""Probe: 2-D window-table build — one-hot conv vs selection matmuls.

The selection-matmul build (`_build_table_matmul`) replaces the strided
one-hot grouped conv with two dot_generals; it is O(H) more flops (each
expansion contracts a full axis) but avoids the conv lowering's fixed
costs, so it should win small images and lose big ones. This probe walks
image sizes to find the crossover, which sets the auto gate.

Run:  python tools/probe_build2d.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.ops import windows as W


def timeit(fn, *args, n=20):
    # block_until_ready does NOT synchronize over the remote tunnel:
    # sync by fetching a scalar derived from the last output
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print(jax.devices(), flush=True)
    widths, strides = (8, 16), (5, 13)
    rng = np.random.default_rng(0)
    for (H, Wd) in [(200, 300), (384, 384), (512, 512), (768, 768),
                    (1024, 1024), (1536, 1536), (2048, 2048)]:
        pad = 4
        P0, P1 = H + 2 * pad + widths[0], Wd + 2 * pad + widths[1]
        xp = jnp.asarray(rng.random((P0, P1, 1)).astype(np.float32))

        # _build_mode() is read at trace time, so set the env var before
        # the first (tracing) call of each freshly-jitted wrapper
        # the sum reduction is identical for both variants (same table),
        # so the A/B difference is the build alone
        os.environ["ELASTICDEFORM_TPU_BUILD"] = "conv"
        conv = jax.jit(lambda v: jnp.sum(W._build_table_impl(
            v, widths, strides, 0, False)[0]))
        tc = timeit(conv, xp)
        os.environ["ELASTICDEFORM_TPU_BUILD"] = "matmul"
        mm = jax.jit(lambda v: jnp.sum(W._build_table_impl(
            v, widths, strides, 0, False)[0]))
        tm = timeit(mm, xp)
        del os.environ["ELASTICDEFORM_TPU_BUILD"]
        elems = P0 * P1
        print(f"{H}x{Wd}  padded elems {elems/1e6:6.2f} M  "
              f"conv {tc*1e3:7.3f} ms  matmul {tm*1e3:7.3f} ms  "
              f"ratio {tm/tc:5.2f}", flush=True)


if __name__ == "__main__":
    main()
