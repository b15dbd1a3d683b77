"""Probe: dense filter-matrix matmul vs associative_scan prefilter on TPU.

Times ``spline_filter1d`` both ways across axis lengths to place the
``ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN`` crossover (default 8192 chosen
for memory asymptotics; the flops crossover may differ on the MXU).

Run on TPU:  python tools/probe_prefilter_scan.py
CPU smoke:   python tools/probe_prefilter_scan.py --cpu
"""
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from elasticdeform_tpu.ops import prefilter as pf  # noqa: E402

SIZES = [1024, 2048, 4096, 8192, 16384] if "--cpu" not in sys.argv \
    else [512, 1024]
COLS = 64  # enough rows to keep the chip busy; bytes scale with n * COLS


def timeit(fn, x, n=10):
    out = fn(x)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(x)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


for n in SIZES:
    x = jnp.asarray(np.random.default_rng(0).random((n, COLS)), jnp.float32)
    mat = jax.jit(lambda v, n=n: pf._apply_matrix(
        v, pf.filter_matrix(n, 3), 0))
    scan = jax.jit(lambda v: pf._apply_scan(v, 3, 0))
    tm = timeit(mat, x)
    ts = timeit(scan, x)
    a, b = np.asarray(mat(x)), np.asarray(scan(x))
    err = float(np.abs(a - b).max() / max(1e-30, np.abs(a).max()))
    print(f"n={n:6d}  matrix {tm*1e3:7.2f} ms   scan {ts*1e3:7.2f} ms   "
          f"ratio {tm/ts:5.2f}   rel err {err:.2e}", flush=True)
