"""Probe: N-D correlate formulations on the chip (VERDICT r4 task 1
follow-up — the conv_general_dilated c12 measured 0.52x scipy-CPU).

Times, on one 128^3 float32 volume with a dense 5^3 kernel, each
internal apply_correlate strategy as a SINGLE jitted call (no scan
harness), logging compile wall-time separately from steady-state run
time — the 2026-08-19 sessions saw >20 min server-side compiles for
the streamed c12 graph, so this isolates graph cost from service load.

Writes bench_artifacts/probe_correlate_<stamp>.json. One TPU job at a
time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from elasticdeform_tpu.ops import filters as F

N = int(os.environ.get("PROBE_N", "128"))
K = int(os.environ.get("PROBE_K", "5"))


def sync(x):
    return float(jnp.sum(x))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((N, N, N), dtype=np.float32))
    w = rng.random((K, K, K))
    out = {"n": N, "k": K, "strategies": {}}

    # gates per strategy: (matmul_bytes, unroll_taps)
    gates = {"matmul": (64 << 20, 4096),
             "tapstack": (0, 4096),
             "conv": (0, 0)}
    ref = None
    for name, (mat, taps) in gates.items():
        F._CORRELATE_MATMUL_BYTES = mat
        F._CORRELATE_UNROLL_TAPS = taps
        f = jax.jit(lambda a: F.apply_correlate(
            a, w, "reflect", 0.0, 0))
        t0 = time.perf_counter()
        r = f(x)
        s = sync(r)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(x))
            best = min(best, time.perf_counter() - t0)
        arr = np.asarray(r)
        if ref is None:
            ref = arr
        err = float(np.abs(arr - ref).max())
        rec = {"compile_s": round(compile_s, 1),
               "run_ms": round(best * 1e3, 2),
               "mvox_per_s": round(N ** 3 / best / 1e6, 1),
               "max_err_vs_first": err}
        out["strategies"][name] = rec
        print(f"{name}: compile {compile_s:.1f}s run {best*1e3:.2f}ms "
              f"({rec['mvox_per_s']} Mvox/s) err {err:.2e}", flush=True)
        jax.clear_caches()

    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_artifacts", f"probe_correlate_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
