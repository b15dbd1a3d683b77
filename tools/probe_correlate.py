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

    # gates per strategy: (matmul_bytes, unroll_taps, onedot_env)
    gates = {"matmul_sep": (64 << 20, 4096, None),
             "matmul_onedot": (64 << 20, 4096, "1"),
             "tapstack": (0, 4096, None),
             "conv": (0, 0, None)}
    KS = 4  # streamed volumes
    xs = jnp.asarray(rng.random((KS, N, N, N), dtype=np.float32))
    ref = None
    for name, (mat, taps, onedot) in gates.items():
        F._CORRELATE_MATMUL_BYTES = mat
        F._CORRELATE_UNROLL_TAPS = taps
        if onedot:
            os.environ["ELASTICDEFORM_TPU_CORRELATE_ONEDOT"] = onedot
        else:
            os.environ.pop("ELASTICDEFORM_TPU_CORRELATE_ONEDOT", None)
        f = jax.jit(lambda a: F.apply_correlate(
            a, w, "reflect", 0.0, 0))
        t0 = time.perf_counter()
        r = f(x)
        sync(r)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(x))
            best = min(best, time.perf_counter() - t0)
        # streamed: one scan over KS volumes, amortizing dispatch
        import jax.lax as lax
        fs = jax.jit(lambda b: lax.scan(
            lambda c, a: (c, jnp.sum(F.apply_correlate(
                a, w, "reflect", 0.0, 0))), 0, b)[1])
        t0 = time.perf_counter()
        sync(fs(xs))
        stream_compile_s = time.perf_counter() - t0
        sbest = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fs(xs))
            sbest = min(sbest, (time.perf_counter() - t0) / KS)
        arr = np.asarray(r)
        if ref is None:
            ref = arr
        err = float(np.abs(arr - ref).max())
        rec = {"compile_s": round(compile_s, 1),
               "run_ms": round(best * 1e3, 2),
               "stream_compile_s": round(stream_compile_s, 1),
               "stream_ms_per_vol": round(sbest * 1e3, 2),
               "stream_mvox_per_s": round(N ** 3 / sbest / 1e6, 1),
               "max_err_vs_first": err}
        out["strategies"][name] = rec
        print(f"{name}: compile {compile_s:.1f}s run {best*1e3:.2f}ms; "
              f"stream compile {stream_compile_s:.1f}s "
              f"{sbest*1e3:.2f}ms/vol ({rec['stream_mvox_per_s']} "
              f"Mvox/s) err {err:.2e}", flush=True)
        jax.clear_caches()

    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_artifacts", f"probe_correlate_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
