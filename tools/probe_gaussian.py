"""Probe: gaussian/uniform filter stage costs on chip.

c9 (gaussian_filter sigma=2, 128^3) streams ~0.5 ms/volume — ~5x the
matmul roofline (3 axis contractions of 0.5 GMAC each ≈ 30 us MXU) —
and swings 20% between sessions. Measures, streamed over K volumes:

  * each single-axis pass alone (axis 0 / 1 / 2) via apply_filter1d,
  * the full 3-axis gaussian_filter,
  * A/B: tensordot-form (current) vs moveaxis-to-last + x @ M.T form,
  * uniform_filter size-5 for comparison.

Writes bench_artifacts/probe_gaussian_<stamp>.json. One TPU job at a
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
from jax import lax

from elasticdeform_tpu.ops import filters as F

N = int(os.environ.get("PROBE_N", "128"))
K = int(os.environ.get("PROBE_K", "8"))


def sync(x):
    return float(x)


def stream(fn):
    f = jax.jit(lambda b: lax.scan(
        lambda c, a: (c, jnp.sum(fn(a))), 0.0, b)[1].sum())
    return f


def timeit(f, xs):
    sync(f(xs))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(f(xs))
        best = min(best, (time.perf_counter() - t0) / K)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.random((K, N, N, N), dtype=np.float32))
    out = {"n": N, "k": K, "ms_per_vol": {}}

    M, b = F.gaussian_filter1d_matrix(N, 2.0, 0, "reflect", 4.0, None)
    Mj = jnp.asarray(M, jnp.float32)

    def axis_pass_tensordot(x, axis):
        return jnp.moveaxis(
            jnp.tensordot(Mj, x, axes=[[1], [axis]],
                          precision=jax.lax.Precision.HIGHEST),
            0, axis)

    def axis_pass_movelast(x, axis):
        xm = jnp.moveaxis(x, axis, -1)
        ym = jnp.matmul(xm, Mj.T,
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.moveaxis(ym, -1, axis)

    cases = {}
    for ax in range(3):
        cases[f"tensordot_ax{ax}"] = (
            lambda x, ax=ax: axis_pass_tensordot(x, ax))
        cases[f"movelast_ax{ax}"] = (
            lambda x, ax=ax: axis_pass_movelast(x, ax))
    cases["gaussian_full"] = lambda x: F.apply_filter1d(
        F.apply_filter1d(F.apply_filter1d(
            x, 0, 2.0, 0, "reflect", 0.0, 4.0, None),
            1, 2.0, 0, "reflect", 0.0, 4.0, None),
        2, 2.0, 0, "reflect", 0.0, 4.0, None)
    cases["gaussian_movelast3"] = lambda x: axis_pass_movelast(
        axis_pass_movelast(axis_pass_movelast(x, 0), 1), 2)
    import elasticdeform_tpu as ed
    cases["ed_gaussian"] = lambda x: ed.gaussian_filter(x, 2.0)
    cases["ed_uniform5"] = lambda x: ed.uniform_filter(x, 5)
    cases["copy_baseline"] = lambda x: x * 1.0000001

    for name, fn in cases.items():
        dt = timeit(stream(fn), xs)
        out["ms_per_vol"][name] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms/vol "
              f"({N**3/dt/1e6:.0f} Mvox/s)", flush=True)

    stamp = time.strftime("%Y%m%d_%H%M%S", time.gmtime())
    path = os.path.join(os.path.dirname(__file__), "..",
                        "bench_artifacts", f"probe_gaussian_{stamp}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
