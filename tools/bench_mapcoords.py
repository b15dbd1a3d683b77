"""Supplementary benchmark: general-resampler throughput on the chip.

Measures the new surface (not part of the driver's BASELINE table):
  * map_coordinates forward, 128^3 volume, random coordinates
  * deform_field_batch forward, 16x 64^3 per-sample dense fields
  * deform_field_batch fwd+grad pair (the registration training step)

Run on TPU:  python tools/bench_mapcoords.py
CPU smoke:   python tools/bench_mapcoords.py --cpu
"""
import json
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import elasticdeform_tpu as ed  # noqa: E402

SMOKE = "--cpu" in sys.argv


def timeit(fn, *a, n=3 if SMOKE else 10):
    out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    N = 32 if SMOKE else 128
    X = jnp.asarray(rng.random((N, N, N)), jnp.float32)
    coords = jnp.asarray(np.stack([
        rng.uniform(0, N - 1, size=(N, N, N)) for _ in range(3)]),
        jnp.float32)

    mc = jax.jit(lambda x, c: ed.map_coordinates(x, c, order=3,
                                                 mode='mirror'))
    t = timeit(mc, X, coords)
    print(json.dumps({"metric": "map_coordinates_fwd_128cubed" if not SMOKE
                      else "map_coordinates_fwd_smoke",
                      "value": round(N ** 3 / t / 1e6, 2),
                      "unit": "Mvox/s"}))

    B, M = (4, 16) if SMOKE else (16, 64)
    Xb = jnp.asarray(rng.random((B, M, M, M)), jnp.float32)
    fld = jnp.asarray(rng.standard_normal((B, 3, M, M, M)) * 3, jnp.float32)

    ff = jax.jit(lambda x, f: ed.deform_field_batch(x, f, order=3,
                                                    mode='mirror'))
    t = timeit(ff, Xb, fld)
    print(json.dumps({"metric": "deform_field_batch_fwd",
                      "value": round(B * M ** 3 / t / 1e6, 2),
                      "unit": "Mvox/s"}))

    @jax.jit
    def pair(x, f):
        def loss(f):
            y = ed.deform_field_batch(x, f, order=3, mode='mirror')
            return jnp.mean(y ** 2)
        return jax.value_and_grad(loss)(f)

    t = timeit(pair, Xb, fld)
    print(json.dumps({"metric": "deform_field_batch_pair",
                      "value": round(B * M ** 3 / t / 1e6, 2),
                      "unit": "Mvox/s"}))


if __name__ == "__main__":
    main()
