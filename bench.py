"""Benchmark: batched 3D order-3 elastic deformation, forward + gradient.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline config is BASELINE.json config 5: a batch of 64 3D volumes
(64^3), per-sample random control grids, order-3 mirror deformation, forward
+ input-gradient pair, jit-compiled on one chip. ``vs_baseline`` compares
against the reference C implementation measured on this machine's CPU
(BASELINE_MEASURED.json: 0.4568 Mvox/s for the same fwd+grad pair).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from elasticdeform_tpu.parallel.sharding import batched_deform

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    size = int(os.environ.get("BENCH_SIZE", "64"))
    points = 3

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, size, size, size), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal(
        (batch, 3, points, points, points)).astype(np.float32) * 15)
    gy = jnp.asarray(rng.random((batch, size, size, size), dtype=np.float32))

    def fwd(x, d):
        return batched_deform(x, d, order=3, mode='mirror')

    @jax.jit
    def fwd_grad(x, d, gy):
        y, vjp = jax.vjp(lambda x_: fwd(x_, d), x)
        (gx,) = vjp(gy)
        # reduce to scalars: fetching them forces real completion even on
        # backends where block_until_ready is effectively async (remote
        # TPU tunnels) — the reductions depend on every output element
        return jnp.sum(y), jnp.sum(gx)

    # compile + warmup (fetch to synchronize)
    sy, sg = fwd_grad(x, d, gy)
    float(sy); float(sg)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        sy, sg = fwd_grad(x, d, gy)
    # device executes in-order: fetching the last iteration's scalars
    # synchronizes the whole timed sequence with a single round-trip
    float(sy); float(sg)
    dt = (time.perf_counter() - t0) / iters

    voxels = batch * size ** 3
    mvox_per_s = voxels / dt / 1e6

    baseline = 0.4568  # reference C fwd+grad Mvox/s (BASELINE_MEASURED.json)
    print(json.dumps({
        "metric": "batched 3D order-3 deform fwd+grad throughput",
        "value": round(mvox_per_s, 2),
        "unit": "Mvox/s/chip",
        "vs_baseline": round(mvox_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
