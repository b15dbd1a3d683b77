"""Weak-scaling record for the sharded paths (VERDICT r3 task 7).

Per-device-constant work, n_devices in {1, 2, 4, 8} on the virtual-CPU
mesh (or real devices when >1 exist):

  * DP `sharded` batched deform: batch = 4 * n samples of 32^3;
  * spatial halo pipeline: one volume of (32 * n, 16, 16).

On VIRTUAL devices all "chips" share one host CPU, so wall time is NOT
expected to stay flat — the artifact records (a) that the sharded program
compiles and runs at every mesh size with per-device-constant work, and
(b) the time curve, so a real multi-chip run has a committed baseline
shape to compare against. On real hardware (n real chips over ICI) the
same script should produce a flat curve; the deform op itself is
collective-free and the halo exchange is nearest-neighbor ppermute.

    python tools/weak_scaling.py  [--out bench_artifacts/weak_scaling.json]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# virtual 8-device CPU mesh unless real multi-device hardware is present
os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax                                                     # noqa: E402
import jax.numpy as jnp                                        # noqa: E402


def _devices():
    try:
        devs = jax.devices()
        if len(devs) >= 8:
            return devs, devs[0].platform
    except RuntimeError:
        pass
    return jax.devices("cpu"), "cpu"


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main(out_path="bench_artifacts/weak_scaling.json"):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from elasticdeform_tpu.parallel.sharding import batched_deform
    from elasticdeform_tpu.parallel.spatial import sharded_deform_spatial

    devs, platform = _devices()
    rng = np.random.default_rng(0)
    rec = {"platform": platform, "n_total_devices": len(devs),
           "note": ("per-device-constant work; virtual CPU devices share "
                    "one host, so flatness is only expected on real chips"),
           "dp": {}, "spatial": {}}

    for n in (1, 2, 4, 8):
        if n > len(devs):
            break
        mesh = Mesh(np.asarray(devs[:n]), ("d",))

        # DP: 4 samples x 32^3 per device
        b = 4 * n
        x = rng.random((b, 32, 32, 32), dtype=np.float32)
        d = rng.standard_normal((b, 3, 3, 3, 3)).astype(np.float32) * 5
        xs = jax.device_put(x, NamedSharding(mesh, P("d")))
        ds = jax.device_put(d, NamedSharding(mesh, P("d")))
        f = jax.jit(lambda x, d: batched_deform(x, d, order=3,
                                                mode="mirror"))
        rec["dp"][n] = round(timeit(f, xs, ds) * 1e3, 2)

        # spatial: 32 voxels of leading axis per device
        vol = rng.random((32 * n, 16, 16), dtype=np.float32)
        d1 = rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 2
        vs = jax.device_put(vol, NamedSharding(mesh, P("d")))
        d1s = jax.device_put(d1, NamedSharding(mesh, P()))
        g = jax.jit(lambda v, dd: sharded_deform_spatial(
            mesh, v, dd, max_displacement=4, order=3, mode="mirror",
            axis_name="d"))
        rec["spatial"][n] = round(timeit(g, vs, d1s) * 1e3, 2)
        print(f"n={n}: dp {rec['dp'][n]} ms, spatial {rec['spatial'][n]} ms",
              flush=True)

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    args = sys.argv[1:]
    out = args[args.index("--out") + 1] if "--out" in args \
        else "bench_artifacts/weak_scaling.json"
    main(out)
