"""Measure scipy.ndimage CPU baselines for the ndimage-tier bench
configs (VERDICT r4 task 1), the same way BASELINE_MEASURED.json was
produced for the deform tier: best-of-REPEATS wall time over ITERS
calls on this machine's CPU, Mvox/s of output voxels.

Writes BASELINE_NDIMAGE.json; bench.py reads the numbers from there
(vendored as constants with the measurement stamp).

Run: python tools/measure_scipy_ndimage.py
"""

import json
import os
import platform
import time

import numpy as np
import scipy
from scipy import ndimage

N = 128
REPEATS = int(os.environ.get("REPEATS", "3"))


def timeit(fn, iters):
    fn()  # warm
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    vol = rng.random((N, N, N), dtype=np.float32)
    mask = rng.random((N, N, N)) < 0.5          # the r4 probe's density
    # a structured mask too: random blobs (more like real segmentations)
    blob = ndimage.gaussian_filter(
        rng.standard_normal((N, N, N)), 6.0) > 0.0
    kern5 = rng.random((5, 5, 5))

    voxels = N ** 3
    cases = {
        "n_gaussian": (lambda: ndimage.gaussian_filter(vol, 2.0), 3),
        "n_median": (lambda: ndimage.median_filter(vol, 3), 1),
        "n_uniform": (lambda: ndimage.uniform_filter(vol, 5), 3),
        "n_correlate": (lambda: ndimage.correlate(vol, kern5), 1),
        "n_binary_erosion": (lambda: ndimage.binary_erosion(mask), 3),
        "n_fill_holes": (lambda: ndimage.binary_fill_holes(blob), 1),
        "n_edt": (lambda: ndimage.distance_transform_edt(mask), 1),
        "n_label": (lambda: ndimage.label(mask), 1),
        "n_label_blob": (lambda: ndimage.label(blob), 1),
    }
    # resampler family (the scipy surface next to the deform tier)
    mat = np.array([[0.9, 0.05, 0.0], [0.0, 1.1, -0.05],
                    [0.02, 0.0, 0.95]])
    offs = np.array([2.0, -1.5, 0.5])
    coords = np.indices((N, N, N)).astype(np.float64)
    coords = coords + rng.standard_normal(coords.shape) * 2.0
    cases["n_affine_o1"] = (
        lambda: ndimage.affine_transform(vol, mat, offs, order=1), 1)
    cases["n_affine_o3"] = (
        lambda: ndimage.affine_transform(vol, mat, offs, order=3), 1)
    cases["n_mapcoords_o1"] = (
        lambda: ndimage.map_coordinates(vol, coords, order=1), 1)
    out = {"meta": {
        "machine": platform.platform(),
        "cpu_count": os.cpu_count(),
        "scipy": scipy.__version__,
        "numpy": np.__version__,
        "volume": f"{N}^3",
        "note": ("best-of-%d wall time per call, single-threaded scipy "
                 "(scipy.ndimage releases the GIL but does not itself "
                 "thread); Mvox/s of output voxels" % REPEATS),
    }}
    for name, (fn, iters) in cases.items():
        dt = timeit(fn, iters)
        out[name] = {"seconds_per_call": round(dt, 5),
                     "mvox_per_s": round(voxels / dt / 1e6, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BASELINE_NDIMAGE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote BASELINE_NDIMAGE.json")


if __name__ == "__main__":
    main()
