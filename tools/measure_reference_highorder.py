"""Measure the reference C implementation (CPU) on the supplementary
high-order / high-rank configs (VERDICT r3 task 4), extending
BASELINE_MEASURED.json's method to:

  c6: 3D 64^3 order-4 mirror forward
  c7: 3D 64^3 order-5 mirror forward
  c8: 4D 24^4 order-3 mirror forward (naxis=4 — the n_lead tap-loop path
      on the TPU side)

Run after tools/build_reference.sh:   python tools/measure_reference_highorder.py
Prints a JSON block to merge into bench.py's BASELINES.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/tmp/refbuild")
import elasticdeform as edc  # noqa: E402


def timeit(fn, n=5):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    out = {}

    x3 = rng.random((64, 64, 64))
    for order, key in ((4, "c6"), (5, "c7")):
        d = rng.standard_normal((3, 3, 3, 3)) * 15
        dt = timeit(lambda: edc.deform_grid(x3, d, order=order,
                                            mode="mirror"))
        out[key] = {"s": round(dt, 5),
                    "mvox_per_s": round(x3.size / dt / 1e6, 4),
                    "what": f"3D 64^3 order-{order} mirror fwd"}

    x4 = rng.random((24, 24, 24, 24))
    d4 = rng.standard_normal((4, 3, 3, 3, 3)) * 6
    dt = timeit(lambda: edc.deform_grid(x4, d4, order=3, mode="mirror"))
    out["c8"] = {"s": round(dt, 5),
                 "mvox_per_s": round(x4.size / dt / 1e6, 4),
                 "what": "4D 24^4 order-3 mirror fwd (naxis=4)"}

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
