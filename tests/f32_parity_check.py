"""f32 compute-path parity vs the float64 scipy oracle.

Run WITHOUT x64 (``JAX_ENABLE_X64=0``) so the library computes in float32 —
the same path the TPU uses — and assert the BASELINE.json 1e-5 parity
contract against the float64 oracle. Executed as a subprocess by
tests/test_f32.py (the main suite pins x64 on) and as its own CI job.
"""

import os
import sys

os.environ["JAX_ENABLE_X64"] = "0"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert not jax.config.jax_enable_x64

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)                      # for oracle.py
sys.path.insert(0, os.path.dirname(_here))     # repo root

import elasticdeform_tpu as ed  # noqa: E402
from oracle import deform_grid_oracle_oldmode  # noqa: E402

RNG = np.random.default_rng(321)


def check(shape, points, sigma=15, rtol=1e-5, atol=1e-5, **kwargs):
    axis = kwargs.get("axis")
    naxis = len(axis) if axis is not None else len(shape)
    displacement = RNG.standard_normal((naxis, *points)) * sigma
    X = RNG.random(shape)
    res = np.asarray(ed.deform_grid(X.astype(np.float32),
                                    displacement.astype(np.float32),
                                    **kwargs))
    assert res.dtype == np.float32
    ref = deform_grid_oracle_oldmode(X, displacement, **kwargs)
    np.testing.assert_allclose(res, ref, rtol=rtol, atol=atol)
    print(f"ok shape={shape} kwargs={kwargs} "
          f"maxerr={np.abs(res - ref).max():.2e}")


def check_gradient(shape, points, order, mode, rtol, atol):
    naxis = len(shape)
    displacement = RNG.standard_normal((naxis, *points)) * 3
    gy = RNG.random(shape)
    X = RNG.random(shape)
    # adjoint identity in f32: <deform(x), gy> == <x, deform_gradient(gy)>
    y = np.asarray(ed.deform_grid(X.astype(np.float32),
                                  displacement.astype(np.float32),
                                  order=order, mode=mode))
    gx = np.asarray(ed.deform_grid_gradient(gy.astype(np.float32),
                                            displacement.astype(np.float32),
                                            order=order, mode=mode))
    lhs, rhs = np.vdot(y, gy), np.vdot(X, gx)
    np.testing.assert_allclose(lhs, rhs, rtol=rtol)
    print(f"ok grad order={order} mode={mode} "
          f"rel={(abs(lhs - rhs) / abs(lhs)):.2e}")


def main():
    # representative forward configs, incl. the prefilter-heavy high orders
    # whose bf16-vs-HIGHEST matmul precision claims this job pins down
    check((60, 45), (3, 3), order=3, mode='mirror')
    check((60, 45), (3, 3), order=0, mode='nearest')
    check((60, 45), (3, 3), order=1, mode='wrap')
    check((50, 40), (3, 3), order=4, mode='reflect', atol=2e-5)
    check((50, 40), (3, 3), order=5, mode='constant', atol=5e-5)
    check((25, 30, 20), (3, 3, 3), order=3, mode='mirror')
    check((25, 30, 20), (3, 3, 3), order=5, mode='mirror', atol=5e-5)
    check((40, 40), (3, 3), order=3, mode='mirror',
          crop=(slice(10, 30), slice(5, 25)))
    check((30, 25, 3), (3, 3), order=3, mode='mirror', axis=(0, 1))
    # gradients (f32 accumulation: looser than the f64 1e-9 suite)
    check_gradient((30, 25), (3, 3), order=3, mode='mirror', rtol=1e-4,
                   atol=0)
    check_gradient((20, 18, 16), (3, 3, 3), order=5, mode='constant',
                   rtol=1e-4, atol=0)
    print("F32_PARITY_OK")


if __name__ == "__main__":
    main()
