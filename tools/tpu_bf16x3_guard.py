"""On-TPU bf16x3 ordering/elision guard — the hardware twin of
tests/test_units.py::test_split_bf16x3_elision_proof and
::test_onehot_bf16x3_matches_highest.

The CPU suite cannot see two real TPU failure modes:

1. XLA's excess-precision pass eliding the f32->bf16->f32 round-trip in
   ``_split_bf16x3`` (caught once on hardware — the "exact" 3-pass build
   silently degraded to single-pass bf16, ~2^-9 output error);
2. the channel-accumulation-order assumption behind the split's
   exactness claim (windows.py commentary around ``_BF16X3``): XLA does
   not *guarantee* the order, so bit-exactness is empirical per
   backend/version and must be re-proven after any toolchain bump.

Run ON THE CHIP with the split FORCED ON (tpu_ci.sh does both):

    ELASTICDEFORM_TPU_ONEHOT_BF16X3=1 python tools/tpu_bf16x3_guard.py

Exit 0 iff every check passes.
"""
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
os.environ.setdefault("ELASTICDEFORM_TPU_ONEHOT_BF16X3", "1")

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from elasticdeform_tpu.ops import windows as W                # noqa: E402


def main():
    print(jax.devices(), flush=True)
    assert jax.devices()[0].platform != "cpu", "run this on the TPU"
    ok = True

    # 1. elision proof: split reconstructs f32 exactly ON THE CHIP and the
    #    residual parts are genuinely nonzero (broken split: mid = lo = 0)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((256, 256)).astype(np.float32))
    fn = jax.jit(W._split_bf16x3)
    hi, mid, lo = [np.asarray(v, np.float64) for v in fn(x)]
    exact = bool((hi + mid + lo == np.asarray(x, np.float64)).all())
    nonzero = bool(np.abs(mid).max() > 0 and np.abs(lo).max() > 0)
    has_rp = "reduce_precision" in fn.lower(x).as_text()
    print(f"{'ok  ' if exact else 'FAIL'} split reconstructs f32 exactly",
          flush=True)
    print(f"{'ok  ' if nonzero else 'FAIL'} residual parts nonzero",
          flush=True)
    print(f"{'ok  ' if has_rp else 'FAIL'} reduce_precision present in HLO",
          flush=True)
    ok &= exact and nonzero and has_rp

    # 2. ordering guard: with the split forced on, the one-hot table build
    #    must be BIT-EXACT vs the HIGHEST-precision f32 build (one pick per
    #    output element — exactness depends on XLA's channel accumulation
    #    behavior, the empirical assumption this re-proves per toolchain)
    padded = (20, 21, 22)
    p = W._make_params(padded, 2, 3, 3, 3, (12, 12, 12), "float32", 2)
    xp = jnp.asarray(rng.standard_normal((3, *padded, 2)).astype(np.float32))
    cc = jnp.asarray((rng.random((3 * 12 ** 3, 3)) * 11).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((3 * 12 ** 3, 2)).astype(np.float32))

    results = {}
    for flag in ("1", "0"):
        W._BF16X3 = flag
        jax.clear_caches()
        table, _ = W._build_table_impl(xp, p.widths, p.strides, p.n_lead,
                                       True)
        out = W._windows_op(xp, cc, p, padded, True)
        dxp = W._scatter_fold(g, cc, p, padded, True)
        results[flag] = (np.asarray(table), np.asarray(out), np.asarray(dxp))
    t1, o1, d1 = results["1"]
    t0, o0, d0 = results["0"]
    bit = bool((t1 == t0).all())
    oerr = float(np.abs(o1 - o0).max())
    derr = float(np.abs(d1 - d0).max())
    print(f"{'ok  ' if bit else 'FAIL'} table build bit-exact vs HIGHEST",
          flush=True)
    print(f"{'ok  ' if oerr <= 1e-5 else 'FAIL'} forward out err {oerr:.2e} "
          "(tol 1e-05)", flush=True)
    print(f"{'ok  ' if derr <= 1e-4 else 'FAIL'} scatter-fold err {derr:.2e} "
          "(tol 1e-04)", flush=True)
    ok &= bit and oerr <= 1e-5 and derr <= 1e-4

    print("PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
