"""Mosaic dynamic_gather shape-contract probe (round 4).

jax 0.9 changed the in-kernel gather lowering: `jnp.take(table, idx,
axis=0)` now fails with "Shape mismatch in input, indices and output"
(it used to HTTP-500). That error is a *lowering-rule shape check*, which
suggests the primitive exists and wants a different indices shape. Try
the plausible contracts; if any compiles and is fast, a VMEM-resident
gather kernel becomes buildable (ROADMAP "Pallas status").

    python tools/probe_dyngather2.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.experimental import pallas as pl                     # noqa: E402
from jax.experimental.pallas import tpu as pltpu              # noqa: E402

LANES = 128


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def run(name, kernel, n_rows=1024, chunk=1024, idx_shape=None):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n_rows, LANES), dtype=np.float32))
    idx_np = rng.integers(0, n_rows, chunk).astype(np.int32)
    if idx_shape == "2d":
        idx = jnp.asarray(np.broadcast_to(idx_np[:, None],
                                          (chunk, LANES)).copy())
    else:
        idx = jnp.asarray(idx_np)

    @jax.jit
    def f(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((chunk, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    try:
        got = np.asarray(f(idx, table))
        want = np.asarray(table)[idx_np]
        err = float(np.abs(got - want).max())
        dt = timeit(f, idx, table)
        print(f"{name:28s} ok  err={err:.1e} "
              f"{chunk / dt / 1e6:.1f} M rows/s", flush=True)
        return True
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:110]}",
              flush=True)
        return False


def main():
    print(jax.devices(), flush=True)

    def k_take_1d(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    def k_take_along(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)

    def k_fancy_2d(idx_ref, table_ref, out_ref):
        out_ref[:] = table_ref[:][idx_ref[:],
                                  jax.lax.broadcasted_iota(
                                      jnp.int32, (idx_ref.shape[0], LANES),
                                      1)]

    run("take axis=0, idx 1-D", k_take_1d)
    run("take_along_axis, idx 2-D", k_take_along, idx_shape="2d")
    run("fancy [idx2d, iota]", k_fancy_2d, idx_shape="2d")
    # bigger, to see a real rate if anything works
    run("take_along big (64K rows)", k_take_along, n_rows=65536,
        chunk=32768, idx_shape="2d")


if __name__ == "__main__":
    main()
