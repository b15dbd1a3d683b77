"""Probe: what does THIS toolchain's Pallas/Mosaic accept, and how fast?

Round 2 found dynamic-row addressing (in-kernel jnp.take, per-row dynamic
slices) failed with HTTP 500 through the remote-compile helper.  The
toolchain has since moved (jax 0.9.0; failures are now ordinary Mosaic
lowering errors), so re-probe from scratch:

  vmem{N}     how much VMEM scratch a kernel may allocate (N MiB)
  dynload     acc += table[pl.ds(idx[k],1),:] per-row dynamic-slice LOAD
  dynstore    acc[pl.ds(idx[k],1),:] += row    per-row dynamic-slice STORE
              (the scatter-accumulate primitive the backward needs)
  dyngather   jnp.take(table, idx, axis=0) in-kernel (Mosaic dynamic_gather)
  scatrate    end-to-end Pallas scatter-accumulate rate: grid over chunks,
              VMEM accumulator, fori_loop of dynamic-slice RMW stores

Run:  python tools/probe_pallas.py [names...]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def probe_vmem(mib):
    rows = mib * (1 << 20) // (LANES * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0:8, :] = x_ref[:]
        o_ref[:] = scratch[0:8, :]

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.float32)],
        )(x)

    x = jnp.ones((8, LANES), jnp.float32)
    np.asarray(f(x))
    return f"ok ({rows} rows)"


def probe_dynload():
    n_rows, n_idx = 8192, 65536
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n_rows, LANES), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, n_idx).astype(np.int32))

    def kernel(idx_ref, table_ref, out_ref):
        def body(k, acc):
            return acc + table_ref[pl.ds(idx_ref[k], 8), :]

        out_ref[:] = jax.lax.fori_loop(
            0, n_idx, body, jnp.zeros((8, LANES), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(idx, table)

    dt = timeit(f, idx, table)
    return f"{n_idx / dt / 1e6:.1f} M rows/s"


def probe_dynstore():
    n_rows, n_idx = 8192, 65536
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((n_idx, LANES), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows - 1, n_idx).astype(np.int32))

    def kernel(idx_ref, vals_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            r = idx_ref[k]
            out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(k, 1), :]
            return 0

        jax.lax.fori_loop(0, n_idx, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(idx, vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(idx, vals)

    dt = timeit(f, idx, vals)
    return f"{n_idx / dt / 1e6:.1f} M rows/s"


def probe_dyngather():
    n_rows, chunk = 1024, 1024
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n_rows, LANES), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, chunk).astype(np.int32))

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def f(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((chunk, LANES), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)

    dt = timeit(f, idx, table)
    return f"{chunk / dt / 1e6:.1f} M rows/s"


def probe_scatrate(n_rows=40960, n_idx=1 << 20, chunk=1 << 16):
    """Grid over idx chunks; accumulator block = full table in VMEM
    (revisited across grid steps), fori_loop RMW per row."""
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.random((n_idx, LANES), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, n_idx).astype(np.int32))
    n_chunks = n_idx // chunk

    def kernel(idx_ref, vals_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            out_ref[pl.ds(idx_ref[i * chunk + k], 1), :] += (
                vals_ref[pl.ds(k, 1), :])
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, LANES), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_rows, LANES), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(idx, vals):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(idx, vals)

    dt = timeit(f, idx, vals)
    return f"{n_idx / dt / 1e6:.1f} M rows/s"


PROBES = {
    "vmem16": lambda: probe_vmem(16),
    "vmem32": lambda: probe_vmem(32),
    "vmem64": lambda: probe_vmem(64),
    "vmem100": lambda: probe_vmem(100),
    "vmem120": lambda: probe_vmem(120),
    "dynload": probe_dynload,
    "dynstore": probe_dynstore,
    "dyngather": probe_dyngather,
    "scatrate": probe_scatrate,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        try:
            msg = PROBES[name]()
            print(f"{name:10s} {msg}", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:200]
            print(f"{name:10s} FAILED: {type(e).__name__}: {msg}", flush=True)
