"""Pallas row gather/scatter probes (v2) — see probe_gather.py.

  pl_loop_gather   fori_loop of per-row VMEM dynamic slices
  pl_dg            take_along_axis in-kernel (Mosaic dynamic_gather; was 500)
  pl_loop_scatter  fori_loop of per-row VMEM read-modify-writes
  xla_map_sample   jnp.take from a dynamically-sliced per-sample sub-table
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from probe_gather import timeit, sync, make_data, LANES  # noqa: E402


def probe_pl_loop_gather(n_rows=8192, n_idx=1 << 19, chunk=4096):
    table, idx = make_data(n_rows, n_idx)
    n_chunks = n_idx // chunk

    def kernel(idx_ref, table_ref, out_ref):
        i = pl.program_id(0)

        def body(k, _):
            out_ref[pl.ds(k, 1), :] = table_ref[
                pl.ds(idx_ref[i * chunk + k], 1), :]
            return 0

        jax.lax.fori_loop(0, chunk, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((n_rows, LANES), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, LANES), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f(idx, table):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(idx, table)
        return jnp.sum(out[:8])

    dt = timeit(lambda: f(idx, table), sync)
    return n_idx / dt / 1e6


def probe_pl_dg(n_rows=8192, n_idx=1 << 20, chunk=8192):
    table, idx = make_data(n_rows, n_idx)
    n_chunks = n_idx // chunk

    def kernel(idx_ref, table_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (chunk, LANES))
        out_ref[:] = jnp.take_along_axis(table_ref[:], idx2, axis=0)

    @jax.jit
    def f(idx, table):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx, LANES), jnp.float32),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rows, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, table)
        return jnp.sum(out[:8])

    dt = timeit(lambda: f(idx, table), sync)
    return n_idx / dt / 1e6


def probe_pl_loop_scatter(n_rows=8192, n_idx=1 << 19, chunk=4096):
    table, idx = make_data(n_rows, n_idx)
    vals = jnp.ones((n_idx, LANES), jnp.float32)
    n_chunks = n_idx // chunk

    def kernel(idx_ref, vals_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            r = pl.ds(idx_ref[i * chunk + k], 1)
            out_ref[r, :] = out_ref[r, :] + vals_ref[pl.ds(k, 1), :]
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
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(idx, vals)
        return jnp.sum(out[:8])

    dt = timeit(lambda: f(idx, vals), sync)
    return n_idx / dt / 1e6


def probe_xla_map_sample(nb=64, rps=65536, n_s=262144):
    """Per-sample gather: lax.map over samples, each slicing its sub-table."""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((nb * rps, LANES), dtype=np.float32))
    idx = jnp.asarray(
        rng.integers(0, rps, size=(nb, n_s)).astype(np.int32))

    @jax.jit
    def f(table, idx):
        def one(args):
            b, ib = args
            sub = jax.lax.dynamic_slice(
                table, (b * rps, 0), (rps, LANES))
            return jnp.sum(jnp.take(sub, ib, axis=0, mode="clip"))

        return jnp.sum(jax.lax.map(
            one, (jnp.arange(nb, dtype=jnp.int32), idx)))

    dt = timeit(lambda: f(table, idx), sync, iters=5)
    return nb * n_s / dt / 1e6


PROBES = {
    "pl_loop_gather": probe_pl_loop_gather,
    "pl_dg": probe_pl_dg,
    "pl_loop_scatter": probe_pl_loop_scatter,
    "xla_map_sample": probe_xla_map_sample,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        try:
            rate = PROBES[name]()
            print(f"{name:16s} {rate:10.1f} M rows/s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name:16s} FAILED: {type(e).__name__}: {msg}", flush=True)
