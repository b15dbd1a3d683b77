"""Microbenchmark: row-gather strategies on the TPU.

Measures ns/row for several candidate replacements of the XLA row gather
(the measured ~100 M rows/s descriptor wall, see ROADMAP.md):

  xla        jnp.take rows from an HBM table (current fast path)
  pl_vmem    Pallas: fori_loop of dynamic slices from a VMEM-resident table
  pl_dg      Pallas: jnp.take inside the kernel (Mosaic dynamic_gather)
  pl_dma     Pallas: per-row async DMA HBM->VMEM, K semaphores in flight
  onehot     one-hot bf16 matmul gather from a VMEM-sized table block

Run:  python tools/probe_gather.py [names...]
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


def timeit(fn, sync, iters=20):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def sync(out):
    jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)).ravel()[0], out)


def make_data(n_rows, n_idx, seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.random((n_rows, LANES), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n_rows, size=n_idx).astype(np.int32))
    return table, idx


def probe_xla(n_rows=4 * 1024 * 1024, n_idx=1 << 20):
    table, idx = make_data(n_rows, n_idx)

    @jax.jit
    def f(table, idx):
        rows = jnp.take(table, idx, axis=0, mode="clip")
        return jnp.sum(rows)

    dt = timeit(lambda: f(table, idx), sync)
    return n_idx / dt / 1e6


def probe_xla_small(n_rows=8192, n_idx=1 << 20):
    return probe_xla(n_rows, n_idx)


def probe_pl_vmem(n_rows=8192, n_idx=1 << 20, chunk=8192):
    """Table resident in VMEM; per-row dynamic slice in a fori_loop."""
    table, idx = make_data(n_rows, n_idx)
    n_chunks = n_idx // chunk

    # simpler: all idx prefetched, chunk i reads slice
    def kernel2(idx_ref, table_ref, out_ref):
        i = pl.program_id(0)

        def body(k, acc):
            r = table_ref[pl.ds(idx_ref[i * chunk + k], 1), :]
            return acc + r

        acc = jax.lax.fori_loop(0, chunk, body,
                                jnp.zeros((1, LANES), jnp.float32))
        out_ref[:] = acc

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((n_rows, LANES), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, LANES), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def f2(idx, table):
        out = pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((n_chunks, LANES), jnp.float32),
            grid_spec=grid_spec2,
        )(idx, table)
        return jnp.sum(out)

    dt = timeit(lambda: f2(idx, table), sync)
    return n_idx / dt / 1e6


def probe_pl_dg(n_rows=8192, n_idx=1 << 20, chunk=8192):
    """jnp.take inside the kernel -> Mosaic dynamic_gather (was blocked)."""
    table, idx = make_data(n_rows, n_idx)
    n_chunks = n_idx // chunk

    def kernel(idx_ref, table_ref, out_ref):
        rows = jnp.take(table_ref[:], idx_ref[:], axis=0)
        out_ref[:] = rows

    @jax.jit
    def f(idx, table):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((chunk, LANES), jnp.float32),
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rows, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(idx, table)
        return jnp.sum(out)

    dt = timeit(lambda: f(idx, table), sync)
    return n_idx / dt / 1e6


def probe_pl_dma(n_rows=1 << 22, n_idx=1 << 18, chunk=4096, nsem=16):
    """Per-row DMA from an HBM table with nsem copies in flight."""
    table, idx = make_data(n_rows, n_idx)
    n_chunks = n_idx // chunk

    def kernel(idx_ref, table_hbm, out_ref, scratch, sems):
        i = pl.program_id(0)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                table_hbm.at[pl.ds(idx_ref[i * chunk + k], 1), :],
                scratch.at[pl.ds(slot, 1), :],
                sems.at[slot],
            )

        for s in range(nsem):
            get_dma(s, s).start()

        def body(k, acc):
            slot = jax.lax.rem(k, nsem)
            get_dma(slot, k).wait()
            acc = acc + scratch[pl.ds(slot, 1), :]

            @pl.when(k + nsem < chunk)
            def _():
                get_dma(slot, k + nsem).start()

            return acc

        acc = jax.lax.fori_loop(0, chunk, body,
                                jnp.zeros((1, LANES), jnp.float32))
        out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, LANES), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nsem, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nsem,)),
        ],
    )

    @jax.jit
    def f(idx, table):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_chunks, LANES), jnp.float32),
            grid_spec=grid_spec,
        )(idx, table)
        return jnp.sum(out)

    dt = timeit(lambda: f(idx, table), sync)
    return n_idx / dt / 1e6


def probe_onehot(n_rows=2048, n_idx=1 << 20, chunk=2048):
    """Gather via one-hot bf16 matmul from a small table block."""
    table, idx = make_data(n_rows, n_idx)
    n_chunks = n_idx // chunk

    @jax.jit
    def f(idx, table):
        tb = table.astype(jnp.bfloat16)

        def one(ic):
            oh = (ic[:, None] == jnp.arange(n_rows, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
            rows = jnp.dot(oh, tb, preferred_element_type=jnp.float32)
            return jnp.sum(rows)

        return jnp.sum(jax.lax.map(one, idx.reshape(n_chunks, chunk)))

    dt = timeit(lambda: f(idx, table), sync)
    return n_idx / dt / 1e6


PROBES = {
    "xla": probe_xla,
    "xla_small": probe_xla_small,
    "pl_vmem": probe_pl_vmem,
    "pl_dg": probe_pl_dg,
    "pl_dma": probe_pl_dma,
    "onehot": probe_onehot,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        try:
            rate = PROBES[name]()
            print(f"{name:10s} {rate:10.1f} M rows/s", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:10s} FAILED: {type(e).__name__}: {msg}", flush=True)
