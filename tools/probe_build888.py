"""Probe: where do the 888-plan build's ~3.5 ms go (c3 geometry)?

The (8,8,8)/(5,5,5) build on a 128^3 volume writes a 41 MB table; the
bandwidth floor is ~0.5 ms but the profiled stage is ~3.5 ms. This
times the REAL pipeline's sub-stages (bf16x3 split + selection
contractions + reconstruct + 8-D assembly transpose), a two-stage
transpose variant, and the dense filter-fused HIGHEST variant (which
would also absorb the separate 0.9 ms prefilter).

Run:  python tools/probe_build888.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.ops import windows as W


def timeit(fn, *args, n=20):
    float(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print(jax.devices(), flush=True)
    N = 128
    order, pad = 3, 2
    widths = (8, 8, 8)
    strides = (5, 5, 5)
    P = N + 2 * pad + 8                       # padded extent
    counts = [(P - w) // s + 1 for w, s in zip(widths, strides)]
    tw = sum(((counts[k], widths[k]) for k in range(3)), ())
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.random((P, P, P, 1), dtype=np.float32))

    Es = [jnp.asarray(W._expand_matrix(P, counts[k], widths[k], strides[k],
                                       "float32"), jnp.bfloat16)
          for k in range(3)]

    def contr_split(v):
        parts = W._split_bf16x3(v)
        t = jnp.stack(parts, axis=-1).reshape(1, P, P, P, 3)
        for k in range(3):
            t = jax.lax.dot_general(
                t, Es[k], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
        return t   # (1, 3, T1w1, T2w2, T3w3) bf16

    print(f"split+contr only  : "
          f"{timeit(jax.jit(lambda v: jnp.sum(contr_split(v).astype(jnp.float32))), xp)*1e3:7.2f} ms", flush=True)

    def recon(v):
        t = contr_split(v).reshape(1, 1, 3, *tw)
        return ((t[:, :, 0].astype(jnp.float32)
                 + t[:, :, 1].astype(jnp.float32))
                + t[:, :, 2].astype(jnp.float32))

    print(f"+ reconstruct     : "
          f"{timeit(jax.jit(lambda v: jnp.sum(recon(v))), xp)*1e3:7.2f} ms",
          flush=True)

    def full8d(v):
        t = recon(v)
        perm = (0,) + tuple(2 + 2 * k for k in range(3)) + (1,) \
            + tuple(3 + 2 * k for k in range(3))
        return jnp.sum(jnp.transpose(t, perm).reshape(-1, 512))

    print(f"+ 8-D transpose   : {timeit(jax.jit(full8d), xp)*1e3:7.2f} ms",
          flush=True)

    def two_stage(v):
        t = recon(v)[0, 0]                   # (T1w1, T2w2, T3w3)
        t = t.reshape(counts[0], widths[0], counts[1] * widths[1],
                      counts[2] * widths[2])
        t = jnp.transpose(t, (0, 2, 3, 1))   # (T1, T2w2, T3w3, w1)
        t = t.reshape(counts[0], counts[1], widths[1], counts[2],
                      widths[2], widths[0])
        t = jnp.transpose(t, (0, 1, 3, 5, 2, 4))
        return jnp.sum(t.reshape(-1, 512))

    print(f"+ two-stage transp: {timeit(jax.jit(two_stage), xp)*1e3:7.2f} ms",
          flush=True)

    # the shipping build end-to-end (selection build on padded input)
    def lib(v):
        table, _ = W._build_table_impl(v, widths, strides, 0, False)
        return jnp.sum(table)

    print(f"library (padded)  : {timeit(jax.jit(lib), xp)*1e3:7.2f} ms",
          flush=True)

    # dense filter-fused variant: raw input, HIGHEST 6-pass — absorbs the
    # separate prefilter matmuls (~0.9 ms) into the build
    xr = jnp.asarray(rng.random((N, N, N, 1), dtype=np.float32))

    def lib_fused(v):
        table, _ = W._build_table_impl(v, widths, strides, 0, False,
                                       (order, pad))
        return jnp.sum(table)

    print(f"dense fused (raw) : {timeit(jax.jit(lib_fused), xr)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
