"""Probe: the bf16 window-table fast-augmentation mode, on TPU.

Measures the c3-class single forward and the c5-class batched pair with
``table_dtype='bfloat16'`` vs the exact default, plus the relative error.

Run:  python tools/probe_fast.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import elasticdeform_tpu as ed                                # noqa: E402
from elasticdeform_tpu.core import deform_batch               # noqa: E402


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(float, out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.tree_util.tree_map(float, out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # c3-class: single 128^3 crop forward
    x = jnp.asarray(rng.random((128, 128, 128), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 15)
    crop = (slice(32, 96),) * 3

    f_exact = jax.jit(lambda x, d: jnp.sum(ed.deform(
        x, d, order=3, mode='mirror', crop=crop)))
    f_fast = jax.jit(lambda x, d: jnp.sum(ed.deform(
        x, d, order=3, mode='mirror', crop=crop, table_dtype='bfloat16')))
    te = timeit(f_exact, x, d)
    tf_ = timeit(f_fast, x, d)
    a = ed.deform(x, d, order=3, mode='mirror', crop=crop)
    b = ed.deform(x, d, order=3, mode='mirror', crop=crop,
                  table_dtype='bfloat16')
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"c3 single : exact {te*1e3:7.2f} ms  bf16 {tf_*1e3:7.2f} ms "
          f"({te/tf_:.2f}x)  maxerr {err:.2e}", flush=True)

    # c5-class: batched pair
    B = 64
    xb = jnp.asarray(rng.random((B, 64, 64, 64), dtype=np.float32))
    db = jnp.asarray(
        rng.standard_normal((B, 3, 3, 3, 3)).astype(np.float32) * 15)
    gy = jnp.asarray(rng.random((B, 64, 64, 64), dtype=np.float32))

    def pair(table_dtype):
        @jax.jit
        def f(x, d, g):
            y, vjp = jax.vjp(lambda x_: deform_batch(
                x_, d, order=3, mode='mirror',
                table_dtype=table_dtype), x)
            return jnp.sum(y), jnp.sum(vjp(g)[0])
        return f

    pe = pair(None)
    pf = pair('bfloat16')
    te = timeit(pe, xb, db, gy, n=3)
    tf_ = timeit(pf, xb, db, gy, n=3)
    mv_e = B * 64 ** 3 / te / 1e6
    mv_f = B * 64 ** 3 / tf_ / 1e6
    print(f"c5 pair   : exact {te*1e3:7.1f} ms ({mv_e:.1f} Mvox/s)  "
          f"bf16 {tf_*1e3:7.1f} ms ({mv_f:.1f} Mvox/s, {te/tf_:.2f}x)",
          flush=True)

    # batched forward only (augmentation serving shape)
    fe = jax.jit(lambda x, d: jnp.sum(deform_batch(
        x, d, order=3, mode='mirror')))
    ff = jax.jit(lambda x, d: jnp.sum(deform_batch(
        x, d, order=3, mode='mirror', table_dtype='bfloat16')))
    te = timeit(fe, xb, db, n=5)
    tf_ = timeit(ff, xb, db, n=5)
    print(f"c5 fwd    : exact {te*1e3:7.1f} ms "
          f"({B*64**3/te/1e6:.1f} Mvox/s)  bf16 {tf_*1e3:7.1f} ms "
          f"({B*64**3/tf_/1e6:.1f} Mvox/s, {te/tf_:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
