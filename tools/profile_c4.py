"""Stage profile of the single-sample 64^3 fwd+grad (bench c4) on TPU.

    python tools/profile_c4.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import elasticdeform_tpu as ed                                # noqa: E402


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.sum(a)), out)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((64, 64, 64), dtype=np.float32))
    d = jnp.asarray(
        rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 15)
    t = jnp.asarray(rng.random((64, 64, 64), dtype=np.float32))
    gy = jnp.asarray(rng.random((64, 64, 64), dtype=np.float32))

    fwd = jax.jit(lambda x, d: ed.deform(x, d, order=3, mode='mirror'))
    print(f"fwd only    : {timeit(fwd, x, d)*1e3:7.2f} ms", flush=True)

    @jax.jit
    def pair(x, d, gy):
        y, vjp = jax.vjp(
            lambda x_: ed.deform(x_, d, order=3, mode='mirror'), x)
        return y, vjp(gy)[0]

    print(f"fwd+bwd pair: {timeit(pair, x, d, gy)*1e3:7.2f} ms", flush=True)

    @jax.jit
    def train(x, d, t):
        def loss_fn(x):
            y = ed.deform(x, d, order=3, mode='mirror')
            return jnp.mean((y - t) ** 2)
        loss, gx = jax.value_and_grad(loss_fn)(x)
        return loss, jnp.sum(gx)

    print(f"train step  : {timeit(train, x, d, t)*1e3:7.2f} ms", flush=True)

    grad_only = jax.jit(lambda gy, d: ed.deform_gradient(
        gy, d, order=3, mode='mirror', X_shape=(64, 64, 64)))
    print(f"grad entry  : {timeit(grad_only, gy, d)*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
