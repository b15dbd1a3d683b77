"""Forward-vs-backward split of the flagship batched pair on the TPU.

Times (a) the jitted batched forward alone, (b) the fwd+grad pair, and
derives the backward as the difference. Run ALONE on the chip.

    python tools/profile_pair.py [batch] [size]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.parallel.sharding import batched_deform  # noqa: E402


def timeit(fn, args, n=5):
    out = fn(*args)
    for s in (out if isinstance(out, tuple) else (out,)):
        float(jnp.sum(s))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    for s in (out if isinstance(out, tuple) else (out,)):
        float(jnp.sum(s))
    return (time.perf_counter() - t0) / n


def main(batch=64, size=64, order=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, size, size, size), dtype=np.float32))
    d = jnp.asarray(rng.standard_normal((batch, 3, 3, 3, 3))
                    .astype(np.float32) * 15)
    gy = jnp.asarray(rng.random((batch, size, size, size), dtype=np.float32))
    n_out = batch * size ** 3

    fwd = jax.jit(lambda x, d: jnp.sum(
        batched_deform(x, d, order=order, mode='mirror')))
    dt_f = timeit(fwd, (x, d))
    print(f"forward only: {dt_f*1e3:7.1f} ms ({n_out/dt_f/1e6:.1f} Mvox/s)")

    @jax.jit
    def pair(x, d, gy):
        y, vjp = jax.vjp(
            lambda x_: batched_deform(x_, d, order=order, mode='mirror'), x)
        (gx,) = vjp(gy)
        return jnp.sum(y), jnp.sum(gx)

    dt_p = timeit(pair, (x, d, gy))
    print(f"fwd+grad    : {dt_p*1e3:7.1f} ms ({n_out/dt_p/1e6:.1f} Mvox/s)")
    print(f"derived bwd : {(dt_p-dt_f)*1e3:7.1f} ms")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:3]])
