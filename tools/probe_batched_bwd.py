"""Probe: fastest route for the batched *backward-only* gradient.

The torch/tf batched shims call ``deform_batch_gradient`` with only
(dY, displacement) — no forward residuals. Two candidate routes:

  vmap      jax.vmap of the per-sample backward-only transpose pipeline
            (what core.deform_batch_gradient ships today)
  vjp       jit(jax.vjp(deform_batch)) applied to the cotangent: the
            native batched custom_vjp backward (batch folded into table
            rows, per-sample-group scatter) — pays whatever forward
            residual work XLA cannot DCE

Run on TPU:  python tools/probe_batched_bwd.py [B] [N]
CPU smoke:   python tools/probe_batched_bwd.py 2 16 --cpu
"""
import sys
import time

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import elasticdeform_tpu as ed  # noqa: E402

args = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(args[0]) if args else 64
N = int(args[1]) if len(args) > 1 else 64

rng = np.random.default_rng(0)
X = jnp.asarray(rng.random((B, N, N, N)), jnp.float32)
D = jnp.asarray(rng.standard_normal((B, 3, 3, 3, 3)) * 5, jnp.float32)
GY = jnp.asarray(rng.random((B, N, N, N)), jnp.float32)
kw = dict(order=3, mode='mirror')


def timeit(fn, *a, n=5):
    out = fn(*a)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def bwd_vmap(gy, d):
    return ed.deform_batch_gradient(gy, d, **kw)


@jax.jit
def bwd_vjp(x, gy, d):
    _, vjp = jax.vjp(lambda xx: ed.deform_batch(xx, d, **kw), x)
    (dx,) = vjp(gy)
    return dx


t1 = timeit(bwd_vmap, GY, D)
t2 = timeit(bwd_vjp, X, GY, D)
vox = B * N ** 3 / 1e6
print(f"B={B} N={N}  vmap-backward-only {t1*1e3:.1f} ms ({vox/t1:.1f} Mvox/s)")
print(f"B={B} N={N}  vjp-native-batched {t2*1e3:.1f} ms ({vox/t2:.1f} Mvox/s)")
a = np.asarray(bwd_vmap(GY, D))
b = np.asarray(bwd_vjp(X, GY, D))
print("max abs diff", float(np.abs(a - b).max()))
