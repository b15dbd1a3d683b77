"""Probe: window-table construction — one-hot conv vs slice/concat.

The im2col grouped conv (current build) does pure data movement through
the MXU at 1/128 tap utilization (measured 31 ms for the 64x 64^3 batch
table, ~10x the ~3.5 ms bandwidth floor for its 2.8 GiB of traffic).

Alternative measured here ("concat" build): expand the minor axis's
overlapping windows by the stride-reshape trick —
``window(t) = x[s*t : s*t + w]`` is ``concat(chunks(x, s)[t],
chunks(shift(x, s), s)[t][:w-s])`` — then form the full 128-lane rows as
ONE concat of the 16 (u0, u1)-shifted views of the z-expanded volume.
Everything is an exact copy (no bf16x3 needed), and the only materialized
intermediates are lane-space concats.

Run:  python tools/probe_build.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from elasticdeform_tpu.ops import windows as W


def timeit(fn, *args, n=10):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def build_concat_3d(xp, widths, strides):
    """(B, P0, P1, P2, 1) -> (rows, 128) window table, copy-only.

    Requires strides (1, 1, s_z) (the default 3-D plan) and C == 1.
    """
    B, P0, P1, P2, C = xp.shape
    assert C == 1
    w0, w1, w2 = widths
    s2 = strides[2]
    assert strides[0] == strides[1] == 1
    T0 = P0 - w0 + 1
    T1 = P1 - w1 + 1
    T2 = (P2 - w2) // s2 + 1
    x = xp[..., 0]
    # size z to exactly (T2+1) stride-chunks: pad (values never read — the
    # last window ends at (T2-1)*s2 + w2 <= P2) or truncate the unused tail
    nchunk = T2 + 1
    padz = nchunk * s2 - P2
    if padz > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, padz)))
    elif padz < 0:
        x = x[..., :nchunk * s2]
    c1 = x.reshape(B, P0, P1, nchunk, s2)[:, :, :, :T2, :]
    c2 = x.reshape(B, P0, P1, nchunk, s2)[:, :, :, 1:T2 + 1, :w2 - s2]
    z = jnp.concatenate([c1, c2], axis=-1)          # (B, P0, P1, T2, w2)
    pieces = [z[:, u0:u0 + T0, u1:u1 + T1]
              for u0 in range(w0) for u1 in range(w1)]
    table = jnp.concatenate(pieces, axis=-1)        # (B, T0, T1, T2, 128)
    return table.reshape(B * T0 * T1 * T2, w0 * w1 * w2)


def main():
    import os
    rng = np.random.default_rng(0)
    for B, size in [(64, 64), (1, 128)]:
        pad = 2
        widths, strides = (4, 4, 8), (1, 1, 5)
        padded = tuple(size + 2 * pad + w for w in widths)
        xp = jnp.asarray(rng.random((B, *padded, 1), dtype=np.float32))

        # the build mode is read at trace time — force each side
        os.environ["ELASTICDEFORM_TPU_BUILD"] = "conv"
        conv = jax.jit(lambda x: W._build_table_impl(
            x, widths, strides, 0, True)[0])
        ref = conv(xp)          # traces with mode=conv
        t_conv = timeit(conv, xp)

        os.environ["ELASTICDEFORM_TPU_BUILD"] = "concat"
        cc = jax.jit(lambda x: W._build_table_impl(
            x, widths, strides, 0, True)[0])
        got = cc(xp)
        t_cc = timeit(cc, xp)
        del os.environ["ELASTICDEFORM_TPU_BUILD"]
        same = bool(jnp.array_equal(ref, got))
        print(f"B={B} size={size}: conv {t_conv*1e3:7.2f} ms | "
              f"concat {t_cc*1e3:7.2f} ms | bit-identical: {same}",
              flush=True)


if __name__ == "__main__":
    main()
