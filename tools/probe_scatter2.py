"""Scatter probe at realistic batch scale (the r3 follow-up to probe_scatter).

Replicates the real backward structure: B per-sample groups, each scattering
n_out_s=64^3 rows (in 64K chunks) into its own 66654-row table, all inside
ONE jit — so the ~1 ms dispatch floor is amortized as in production.

Variants:
  base       dt.at[idx].add(vals)  per chunk            (current path)
  hint       same on pre-sorted idx + indices_are_sorted (sort not paid)
  bf16       values + accumulator in bf16 (claimed invariant)
  tile8      M/8 descriptors of (8,128) update windows — the ceiling IF
             8 voxel-rows could be combined per descriptor
  tile4/2    same at (4,128) / (2,128)
  wide512    M descriptors of 512-lane rows (claimed invariant to width)
  vchunk{N}  base with N-row chunks (262144 = whole sample in one op)
  elem       element-granular scatter (M*128 single-f32 descriptors) /8
             subsampled — the catastrophic baseline

Run:  python tools/probe_scatter2.py [B] [names...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128
N_ROWS = 66654          # per-sample table rows ((4,4,8)/(1,1,5) on 64^3)
N_OUT_S = 64 ** 3


def timeit(fn, *args, n=5):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def make_realistic_idx(B, seed=0):
    from scipy.ndimage import zoom as nd_zoom
    rng = np.random.default_rng(seed)
    n, pad, stride, sigma = 64, 2, 5, 15.0
    out = []
    for _ in range(B):
        disp = [nd_zoom(rng.standard_normal((3, 3, 3)) * sigma,
                        n / 3, order=1)[:n, :n, :n] for _ in range(3)]
        co = np.indices((n, n, n)).astype(np.float64)
        cc = [np.clip(co[h] + disp[h], 0, n - 1) for h in range(3)]
        i = [np.floor(c).astype(np.int64) - 1 + pad for c in cc]
        T0, T1 = 71, 71
        T2 = (64 + 2 * pad + 8 - 8) // stride + 1
        t0 = np.clip(i[0], 0, T0 - 1)
        t1 = np.clip(i[1], 0, T1 - 1)
        t2 = np.clip(i[2] // stride, 0, T2 - 1)
        out.append((t0 * (T1 * T2) + t1 * T2 + t2).astype(np.int32).ravel())
    return np.stack(out)


def run_groups(idx, vals, body, n_rows=N_ROWS, vchunk=65536, lanes=LANES,
               dtype=jnp.float32):
    """B sequential per-sample scatters, each chunked — the real shape."""
    B = idx.shape[0]
    tot = jnp.zeros((), dtype)
    for b in range(B):
        dt = jnp.zeros((n_rows, lanes), dtype)
        for v0 in range(0, idx.shape[1], vchunk):
            dt = body(dt, idx[b, v0:v0 + vchunk], vals[b, v0:v0 + vchunk])
        tot = tot + jnp.sum(dt)
    return tot


def probe_base(idx, vals, vchunk=65536):
    @jax.jit
    def f(idx, vals):
        return run_groups(idx, vals, lambda dt, i, v: dt.at[i].add(v),
                          vchunk=vchunk)
    return timeit(f, idx, vals)


def probe_hint(idx, vals):
    idx_s = jnp.sort(idx, axis=1)

    @jax.jit
    def f(idx, vals):
        return run_groups(
            idx, vals,
            lambda dt, i, v: dt.at[i].add(v, indices_are_sorted=True))
    return timeit(f, idx_s, vals)


def probe_bf16(idx, vals):
    vals16 = vals.astype(jnp.bfloat16)

    @jax.jit
    def f(idx, vals):
        return run_groups(idx, vals, lambda dt, i, v: dt.at[i].add(v),
                          dtype=jnp.bfloat16)
    return timeit(f, idx, vals16)


def probe_tile(idx, vals, sub):
    """M/sub descriptors of (sub,128) updates: ceiling for combining."""
    B, M = idx.shape
    nd = M // sub
    # one descriptor per SUB voxels; clamp so the (sub,128) window fits
    idx_t = jnp.minimum(idx[:, ::sub], N_ROWS - sub)
    vchunk = 65536 // sub

    @jax.jit
    def f(idx, vals):
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        tot = jnp.zeros((), jnp.float32)
        for b in range(B):
            dt = jnp.zeros((N_ROWS, LANES), jnp.float32)
            for v0 in range(0, nd, vchunk):
                i = idx[b, v0:v0 + vchunk]
                v3 = vals[b, v0 * sub:(v0 + vchunk) * sub].reshape(
                    -1, sub, LANES)
                dt = jax.lax.scatter_add(
                    dt, i[:, None], v3, dnums,
                    mode=jax.lax.GatherScatterMode.CLIP)
            tot = tot + jnp.sum(dt)
        return tot
    return timeit(f, idx_t, vals)


def probe_wide512(idx, vals):
    B, M = idx.shape
    idx_t = jnp.minimum(idx[:, ::4] // 1, (N_ROWS // 4) - 1)
    vals_w = vals.reshape(B, M // 4, 4 * LANES)

    @jax.jit
    def f(idx, vals):
        return run_groups(idx, vals, lambda dt, i, v: dt.at[i].add(v),
                          n_rows=N_ROWS // 4, lanes=4 * LANES)
    dt = timeit(f, idx_t, vals_w)
    return dt * 4  # normalize to per-(128-lane-row) time


def probe_vchunk(idx, vals, vc):
    return probe_base(idx, vals, vchunk=vc)


def main():
    args = sys.argv[1:]
    B = int(args[0]) if args and args[0].isdigit() else 16
    names = args[1:] if args and args[0].isdigit() else args
    idx = jnp.asarray(make_realistic_idx(B))
    # generate values on-device: the host->device tunnel is too slow for GBs
    vals = jax.jit(lambda k: jax.random.uniform(
        k, (B, N_OUT_S, LANES), jnp.float32))(jax.random.key(1))
    jax.block_until_ready(vals)
    M = B * N_OUT_S

    probes = {
        "base": lambda: probe_base(idx, vals),
        "hint": lambda: probe_hint(idx, vals),
        "bf16": lambda: probe_bf16(idx, vals),
        "tile2": lambda: probe_tile(idx, vals, 2) * 2,
        "tile4": lambda: probe_tile(idx, vals, 4) * 4,
        "tile8": lambda: probe_tile(idx, vals, 8) * 8,
        "wide512": lambda: probe_wide512(idx, vals),
        "vchunk131k": lambda: probe_vchunk(idx, vals, 131072),
        "vchunk262k": lambda: probe_vchunk(idx, vals, 262144),
        "vchunk32k": lambda: probe_vchunk(idx, vals, 32768),
    }
    names = names or list(probes)
    print(f"B={B}  M={M}", flush=True)
    for name in names:
        try:
            dt = probes[name]()
            # rates are per ORIGINAL voxel-row: tile probes already scaled
            print(f"{name:11s} {dt*1e3:8.1f} ms  {M/dt/1e6:8.1f} M rows/s",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name:11s} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
