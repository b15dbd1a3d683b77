"""Benchmarks for the five BASELINE.json configs on one TPU chip.

Default run prints ONE JSON line (the driver contract) — the headline
config 5 metric:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``python bench.py --all`` measures all five configs, prints one JSON line
per config (headline last), and writes ``bench_results.json`` — the README
performance table is regenerated from that file.

``vs_baseline`` compares against the reference C implementation measured
on this machine's CPU (BASELINE_MEASURED.json; the reference publishes no
numbers, see BASELINE.md).

Timing notes: ``block_until_ready`` does not synchronize over remote TPU
tunnels, so every timed region is synchronized by fetching a scalar
reduction of the results (the reduction depends on every output element).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = int(os.environ.get("BENCH_ITERS", "10"))

# small configs need enough queued calls to amortize the per-call dispatch
# latency of the remote tunnel (~5 ms), else the number measures the RPC
# path instead of the chip: size iterations so >= ~4 Mvox are timed
_MIN_TIMED_VOXELS = 4_000_000


def _iters(voxels_per_call):
    return max(ITERS, -(-_MIN_TIMED_VOXELS // voxels_per_call))

# reference C on this machine's CPU (BASELINE_MEASURED.json)
BASELINES = {
    "c1": 4.039,     # 2D 200x300 order-3 mirror forward, Mvox/s
    "c2": 4.0418,    # multi-input mixed order forward, Mvox/s
    "c3": 0.8112,    # 3D 128^3 crop-64^3 order-3 forward, Mvox/s (output vox)
    "c4": 0.4913,    # 3D 64^3 order-3 fwd+grad train step, Mvox/s
    "c5": 0.4568,    # batched 64x 64^3 order-3 fwd+grad, Mvox/s
    # supplementary high-order / high-rank configs (VERDICT r3 task 4;
    # measured by tools/measure_reference_highorder.py)
    "c6": 0.0951,    # 3D 64^3 order-4 mirror forward, Mvox/s
    "c7": 0.137,     # 3D 64^3 order-5 mirror forward, Mvox/s
    "c8": 0.0336,    # 4D 24^4 order-3 mirror forward (naxis=4), Mvox/s
    # scipy.ndimage measured on this machine's CPU, 128^3 volumes
    # (BASELINE_NDIMAGE.json, tools/measure_scipy_ndimage.py; remeasured
    # 2026-08-19 20:0x UTC on an idle machine — the first sweep ran
    # while other work shared this box's single CPU and understated
    # scipy by up to 1.8x on EDT, overstating our ratios)
    "c9": 39.858,    # gaussian_filter sigma=2 f32
    "c10": 2.29,     # median_filter 3^3 f32
    "c11": 72.569,   # uniform_filter size=5 f32
    "c12": 12.015,   # correlate 5^3 kernel f32
    "c13": 55.59,    # binary_erosion, 50% random mask
    "c14": 36.065,   # binary_fill_holes, smooth blob mask
    "c15": 4.922,    # distance_transform_edt, 50% random mask
    "c16": 41.984,   # label, 50% random mask (scipy two-pass union-find)
    "c17": 131.816,  # label, smooth blob mask (scipy union-find)
    "c18": 18.077,   # affine_transform order-1
    "c19": 4.326,    # affine_transform order-3 (prefiltered)
    "c20": 14.519,   # map_coordinates order-1, dense coordinate field
}

RNG = np.random.default_rng(0)


# timing repeats: the remote tunnel and compile service are shared, so a
# single timed pass can absorb transient contention. Noise is strictly
# additive here, so the MIN over repeats is the estimator of the chip's
# actual rate (same policy as timeit).
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))


def _timeit(step, sync, voxels_per_call=_MIN_TIMED_VOXELS):
    """Warmup (compile), then REPEATS timed passes of n calls each,
    synchronized by fetching scalars; returns the fastest pass."""
    n = _iters(voxels_per_call)
    sync(step())
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(n):
            out = step()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best / n


def _sync_scalars(out):
    for s in (out if isinstance(out, tuple) else (out,)):
        float(s)


def _dispatch_floor_ms():
    """Median round-trip of a trivial jitted call + scalar fetch — the
    environment's per-call floor that every single_call_ms includes. On
    this remote-tunnel setup it has been measured anywhere from ~1 ms to
    ~32 ms between sessions; a local TPU host sees ~0.2-1 ms. Recorded in
    bench_results.json so the latency column can be read correctly."""
    f = jax.jit(lambda x: jnp.sum(x + 1.0))
    x = jnp.zeros(8, jnp.float32)
    float(f(x))
    ts = []
    for _ in range(15):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def _single_call_ms(step, sync):
    """Per-call wall latency of ONE jitted call, synchronized per call —
    the number an interactive (non-streaming) user experiences. Includes
    this environment's remote-tunnel dispatch + scalar-fetch round-trip
    (~1 ms floor), which the streamed throughput numbers amortize away;
    README publishes both. Median over BENCH_LATENCY_CALLS calls."""
    sync(step())  # compile + warm
    reps = int(os.environ.get("BENCH_LATENCY_CALLS", "30"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(step())
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


# Per-call dispatch through the remote TPU tunnel has a ~1 ms floor
# (measured: a trivial `x+1` jit sustains ~1.3 ms/call), which would
# dominate the sub-ms small configs. They are therefore measured as a
# device-sequential stream: lax.scan over K independent (image, grid)
# pairs inside one jit — identical per-image semantics (each scan step IS
# the single-image call), with the environment's dispatch floor amortized
# the same way the CPU baseline's timing loop amortizes Python overhead.
_STREAM_K = 64


def _stream(fwd_one, xs_list, ds):
    @jax.jit
    def fK(xs_list, ds):
        def body(carry, args):
            return carry, fwd_one(*args)
        _, outs = jax.lax.scan(body, 0.0, (*xs_list, ds))
        return jax.tree_util.tree_map(jnp.sum, outs)

    return fK, (xs_list, ds)


def bench_c1():
    """README example: 2D 200x300, random 3x3 grid, order-3, mirror."""
    import elasticdeform_tpu as ed

    K = _STREAM_K
    xs = jnp.asarray(RNG.random((K, 200, 300), dtype=np.float32))
    ds = jnp.asarray(
        RNG.standard_normal((K, 2, 3, 3)).astype(np.float32) * 25)

    def one(x, d):
        return jnp.sum(ed.deform(x, d, order=3, mode='mirror'))

    fK, args = _stream(one, (xs,), ds)
    dt = _timeit(lambda: fK(*args), _sync_scalars, xs.size) / K
    mvox = 200 * 300 / dt / 1e6
    f1 = jax.jit(one)
    ms = _single_call_ms(lambda: f1(xs[0], ds[0]), _sync_scalars)
    return {"metric": "2D 200x300 order-3 deform forward throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES["c1"], 2),
            "single_call_ms": round(ms, 2)}


def bench_c2():
    """Multi-input [RGB image, segmentation], mixed order=[3,0], axis."""
    import elasticdeform_tpu as ed

    K = _STREAM_K
    imgs = jnp.asarray(RNG.random((K, 3, 200, 300), dtype=np.float32))
    segs = jnp.asarray(RNG.random((K, 200, 300), dtype=np.float32))
    ds = jnp.asarray(
        RNG.standard_normal((K, 2, 3, 3)).astype(np.float32) * 25)

    def one(img, seg, d):
        a, b = ed.deform([img, seg], d, order=[3, 0],
                         axis=[(1, 2), (0, 1)], mode='mirror')
        return jnp.sum(a) + jnp.sum(b)

    fK, args = _stream(one, (imgs, segs), ds)
    vox_call = imgs[0].size + segs[0].size
    dt = _timeit(lambda: fK(*args), _sync_scalars, K * vox_call) / K
    mvox = vox_call / dt / 1e6
    f1 = jax.jit(one)
    ms = _single_call_ms(lambda: f1(imgs[0], segs[0], ds[0]), _sync_scalars)
    return {"metric": "multi-input mixed-order deform forward throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES["c2"], 2),
            "single_call_ms": round(ms, 2)}


def bench_c3():
    """3D 128^3 volume, crop to the central 64^3 window, order-3."""
    import elasticdeform_tpu as ed

    K = 4
    xs = jnp.asarray(RNG.random((K, 128, 128, 128), dtype=np.float32))
    ds = jnp.asarray(
        RNG.standard_normal((K, 3, 3, 3, 3)).astype(np.float32) * 15)
    crop = (slice(32, 96),) * 3

    def one(x, d):
        return jnp.sum(ed.deform(x, d, order=3, mode='mirror', crop=crop))

    fK, args = _stream(one, (xs,), ds)
    dt = _timeit(lambda: fK(*args), _sync_scalars, K * 64 ** 3) / K
    mvox = 64 ** 3 / dt / 1e6  # output voxels, like the CPU baseline
    f1 = jax.jit(one)
    ms = _single_call_ms(lambda: f1(xs[0], ds[0]), _sync_scalars)
    return {"metric": "3D 128^3 crop-64^3 order-3 deform forward throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES["c3"], 2),
            "single_call_ms": round(ms, 2)}


def bench_c4():
    """Differentiable layer: fwd+grad (custom adjoints) in a jitted step.

    Timed as a stream of K independent train steps (lax.scan), like a
    real training loop running steps back-to-back — each scan step IS
    the single train step; the tunnel's ~1 ms dispatch floor amortizes
    the same way the CPU baseline's timing loop amortizes Python."""
    import elasticdeform_tpu as ed

    K = 4
    xs = jnp.asarray(RNG.random((K, 64, 64, 64), dtype=np.float32))
    d = jnp.asarray(RNG.standard_normal((3, 3, 3, 3)).astype(np.float32) * 15)
    targets = jnp.asarray(RNG.random((K, 64, 64, 64), dtype=np.float32))

    def one(x, target):
        def loss_fn(x):
            y = ed.deform(x, d, order=3, mode='mirror')
            return jnp.mean((y - target) ** 2)
        loss, gx = jax.value_and_grad(loss_fn)(x)
        return loss, jnp.sum(gx)

    fK, args = _stream(one, (xs,), targets)
    dt = _timeit(lambda: fK(*args), _sync_scalars, xs.size) / K
    mvox = 64 ** 3 / dt / 1e6
    f1 = jax.jit(one)
    ms = _single_call_ms(lambda: f1(xs[0], targets[0]), _sync_scalars)
    return {"metric": "3D 64^3 order-3 deform fwd+grad train-step throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES["c4"], 2),
            "single_call_ms": round(ms, 2)}


def bench_c5():
    """Headline: batched 64x 64^3, per-sample grids, fwd+grad pair."""
    from elasticdeform_tpu.parallel.sharding import batched_deform

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    size = int(os.environ.get("BENCH_SIZE", "64"))
    points = 3

    x = jnp.asarray(RNG.random((batch, size, size, size), dtype=np.float32))
    d = jnp.asarray(RNG.standard_normal(
        (batch, 3, points, points, points)).astype(np.float32) * 15)
    gy = jnp.asarray(RNG.random((batch, size, size, size), dtype=np.float32))

    def fwd(x, d):
        return batched_deform(x, d, order=3, mode='mirror')

    @jax.jit
    def fwd_grad(x, d, gy):
        y, vjp = jax.vjp(lambda x_: fwd(x_, d), x)
        (gx,) = vjp(gy)
        return jnp.sum(y), jnp.sum(gx)

    dt = _timeit(lambda: fwd_grad(x, d, gy), _sync_scalars,
                 batch * size ** 3)
    mvox = batch * size ** 3 / dt / 1e6
    return {"metric": "batched 3D order-3 deform fwd+grad throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES["c5"], 2)}


def _bench_order_3d(order, key):
    """3D 64^3 high-order forward — exercises the n_lead tap-loop plan
    fallback (ops/windows.py) that order-3 plans never take."""
    import elasticdeform_tpu as ed

    K = 4
    xs = jnp.asarray(RNG.random((K, 64, 64, 64), dtype=np.float32))
    ds = jnp.asarray(
        RNG.standard_normal((K, 3, 3, 3, 3)).astype(np.float32) * 15)

    def one(x, d):
        return jnp.sum(ed.deform(x, d, order=order, mode='mirror'))

    fK, args = _stream(one, (xs,), ds)
    dt = _timeit(lambda: fK(*args), _sync_scalars, xs.size) / K
    mvox = 64 ** 3 / dt / 1e6
    f1 = jax.jit(one)
    ms = _single_call_ms(lambda: f1(xs[0], ds[0]), _sync_scalars)
    return {"metric": f"3D 64^3 order-{order} deform forward throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES[key], 2),
            "single_call_ms": round(ms, 2)}


def bench_c6():
    return _bench_order_3d(4, "c6")


def bench_c7():
    return _bench_order_3d(5, "c7")


def bench_c8():
    """4D 24^4 order-3 forward (naxis=4) — the high-rank plan path."""
    import elasticdeform_tpu as ed

    K = 4
    xs = jnp.asarray(RNG.random((K, 24, 24, 24, 24), dtype=np.float32))
    ds = jnp.asarray(
        RNG.standard_normal((K, 4, 3, 3, 3, 3)).astype(np.float32) * 6)

    def one(x, d):
        return jnp.sum(ed.deform(x, d, order=3, mode='mirror'))

    fK, args = _stream(one, (xs,), ds)
    dt = _timeit(lambda: fK(*args), _sync_scalars, xs.size) / K
    mvox = 24 ** 4 / dt / 1e6
    f1 = jax.jit(one)
    ms = _single_call_ms(lambda: f1(xs[0], ds[0]), _sync_scalars)
    return {"metric": "4D 24^4 order-3 deform forward throughput",
            "value": round(mvox, 2), "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES["c8"], 2),
            "single_call_ms": round(ms, 2)}


# ---------------------------------------------------------------------------
# scipy.ndimage tier (VERDICT r4 task 1): stream-timed like c1-c8, with
# scipy CPU baselines measured the same way (BASELINE_NDIMAGE.json)

_NDIMAGE_N = 128
_NDIMAGE_K = 8


def _bench_ndimage(key, metric, make_inputs, fn_one, K=_NDIMAGE_K):
    """Stream K independent 128^3 volumes through one jitted lax.scan
    (identical per-volume semantics; amortizes the tunnel dispatch floor
    exactly like c1-c8) and also record single-call latency."""
    xs = make_inputs(K)
    fK, args = _stream(fn_one, (xs,), jnp.zeros((K,), jnp.float32))
    voxels = _NDIMAGE_N ** 3
    dt = _timeit(lambda: fK(*args), _sync_scalars, K * voxels) / K
    mvox = voxels / dt / 1e6
    f1 = jax.jit(lambda x: fn_one(x, 0.0))
    ms = _single_call_ms(lambda: f1(xs[0]), _sync_scalars)
    return {"metric": metric, "value": round(mvox, 2),
            "unit": "Mvox/s/chip",
            "vs_baseline": round(mvox / BASELINES[key], 2),
            "single_call_ms": round(ms, 2)}


def _rand_vols(K):
    n = _NDIMAGE_N
    return jnp.asarray(RNG.random((K, n, n, n), dtype=np.float32))


def _rand_masks(K):
    n = _NDIMAGE_N
    return jnp.asarray(RNG.random((K, n, n, n)) < 0.5)


def _blob_masks(K):
    from scipy import ndimage as _ndi
    n = _NDIMAGE_N
    vols = RNG.standard_normal((K, n, n, n))
    return jnp.asarray(np.stack(
        [_ndi.gaussian_filter(v, 6.0) > 0.0 for v in vols]))


def bench_c9():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.gaussian_filter(x, 2.0))
    return _bench_ndimage("c9", "gaussian_filter 128^3 sigma=2 throughput",
                          _rand_vols, one)


def bench_c10():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.median_filter(x, 3))
    return _bench_ndimage("c10", "median_filter 128^3 3^3 throughput",
                          _rand_vols, one)


def bench_c11():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.uniform_filter(x, 5))
    return _bench_ndimage("c11", "uniform_filter 128^3 size-5 throughput",
                          _rand_vols, one)


def bench_c12():
    import elasticdeform_tpu as ed
    kern = jnp.asarray(RNG.random((5, 5, 5), dtype=np.float32))

    def one(x, _):
        return jnp.sum(ed.correlate(x, kern))
    return _bench_ndimage("c12", "correlate 128^3 5^3-kernel throughput",
                          _rand_vols, one)


def bench_c13():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.binary_erosion(x).astype(jnp.float32))
    return _bench_ndimage("c13", "binary_erosion 128^3 throughput",
                          _rand_masks, one)


def bench_c14():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.binary_fill_holes(x).astype(jnp.float32))
    return _bench_ndimage("c14", "binary_fill_holes 128^3 (fixpoint) "
                          "throughput", _blob_masks, one, K=4)


def bench_c15():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.distance_transform_edt(x))
    return _bench_ndimage("c15", "distance_transform_edt 128^3 throughput",
                          _rand_masks, one, K=4)


def bench_c16():
    from elasticdeform_tpu.measure import label_roots

    def one(x, _):
        return jnp.sum(label_roots(x).astype(jnp.float32))
    return _bench_ndimage("c16", "label (device roots) 128^3 50%-mask "
                          "throughput", _rand_masks, one, K=4)


def bench_c17():
    from elasticdeform_tpu.measure import label_roots

    def one(x, _):
        return jnp.sum(label_roots(x).astype(jnp.float32))
    return _bench_ndimage("c17", "label (device roots) 128^3 blob-mask "
                          "throughput", _blob_masks, one, K=4)


# resampler family (scipy conventions; the surface next to the deform
# tier — matrix/offset/coords match tools/measure_scipy_ndimage.py)

_AFFINE_MAT = np.array([[0.9, 0.05, 0.0], [0.0, 1.1, -0.05],
                        [0.02, 0.0, 0.95]])
_AFFINE_OFF = np.array([2.0, -1.5, 0.5])


def bench_c18():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.affine_transform(x, _AFFINE_MAT, _AFFINE_OFF,
                                           order=1))
    return _bench_ndimage("c18", "affine_transform 128^3 order-1 "
                          "throughput", _rand_vols, one)


def bench_c19():
    import elasticdeform_tpu as ed

    def one(x, _):
        return jnp.sum(ed.affine_transform(x, _AFFINE_MAT, _AFFINE_OFF,
                                           order=3))
    return _bench_ndimage("c19", "affine_transform 128^3 order-3 "
                          "(prefiltered) throughput", _rand_vols, one)


def bench_c20():
    import elasticdeform_tpu as ed
    n = _NDIMAGE_N
    coords = np.indices((n, n, n)).astype(np.float32)
    coords = jnp.asarray(
        coords + RNG.standard_normal(coords.shape).astype(np.float32) * 2)

    def one(x, _):
        return jnp.sum(ed.map_coordinates(x, coords, order=1))
    return _bench_ndimage("c20", "map_coordinates 128^3 dense-field "
                          "order-1 throughput", _rand_vols, one, K=4)


CONFIGS = {"c1": bench_c1, "c2": bench_c2, "c3": bench_c3,
           "c4": bench_c4, "c5": bench_c5,
           "c6": bench_c6, "c7": bench_c7, "c8": bench_c8,
           "c9": bench_c9, "c10": bench_c10, "c11": bench_c11,
           "c12": bench_c12, "c13": bench_c13, "c14": bench_c14,
           "c15": bench_c15, "c16": bench_c16, "c17": bench_c17,
           "c18": bench_c18, "c19": bench_c19, "c20": bench_c20}


DESCRIPTIONS = {
    "c1": ("2D 200x300 forward (README example)", "c1_2d_200x300"),
    "c2": ("multi-input [RGB, seg] mixed order fwd", "c2_multi_input"),
    "c3": ("3D 128^3 crop-64^3 forward", "c3_3d_128cube_crop64"),
    "c4": ("3D 64^3 fwd+grad train step", "c4_3d_64cube"),
    "c5": ("batch 64x 64^3 fwd+grad (headline)", "c5_batched"),
}

# supplementary (beyond the BASELINE.json five): high-order tap-loop and
# high-rank plan paths
DESCRIPTIONS_SUPP = {
    "c6": ("3D 64^3 order-4 forward", "c6_3d_order4"),
    "c7": ("3D 64^3 order-5 forward", "c7_3d_order5"),
    "c8": ("4D 24^4 order-3 forward (naxis=4)", "c8_4d"),
}

# scipy.ndimage tier, all on 128^3 volumes; baselines are scipy.ndimage
# measured on this machine's CPU (BASELINE_NDIMAGE.json)
DESCRIPTIONS_NDIMAGE = {
    "c9": ("gaussian_filter sigma=2", "c9_gaussian"),
    "c10": ("median_filter 3^3", "c10_median"),
    "c11": ("uniform_filter size-5", "c11_uniform"),
    "c12": ("correlate 5^3 kernel", "c12_correlate"),
    "c13": ("binary_erosion (50% mask)", "c13_binary_erosion"),
    "c14": ("binary_fill_holes (blob mask)", "c14_fill_holes"),
    "c15": ("distance_transform_edt (50% mask)", "c15_edt"),
    "c16": ("label device roots (50% mask)", "c16_label"),
    "c17": ("label device roots (blob mask)", "c17_label_blob"),
    "c18": ("affine_transform order-1", "c18_affine_o1"),
    "c19": ("affine_transform order-3", "c19_affine_o3"),
    "c20": ("map_coordinates dense order-1", "c20_mapcoords"),
}


def print_readme_table():
    """Emit the README performance tables from bench_results.json."""
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_results.json")) as f:
        results = json.load(f)

    def row(name, desc, r):
        lat = r.get("single_call_ms")
        lat = f"{lat:.1f} ms" if lat is not None else "—"
        # recompute the speedup from the CURRENT baseline constants so
        # the CPU column and the ratio always agree even after a
        # baseline re-measurement (the stored vs_baseline is the ratio
        # at measurement time)
        speedup = r["value"] / BASELINES[name]
        return (f"| {desc} | {BASELINES[name]:.2f} Mvox/s "
                f"| {r['value']:.2f} Mvox/s | {lat} "
                f"| {speedup:.1f}x |")

    header = ("| Config (mirror boundaries) | reference C (CPU) "
              "| this library, streamed (1x v5e) | single call | speedup |")
    print(header)
    print("|---|---|---|---|---|")
    for name, (desc, _) in DESCRIPTIONS.items():
        if name in results:
            print(row(name, desc, results[name]))
    supp = [n for n in DESCRIPTIONS_SUPP if n in results]
    if supp:
        print()
        print(header.replace("Config (mirror boundaries)",
                             "Supplementary config"))
        print("|---|---|---|---|---|")
        for name in supp:
            print(row(name, DESCRIPTIONS_SUPP[name][0], results[name]))
    ndi = [n for n in DESCRIPTIONS_NDIMAGE if n in results]
    if ndi:
        print()
        print(header.replace("Config (mirror boundaries)",
                             "scipy.ndimage tier (128^3)")
              .replace("reference C (CPU)", "scipy.ndimage (CPU)"))
        print("|---|---|---|---|---|")
        for name in ndi:
            print(row(name, DESCRIPTIONS_NDIMAGE[name][0], results[name]))
    floor = results.get("meta", {}).get("dispatch_floor_ms")
    if floor is not None:
        print()
        print(f"*Single-call latency includes the measurement "
              f"environment's per-call dispatch+fetch floor "
              f"({floor:.0f} ms through the remote-TPU tunnel used here; "
              "a directly-attached TPU host pays ~0.2-1 ms). Streamed "
              "throughput amortizes this floor, matching how training "
              "loops run steps back-to-back.*")


def main(argv):
    if "--readme" in argv:
        print_readme_table()
        return
    # Fail fast when the TPU tunnel is wedged: PJRT init then BLOCKS
    # ~25 min inside jax.devices() (holding jax's global backend lock)
    # instead of raising. Probe out-of-process with a deadline so a dead
    # tunnel yields a clear error instead of a silent multi-hour hang.
    from elasticdeform_tpu.runtime import probe_default_backend_info
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "120"))
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "5"))
    allow_cpu = os.environ.get("BENCH_ALLOW_CPU") == "1"
    for attempt in range(attempts):
        count, platform = probe_default_backend_info(timeout)
        if count > 0 and platform == "cpu" and not allow_cpu:
            # jax falls back to CPU with only a warning when the
            # accelerator plugin fails fast — those numbers must never be
            # recorded as chip results
            print("ERROR: default JAX backend resolved to CPU — refusing "
                  "to record CPU timings as chip results (set "
                  "BENCH_ALLOW_CPU=1 to override).",
                  file=sys.stderr, flush=True)
            raise SystemExit(2)
        if count > 0:
            break
        more = attempt + 1 < attempts
        print(f"bench: default backend not usable (probe {attempt + 1}/"
              f"{attempts} found no device within {timeout:.0f}s) — "
              "TPU tunnel down?" + (" retrying in 60s" if more else ""),
              file=sys.stderr, flush=True)
        if more:
            time.sleep(60)
    else:
        print("ERROR: default JAX backend unusable after "
              f"{attempts} probes — not benchmarking on a fallback "
              "backend; fix the device and re-run.",
              file=sys.stderr, flush=True)
        raise SystemExit(2)
    if "--all" in argv:
        names = [a for a in argv if a in CONFIGS] or list(CONFIGS)
        here = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(here, "bench_results.json")
        results = {}
        if os.path.exists(path):  # partial runs update, not clobber
            with open(path) as f:
                results = json.load(f)
        previous = dict(results)
        floor = round(_dispatch_floor_ms(), 2)
        results["meta"] = {"dispatch_floor_ms": floor,
                           "note": ("single_call_ms includes this per-call "
                                    "dispatch+fetch floor; streamed "
                                    "throughput amortizes it")}
        print(json.dumps({"config": "meta", "dispatch_floor_ms": floor}),
              flush=True)
        for name in names:
            results[name] = CONFIGS[name]()
            line = {"config": name, **results[name]}
            # perf regression guard: compare against the last recorded run
            prev = previous.get(name)
            if prev and results[name]["value"] < 0.9 * prev["value"]:
                line["regression_vs_prev"] = round(
                    results[name]["value"] / prev["value"], 3)
                print(f"WARNING: {name} regressed "
                      f"{prev['value']:.1f} -> {results[name]['value']:.1f} "
                      "Mvox/s (>10%)", file=sys.stderr, flush=True)
            print(json.dumps(line), flush=True)
        if previous:
            with open(os.path.join(here, "bench_results_prev.json"),
                      "w") as f:
                json.dump(previous, f, indent=2)
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
    elif any(a in CONFIGS for a in argv):
        for name in (a for a in argv if a in CONFIGS):
            print(json.dumps({"config": name, **CONFIGS[name]()}),
                  flush=True)
    else:
        # driver contract: exactly ONE JSON line, the headline metric
        print(json.dumps(bench_c5()))


if __name__ == "__main__":
    main(sys.argv[1:])
