"""Resampling-strategy equivalence: windows fast path vs plain gather.

The window-gather path (ops/windows.py) must produce bit-near-identical
results to the per-tap gather path (ops/resample.py) for every supported
configuration — same taps, same weights, different memory layout.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed
from elasticdeform_tpu.ops.windows import window_plan

RNG = np.random.default_rng(2024)


@pytest.mark.parametrize("mode", ["nearest", "wrap", "reflect", "mirror",
                                  "constant"])
@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, 5])
def test_2d_equivalence(order, mode):
    X = RNG.random((40, 30))
    d = RNG.standard_normal((2, 3, 3)) * 8
    a = ed.deform_grid(X, d, order=order, mode=mode, strategy="gather")
    b = ed.deform_grid(X, d, order=order, mode=mode, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [0, 1, 3, 4, 5])
def test_3d_equivalence(order):
    X = RNG.random((18, 16, 14))
    d = RNG.standard_normal((3, 3, 3, 3)) * 5
    a = ed.deform_grid(X, d, order=order, strategy="gather")
    b = ed.deform_grid(X, d, order=order, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_1d_equivalence():
    X = RNG.random((50,))
    d = RNG.standard_normal((1, 4)) * 5
    a = ed.deform_grid(X, d, order=3, strategy="gather")
    b = ed.deform_grid(X, d, order=3, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_channels_crop_affine_equivalence():
    X = RNG.random((3, 40, 30))
    d = RNG.standard_normal((2, 3, 3)) * 8
    kw = dict(axis=(1, 2), crop=(slice(5, 30), slice(4, 20)),
              rotate=15, zoom=1.2)
    a = ed.deform_grid(X, d, strategy="gather", **kw)
    b = ed.deform_grid(X, d, strategy="windows", **kw)
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_gradient_equivalence():
    d = RNG.standard_normal((2, 3, 3)) * 8
    gy = RNG.random((40, 30))
    a = ed.deform_grid_gradient(gy, d, order=3, strategy="gather")
    b = ed.deform_grid_gradient(gy, d, order=3, strategy="windows")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_window_plan_constraints():
    for naxis in (1, 2, 3, 4):
        for order in range(6):
            plan = window_plan(naxis, order)
            assert plan is not None
            n_lead, widths, strides = plan
            assert n_lead + len(widths) == min(naxis, n_lead + len(widths))
            # stencil containment: width >= stride + order
            for w, s in zip(widths, strides):
                assert w >= s + order
            # 128 lanes exactly
            total = 1
            for w in widths:
                total *= w
            assert total == 128


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_plan555_equivalence(order, monkeypatch):
    """The (5,5,5)/(2,2,2) 3-D window geometry (ELASTICDEFORM_TPU_PLAN3D)
    is tap-for-tap identical to the default (4,4,8)/(1,1,5) plan."""
    rng = np.random.default_rng(99)
    X = rng.random((20, 18, 22))
    d = rng.standard_normal((3, 3, 3, 3)) * 3
    gy = rng.random((20, 18, 22))
    a = ed.deform_grid(X, d, order=order, mode='mirror')
    ga = ed.deform_grid_gradient(gy, d, order=order, mode='mirror')
    monkeypatch.setenv("ELASTICDEFORM_TPU_PLAN3D", "555")
    jax.clear_caches()
    # the numpy API's spec-keyed jit cache does not key on the env var;
    # clear it so the 555 plan actually retraces
    from elasticdeform_tpu import api as _api
    _api._jitted_forward.cache_clear()
    _api._jitted_gradient.cache_clear()
    try:
        b = ed.deform_grid(X, d, order=order, mode='mirror')
        gb = ed.deform_grid_gradient(gy, d, order=order, mode='mirror')
    finally:
        monkeypatch.delenv("ELASTICDEFORM_TPU_PLAN3D")
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
        _api._jitted_gradient.cache_clear()
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(ga, gb, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_plan888_equivalence(order, monkeypatch):
    """The 512-lane (8,8,8)/(5,5,5) 3-D geometry (big-volume auto plan)
    matches the default within f32 association noise: its forward uses
    the staged per-axis reduction, so taps sum in a different order
    (1e-6, far inside the 1e-5 reference-parity contract); the backward
    keeps the joint reduce and stays tap-for-tap."""
    rng = np.random.default_rng(96)
    X = rng.random((20, 18, 22))
    d = rng.standard_normal((3, 3, 3, 3)) * 3
    gy = rng.random((20, 18, 22))
    a = ed.deform_grid(X, d, order=order, mode='mirror')
    ga = ed.deform_grid_gradient(gy, d, order=order, mode='mirror')
    monkeypatch.setenv("ELASTICDEFORM_TPU_PLAN3D", "888")
    jax.clear_caches()
    from elasticdeform_tpu import api as _api
    _api._jitted_forward.cache_clear()
    _api._jitted_gradient.cache_clear()
    try:
        b = ed.deform_grid(X, d, order=order, mode='mirror')
        gb = ed.deform_grid_gradient(gy, d, order=order, mode='mirror')
    finally:
        monkeypatch.delenv("ELASTICDEFORM_TPU_PLAN3D")
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
        _api._jitted_gradient.cache_clear()
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(ga, gb, rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_plan2d_432_equivalence(order, monkeypatch):
    """The (4,32)/(1,29) 2-D window geometry (ELASTICDEFORM_TPU_PLAN2D=432)
    is tap-for-tap identical to the default (8,16)/(5,13) plan."""
    rng = np.random.default_rng(98)
    X = rng.random((36, 44))
    d = rng.standard_normal((2, 3, 3)) * 6
    gy = rng.random((36, 44))
    a = ed.deform_grid(X, d, order=order, mode='reflect')
    ga = ed.deform_grid_gradient(gy, d, order=order, mode='reflect')
    monkeypatch.setenv("ELASTICDEFORM_TPU_PLAN2D", "432")
    jax.clear_caches()
    from elasticdeform_tpu import api as _api
    _api._jitted_forward.cache_clear()
    _api._jitted_gradient.cache_clear()
    try:
        b = ed.deform_grid(X, d, order=order, mode='reflect')
        gb = ed.deform_grid_gradient(gy, d, order=order, mode='reflect')
    finally:
        monkeypatch.delenv("ELASTICDEFORM_TPU_PLAN2D")
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
        _api._jitted_gradient.cache_clear()
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(ga, gb, rtol=1e-12, atol=1e-12)


def test_chunk_unroll_equivalence(monkeypatch):
    """The unrolled chunk loop (small n_chunks) and the lax.map stream must
    agree exactly — same chunks, same kernels, different control flow."""
    from elasticdeform_tpu.ops import windows as W
    rng = np.random.default_rng(97)
    # > 2x _CHUNK_ROWS output voxels so chunking engages even for a single
    # sample (3 chunks at default)
    X = rng.random((350, 200)).astype(np.float32)
    d = (rng.standard_normal((2, 3, 3)) * 10).astype(np.float32)
    a = ed.deform_grid(X, d, order=3, mode='mirror')
    monkeypatch.setattr(W, "_UNROLL_CHUNKS", 0)
    jax.clear_caches()
    from elasticdeform_tpu import api as _api
    _api._jitted_forward.cache_clear()
    try:
        b = ed.deform_grid(X, d, order=3, mode='mirror')
    finally:
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("plan", [((4, 4, 8), (1, 1, 5), 0, (2, (16, 18, 20))),
                                  ((4, 32), (1, 29), 0, (1, (20, 40))),
                                  ((128,), (125,), 0, (3, (140,)))])
def test_concat_build_bit_identical(plan, monkeypatch):
    """The copy-only table construction (ELASTICDEFORM_TPU_BUILD=concat)
    must produce the bit-identical table to the im2col conv build."""
    from elasticdeform_tpu.ops import windows as W
    widths, strides, n_lead, (B, size) = plan
    rng = np.random.default_rng(7)
    pad = 2
    padded = tuple(s + 2 * pad + (widths[k - n_lead] if k >= n_lead else 0)
                   for k, s in enumerate(size))
    xp = jnp.asarray(rng.random((B, *padded, 1)).astype(np.float32))
    assert W._concat_eligible(widths, strides, 1)
    monkeypatch.setenv("ELASTICDEFORM_TPU_BUILD", "conv")
    ref, dims_ref = W._build_table_impl(xp, widths, strides, n_lead, True)
    monkeypatch.setenv("ELASTICDEFORM_TPU_BUILD", "concat")
    got, dims = W._build_table_impl(xp, widths, strides, n_lead, True)
    assert dims == dims_ref
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("plan,C", [(((8, 16), (5, 13), 0, (1, (20, 40))), 1),
                                    (((8, 16), (5, 13), 0, (2, (24, 30))), 3),
                                    (((4, 32), (1, 29), 0, (1, (20, 40))), 1),
                                    (((4, 4, 8), (1, 1, 5), 0,
                                      (1, (14, 16, 18))), 1),
                                    (((8, 8, 8), (5, 5, 5), 0,
                                      (2, (14, 16, 18))), 2),
                                    (((4, 4), (1, 1), 1, (1, (6, 14, 16))),
                                     1)])
@pytest.mark.parametrize("split", [False, True])
def test_matmul_build_bit_identical(plan, C, split, monkeypatch):
    """The selection-matmul table construction (ELASTICDEFORM_TPU_BUILD=
    matmul) must produce the bit-identical table to the im2col conv build
    (both are exact element copies) — including through the bf16x3
    split path, whose parts survive the selection contractions exactly."""
    from elasticdeform_tpu.ops import windows as W
    widths, strides, n_lead, (B, size) = plan
    rng = np.random.default_rng(17)
    pad = 2
    padded = tuple(s + 2 * pad + (widths[k - n_lead] if k >= n_lead else 0)
                   for k, s in enumerate(size))
    xp = jnp.asarray(rng.random((B, *padded, C)).astype(np.float32))
    monkeypatch.setenv("ELASTICDEFORM_TPU_BUILD", "conv")
    ref, dims_ref = W._build_table_impl(xp, widths, strides, n_lead, True)
    monkeypatch.setenv("ELASTICDEFORM_TPU_BUILD", "matmul")
    if split:
        monkeypatch.setattr(W, "_BF16X3", "1")
    got, dims = W._build_table_impl(xp, widths, strides, n_lead, True)
    assert dims == dims_ref
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("order,mode,prefilter",
                         [(3, 'mirror', True), (3, 'constant', True),
                          (0, 'reflect', True), (2, 'wrap', False),
                          (5, 'nearest', True)])
def test_fused_build_matches_staged(order, mode, prefilter, monkeypatch):
    """The fused prefilter+pad+expand build (default) must match the
    staged pipeline (ELASTICDEFORM_TPU_FUSE_BUILD=0): padding/expansion
    only select rows of the filter matrix, so each output is the same
    inner product. Forward and gradient, 2-D and 3-D."""
    from elasticdeform_tpu import api as _api

    def clear():
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
        _api._jitted_gradient.cache_clear()

    rng = np.random.default_rng(41)
    for shape, dgrid in [((30, 26), (2, 3, 3)), ((14, 16, 18), (3, 3, 3, 3))]:
        X = rng.random(shape)
        d = rng.standard_normal(dgrid) * 4
        gy = rng.random(shape)
        kw = dict(order=order, mode=mode, prefilter=prefilter)
        a = ed.deform_grid(X, d, **kw)
        ga = ed.deform_grid_gradient(gy, d, **kw)
        monkeypatch.setenv("ELASTICDEFORM_TPU_FUSE_BUILD", "0")
        clear()
        try:
            b = ed.deform_grid(X, d, **kw)
            gb = ed.deform_grid_gradient(gy, d, **kw)
        finally:
            monkeypatch.delenv("ELASTICDEFORM_TPU_FUSE_BUILD")
            clear()
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(ga, gb, rtol=1e-10, atol=1e-10)


def test_window_plan_size_aware_auto():
    """PLAN3D=auto: big single volumes whose default-plan table would
    exceed the VMEM gather-staging cap get the 512-lane low-expansion
    plan; small volumes keep (4,4,8). Callers without a size keep the
    default (their padding must agree with downstream params)."""
    assert window_plan(3, 3, (64, 64, 64)) == (0, (4, 4, 8), (1, 1, 5))
    assert window_plan(3, 3, (128, 128, 128)) == (0, (8, 8, 8), (5, 5, 5))
    assert window_plan(3, 3) == (0, (4, 4, 8), (1, 1, 5))
    # order > 3 keeps the lead-loop plan regardless of size
    assert window_plan(3, 4, (128, 128, 128))[0] == 1
    # 4-D: plan decided by the trailing three axes' extent
    assert window_plan(4, 3, (2, 128, 128, 128))[1] == (8, 8, 8)
