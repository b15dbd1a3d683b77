"""associative_scan IIR prefilter (large-axis path) vs the matrix path.

The dense filter-matrix matmul is the default; axes past the
``ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN`` gate (8192) switch to an
O(log n)-depth ``lax.associative_scan`` with identical mathematics
(reference recursion deform.c:1087-1115, mirror boundary inits). These
tests drive the scan path directly (no gate) and end-to-end with the
gate lowered.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed
from elasticdeform_tpu.ops import prefilter as pf


@pytest.fixture
def rng(request):
    import hashlib
    seed = int(hashlib.sha256(request.node.nodeid.encode()).hexdigest()[:8],
               16)
    return np.random.default_rng(seed)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
@pytest.mark.parametrize("shape,axis", [((200,), 0), ((57, 301), 1),
                                        ((300, 7), 0)])
def test_scan_matches_oracle(order, shape, axis, rng):
    x = rng.standard_normal(shape)
    want = pf.spline_filter1d_np(x, order, axis)
    got = np.asarray(pf._apply_scan(jnp.asarray(x), order, axis))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("order", [2, 3, 5])
def test_scan_matches_matrix_path(order, rng):
    x = jnp.asarray(rng.standard_normal((220, 5)))
    a = pf._apply_scan(x, order, 0)
    b = pf._apply_matrix(x, pf.filter_matrix(220, order), 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("order", [2, 3, 4, 5])
def test_scan_transpose_adjoint_identity(order, rng):
    u = jnp.asarray(rng.standard_normal((180, 4)))
    v = jnp.asarray(rng.standard_normal((180, 4)))
    lhs = float(jnp.vdot(u, pf._apply_scan(v, order, 0)))
    rhs = float(jnp.vdot(pf._apply_scan_transpose(u, order, 0), v))
    assert abs(lhs - rhs) <= 1e-12 * max(1.0, abs(lhs))


def test_scan_transpose_matches_matrix_transpose(rng):
    x = jnp.asarray(rng.standard_normal((260,)))
    a = pf._apply_scan_transpose(x, 3, 0)
    b = pf._apply_matrix(x, pf.filter_matrix(260, 3).T, 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12)


def test_use_scan_filter_gate(monkeypatch):
    assert not pf.use_scan_filter(4096, 3)
    assert pf.use_scan_filter(8192, 3)
    assert not pf.use_scan_filter(8192, 1)   # no prefilter below order 2
    monkeypatch.setenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "100")
    assert pf.use_scan_filter(128, 2)
    monkeypatch.setenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "0")
    assert not pf.use_scan_filter(1 << 20, 3)


@pytest.mark.parametrize("order,mode", [(3, 'mirror'), (2, 'constant'),
                                        (5, 'reflect')])
def test_end_to_end_scan_gate_matches_default(order, mode, monkeypatch, rng):
    """deform_grid / deform_grid_gradient with the scan gate lowered so
    one axis (250) runs the scan prefilter and the other (40) keeps the
    matrix path — results must match the all-matrix default."""
    from elasticdeform_tpu import api as _api

    def clear():
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
        _api._jitted_gradient.cache_clear()

    X = rng.random((250, 40))
    d = rng.standard_normal((2, 3, 3)) * 6
    gy = rng.random((250, 40))
    kw = dict(order=order, mode=mode)
    a = ed.deform_grid(X, d, **kw)
    ga = ed.deform_grid_gradient(gy, d, **kw)
    monkeypatch.setenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "200")
    clear()
    try:
        assert pf.use_scan_filter(250, order) or order < 2
        b = ed.deform_grid(X, d, **kw)
        gb = ed.deform_grid_gradient(gy, d, **kw)
    finally:
        monkeypatch.delenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN")
        clear()
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(ga, gb, rtol=1e-9, atol=1e-9)


def test_end_to_end_scan_gate_grad_vjp(monkeypatch, rng):
    """jax.grad through the core API with the scan prefilter active:
    finite-difference check (the custom_vjp backward must route through
    the scan transpose consistently)."""
    from elasticdeform_tpu import api as _api
    monkeypatch.setenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "200")
    jax.clear_caches()
    _api._jitted_forward.cache_clear()
    _api._jitted_gradient.cache_clear()
    try:
        X = jnp.asarray(rng.random((230, 30)))
        d = jnp.asarray(rng.standard_normal((2, 3, 3)) * 4)
        w = jnp.asarray(rng.random((230, 30)))

        def loss(x):
            return jnp.vdot(w, ed.deform(x, d, order=3, mode='mirror'))

        g = jax.grad(loss)(X)
        e = 1e-6
        probe = jnp.zeros_like(X).at[17, 11].set(1.0)
        fd = (loss(X + e * probe) - loss(X - e * probe)) / (2 * e)
        assert abs(float(g[17, 11]) - float(fd)) < 1e-6
    finally:
        jax.clear_caches()
        _api._jitted_forward.cache_clear()
        _api._jitted_gradient.cache_clear()


def test_scan_gate_respects_horizon(monkeypatch):
    """A lowered SCAN_MIN must not push an axis shorter than the pole
    horizon into the scan path (the truncated-horizon inits need
    n > horizon); the matrix path serves short axes at any gate."""
    monkeypatch.setenv("ELASTICDEFORM_TPU_PREFILTER_SCAN_MIN", "8")
    assert not pf.use_scan_filter(40, 5)   # horizon 42
    assert not pf.use_scan_filter(20, 3)   # horizon 27
    assert pf.use_scan_filter(64, 3)
    # end-to-end: short order-5 axis with the gate lowered still works
    rng = np.random.default_rng(77)
    X = rng.random((40, 30))
    d = rng.standard_normal((2, 3, 3)) * 3
    jax.clear_caches()
    try:
        out = ed.deform(jnp.asarray(X), jnp.asarray(d), order=5,
                        mode='mirror')
        assert np.isfinite(np.asarray(out)).all()
    finally:
        jax.clear_caches()
