"""Batching and multi-device sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import elasticdeform_tpu as ed
from elasticdeform_tpu.parallel import (
    batched_deform, batched_random_deform, sharded_deform,
    make_augmentation_mesh, AugmentationPipeline,
)

RNG = np.random.default_rng(77)


def test_vmap_matches_loop():
    batch = 3
    X = jnp.asarray(RNG.random((batch, 20, 18)))
    D = jnp.asarray(RNG.standard_normal((batch, 2, 3, 3)) * 5)
    out = batched_deform(X, D, order=3, mode='mirror')
    for b in range(batch):
        ref = ed.deform(X[b], D[b], order=3, mode='mirror')
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("order", [0, 1, 3])
def test_native_batch_matches_vmap(order):
    batch = 3
    X = jnp.asarray(RNG.random((batch, 12, 14, 10)))
    D = jnp.asarray(RNG.standard_normal((batch, 3, 3, 3, 3)) * 4)
    a = ed.deform_batch(X, D, order=order, mode='mirror',
                        batch_impl='native')
    b = ed.deform_batch(X, D, order=order, mode='mirror', batch_impl='vmap')
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12)


def test_native_batch_crop_channels_affine():
    batch = 2
    X = jnp.asarray(RNG.random((batch, 3, 24, 20)))
    D = jnp.asarray(RNG.standard_normal((batch, 2, 3, 3)) * 4)
    kw = dict(axis=(1, 2), crop=(slice(4, 20), slice(2, 18)), rotate=10,
              zoom=1.1, cval=0.5)
    a = ed.deform_batch(X, D, batch_impl='native', **kw)
    b = ed.deform_batch(X, D, batch_impl='vmap', **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12)


def test_native_batch_gradient():
    batch = 2
    X = jnp.asarray(RNG.random((batch, 12, 10)))
    D = jnp.asarray(RNG.standard_normal((batch, 2, 3, 3)) * 2)

    def loss(x, impl):
        return jnp.sum(ed.deform_batch(x, D, order=3, mode='mirror',
                                       batch_impl=impl) ** 2)

    ga = jax.grad(lambda x: loss(x, 'native'))(X)
    gb = jax.grad(lambda x: loss(x, 'vmap'))(X)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-10, atol=1e-10)


def test_vmap_with_crop_and_channels():
    batch = 2
    X = jnp.asarray(RNG.random((batch, 3, 20, 18)))
    D = jnp.asarray(RNG.standard_normal((batch, 2, 3, 3)) * 5)
    out = batched_deform(X, D, order=1, axis=(1, 2),
                         crop=(slice(5, 15), slice(2, 12)))
    assert out.shape == (batch, 3, 10, 10)


def test_batched_random_deform():
    key = jax.random.PRNGKey(0)
    X = jnp.asarray(RNG.random((4, 16, 16)))
    out = batched_random_deform(key, X, sigma=3.0, points=3, order=1)
    assert out.shape == X.shape
    # different samples get different grids
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_sharded_matches_vmap():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_augmentation_mesh(jax.devices()[:8])
    batch = 16
    X = jnp.asarray(RNG.random((batch, 12, 12, 12), dtype=np.float64))
    D = jnp.asarray(RNG.standard_normal((batch, 3, 3, 3, 3)) * 3)
    ref = batched_deform(X, D, order=3, mode='mirror')
    out = sharded_deform(mesh, X, D, order=3, mode='mirror')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_sharded_gradient():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_augmentation_mesh(jax.devices()[:8])
    batch = 8
    X = jnp.asarray(RNG.random((batch, 10, 10)))
    D = jnp.asarray(RNG.standard_normal((batch, 2, 3, 3)) * 2)

    def loss(x):
        y = sharded_deform(mesh, x, D, order=3, mode='mirror')
        return jnp.sum(y ** 2)

    g = jax.grad(loss)(X)
    ref = jax.grad(lambda x: jnp.sum(
        batched_deform(x, D, order=3, mode='mirror') ** 2))(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_batched_displacement_grad_grouped(monkeypatch):
    """The displacement gradient must be identical when the backward
    scatter processes the batch in groups (regression: grouped d_cc used
    sample offsets into the full table instead of the group's slice)."""
    from elasticdeform_tpu.ops import windows

    batch = 4
    X = jnp.asarray(RNG.random((batch, 10, 12)))
    D = jnp.asarray(RNG.standard_normal((batch, 2, 3, 3)) * 2)

    def loss(d):
        return jnp.sum(ed.deform_batch(X, d, order=3, mode='mirror',
                                       batch_impl='native') ** 2)

    g_full = jax.grad(loss)(D)
    # force group size 1 (each sample's table sliced separately)
    monkeypatch.setattr(windows, "_bwd_group_bytes", lambda: 1)
    g_grouped = jax.grad(loss)(D)
    np.testing.assert_allclose(np.asarray(g_grouped), np.asarray(g_full),
                               rtol=1e-10, atol=1e-10)


def test_pipeline_streams():
    key = jax.random.PRNGKey(3)
    batches = [RNG.random((2, 12, 12)).astype(np.float32) for _ in range(3)]
    pipe = AugmentationPipeline(batches, key, sigma=3.0, points=3, order=1)
    outs = list(pipe)
    assert len(outs) == 3
    assert all(o.shape == (2, 12, 12) for o in outs)


def test_entry_points():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    mod.dryrun_multichip(8)


def test_dryrun_multichip_driver_env():
    """Run the dryrun in a subprocess WITHOUT conftest's platform pinning.

    Mirrors the driver environment: JAX_PLATFORMS unset, only
    --xla_force_host_platform_device_count=8 — the default backend may be
    a (possibly single-device, possibly broken) TPU, and the entry point
    must still select a usable 8-device mesh on its own.
    """
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import importlib.util; "
         "spec = importlib.util.spec_from_file_location("
         "'__graft_entry__', '__graft_entry__.py'); "
         "mod = importlib.util.module_from_spec(spec); "
         "spec.loader.exec_module(mod); "
         "mod.dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout


def test_deform_under_remat():
    """jax.checkpoint (remat) around the deformation must compose with the
    custom_vjp kernels and give identical gradients — the pattern training
    pipelines use to trade FLOPs for activation memory."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    X = jnp.asarray(rng.random((2, 12, 14)))
    D = jnp.asarray(rng.standard_normal((2, 2, 3, 3)) * 3)
    w = jnp.asarray(rng.random((2, 12, 14)))

    def loss(x, d):
        return jnp.vdot(w, ed.deform_batch(x, d, order=3, mode='mirror'))

    g_plain = jax.grad(loss, argnums=(0, 1))(X, D)
    g_remat = jax.grad(jax.checkpoint(loss), argnums=(0, 1))(X, D)
    for a, b in zip(g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)
