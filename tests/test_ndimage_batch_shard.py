"""Batched (vmap) and mesh-sharded coverage for the scipy.ndimage
parity tier (VERDICT r4 task 7).

The deform tier is vmap/shard_map-transparent with dedicated tests
(tests/test_batch.py, tests/test_spatial.py); this file proves the same
for the filter / morphology / distance / measurements tier:

* ``vmap`` over a batch equals the stacked per-sample results, bitwise
  (the ops are built from static pads, slices, reduce_windows, matmuls
  and scans — all batchable primitives).
* Under a ``jax.sharding.Mesh``, batch-sharded AND spatially-sharded
  inputs produce results equal to the unsharded run: the fold-index
  pads (``jnp.take`` with static indices) and stencil slices are
  plain XLA ops inside one jit program, so GSPMD inserts the halo
  collectives itself — no library code special-cases sharding.

Runs on the suite's 8 virtual CPU devices (tests/conftest.py); the
driver's ``__graft_entry__.dryrun_multichip`` executes the same
filter-tier sharding check on an N-device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import elasticdeform_tpu as ed
from elasticdeform_tpu import measure


@pytest.fixture
def rng():
    return np.random.default_rng(7)


BATCH_OPS = [
    ("gaussian_filter", lambda x: ed.gaussian_filter(x, 1.5)),
    ("correlate", lambda x: ed.correlate(
        x, np.arange(27.0).reshape(3, 3, 3) / 27.0, mode="nearest")),
    ("uniform_filter", lambda x: ed.uniform_filter(x, 3, mode="wrap")),
    ("median_filter", lambda x: ed.median_filter(x, 3)),
    ("minimum_filter", lambda x: ed.minimum_filter(x, (3, 1, 3))),
    ("grey_dilation", lambda x: ed.grey_dilation(x, size=(3, 3, 3))),
    ("binary_erosion", lambda x: ed.binary_erosion(x > 0.2)),
    ("binary_fill_holes", lambda x: ed.binary_fill_holes(x > 0.0)),
    ("distance_transform_edt", lambda x: ed.distance_transform_edt(
        x > -0.3)),
    ("label_roots", lambda x: measure.label_roots(x > 0.3)),
]


def _assert_same(out, ref):
    """Bitwise for bool/int results; 1e-12 allclose for float (XLA may
    legitimately reassociate matmul/window reductions when batching or
    partitioning — that's float round-off, not a semantics change)."""
    out, ref = np.asarray(out), np.asarray(ref)
    if out.dtype.kind in "biu":
        np.testing.assert_array_equal(out, ref)
    else:
        np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize("name,f", BATCH_OPS, ids=[t[0] for t in BATCH_OPS])
def test_vmap_equals_stacked(name, f, rng):
    xb = jnp.asarray(rng.standard_normal((4, 12, 13, 14)))
    batched = jax.jit(jax.vmap(f))(xb)
    single = jnp.stack([f(xb[i]) for i in range(xb.shape[0])])
    _assert_same(batched, single)


SHARD_OPS = [
    ("gaussian_filter", lambda x: ed.gaussian_filter(x, 2.0)),
    ("correlate", lambda x: ed.correlate(
        x, np.arange(27.0).reshape(3, 3, 3) / 27.0)),
    ("median_filter", lambda x: ed.median_filter(x, 3)),
    ("binary_erosion", lambda x: ed.binary_erosion(x > 0.2)),
    ("distance_transform_edt", lambda x: ed.distance_transform_edt(
        x > -0.3)),
]


def _check_sharded(f, x, spec, mesh):
    ref = np.asarray(jax.jit(f)(x))
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    out = np.asarray(jax.jit(f)(xs))
    _assert_same(out, ref)


@pytest.mark.parametrize("name,f", SHARD_OPS, ids=[t[0] for t in SHARD_OPS])
def test_batch_sharded_equals_unsharded(name, f, rng):
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    xb = jnp.asarray(rng.standard_normal((8, 10, 11, 12)))
    _check_sharded(jax.vmap(f), xb, P("dp"), mesh)


@pytest.mark.parametrize("name,f", SHARD_OPS, ids=[t[0] for t in SHARD_OPS])
def test_spatially_sharded_equals_unsharded(name, f, rng):
    # shard the leading *spatial* axis: GSPMD must materialize stencil
    # halos / fold pads across shard boundaries by itself
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    x = jnp.asarray(rng.standard_normal((16, 11, 12)))
    _check_sharded(f, x, P("sp"), mesh)


def test_hybrid_mesh_filter(rng):
    # 2-D mesh: batch axis x spatial axis simultaneously
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    xb = jnp.asarray(rng.standard_normal((4, 16, 9, 10)))
    f = jax.vmap(lambda a: ed.gaussian_filter(a, 1.0))
    _check_sharded(f, xb, P("dp", "sp"), mesh)


def test_sharded_measurements(rng):
    # segment reductions under a batch-sharded label volume
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    x = jnp.asarray(rng.standard_normal((8, 10, 11)))
    lab = (np.asarray(x) > 0.0).astype(np.int32)

    def f(x):
        # index is static by design (it fixes the output shape, like
        # scipy's): keep it a numpy array under jit
        return ed.sum_labels(x, jnp.asarray(lab), index=np.array([0, 1]))

    ref = np.asarray(jax.jit(f)(x))
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    np.testing.assert_allclose(np.asarray(jax.jit(f)(xs)), ref,
                               rtol=1e-12, atol=1e-12)
