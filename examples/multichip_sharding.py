"""Example: multi-chip augmentation over a jax.sharding.Mesh.

Shows the three scale-out layouts (SURVEY.md parallelism checklist):

  1. data-parallel   — batch sharded over chips (sharded_deform)
  2. spatial         — one huge volume split across chips with halo
                       exchange over ICI (sharded_deform_spatial_nd)
  3. hybrid          — batch x spatial over a 2-D mesh
                       (sharded_deform_batched_spatial)

Runs anywhere: with fewer than 8 real chips it builds a virtual 8-device
CPU mesh (the same code drives real meshes — the shardings, ppermute halo
exchanges, and per-chip compute are identical).

Run (from the repo root): python examples/multichip_sharding.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _ensure_devices(n=8):
    """Default to a virtual n-device CPU mesh so the example runs anywhere.

    Set ELASTICDEFORM_EXAMPLE_REAL_MESH=1 on a real multi-chip host to run
    on the hardware mesh instead (the code is identical either way). The
    XLA flag must be set BEFORE the backend initializes — do not query
    jax.devices() first.
    """
    if not _os.environ.get("ELASTICDEFORM_EXAMPLE_REAL_MESH"):
        _os.environ["XLA_FLAGS"] = (
            _os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    return jax


jax = _ensure_devices(8)
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec   # noqa: E402

from elasticdeform_tpu.parallel import (                      # noqa: E402
    sharded_deform,
    sharded_deform_spatial_nd,
    sharded_deform_batched_spatial,
)


def data_parallel(devices):
    """Batch axis sharded over all chips; per-sample random grids."""
    mesh = Mesh(np.array(devices), ("batch",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 32, 32, 32), dtype=np.float32))
    d = jnp.asarray(
        rng.standard_normal((8, 3, 3, 3, 3)).astype(np.float32) * 5)
    y = sharded_deform(mesh, x, d, order=3, mode='mirror')
    print("data-parallel :", y.shape, "sharding:", y.sharding)


def spatial(devices):
    """ONE volume too large for a single chip, split 2x4 over two axes;
    halo slabs ride jax.lax.ppermute ring exchanges."""
    mesh = Mesh(np.array(devices).reshape(2, 4), ("sx", "sy"))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((96, 128, 48), dtype=np.float32))
    d = jnp.asarray(
        rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 3)
    y = sharded_deform_spatial_nd(
        mesh, x, d, axis_names=("sx", "sy"), max_displacement=4.0,
        order=3, mode='mirror')
    print("spatial 2x4   :", y.shape, "sharding:", y.sharding)


def hybrid(devices):
    """Batch x spatial over a 2-D mesh: 4-way data parallel, each sample
    additionally split over 2 chips along axis 0."""
    mesh = Mesh(np.array(devices).reshape(4, 2), ("batch", "shard"))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((4, 96, 32, 32), dtype=np.float32))
    d = jnp.asarray(
        rng.standard_normal((4, 3, 3, 3, 3)).astype(np.float32) * 4)
    y = sharded_deform_batched_spatial(
        mesh, x, d, batch_axis="batch", shard_axis="shard",
        max_displacement=4.0, order=3, mode='mirror')
    print("hybrid 4x2    :", y.shape, "sharding:", y.sharding)


if __name__ == "__main__":
    devices = jax.devices()[:8]
    print(f"{len(devices)} devices on {devices[0].platform}")
    data_parallel(devices)
    spatial(devices)
    hybrid(devices)
