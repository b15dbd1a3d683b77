"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

The conformance suite runs on CPU in float64 so results can be compared to
the scipy oracle at tight tolerances (the reference compares at rtol=1e-05,
atol=1e-08, reference tests/test_deform_grid.py:365). Multi-chip sharding
tests use the 8 virtual host devices.
"""

import os

# force CPU: the ambient environment may select a TPU backend
# (JAX_PLATFORMS=axon); the conformance suite needs real float64
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the env var alone is not enough: the environment may prepend its own
# platform to jax_platforms at import time — override the config directly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the conformance matrix compiles many small
# programs; caching makes repeated suite runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
