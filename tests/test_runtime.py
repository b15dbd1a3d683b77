"""Backend probing / device selection (elasticdeform_tpu.runtime).

The hang-resilience path (wedged default backend -> subprocess probe
timeout -> CPU pinning) is exercised end-to-end by
tests/test_batch.py::test_dryrun_multichip_driver_env, which runs the
driver entry in a subprocess without conftest's platform pinning. These
tests cover the in-process fast path and the probe contract.
"""

import jax
import pytest

from elasticdeform_tpu import runtime


def test_usable_devices_in_process():
    # conftest initialized the CPU backend with 8 virtual devices; the
    # already-initialized fast path must return them without forking
    devices = runtime.usable_devices(8)
    assert len(devices) == 8
    assert all(d.platform == "cpu" for d in devices)


def test_usable_devices_too_many():
    with pytest.raises(RuntimeError, match="host_platform_device_count"):
        runtime.usable_devices(len(jax.devices("cpu")) + 1)


def test_probe_default_backend_subprocess(monkeypatch):
    # The probe child inherits os.environ. Make its default backend the
    # (always healthy) CPU: disable this environment's TPU-tunnel plugin
    # hook if present (it prepends itself to jax_platforms at interpreter
    # startup, so JAX_PLATFORMS=cpu alone would not keep a wedged tunnel
    # out of the child's backend init).
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    count = runtime.probe_default_backend(timeout=240)
    assert count >= 1


def test_probe_default_backend_timeout_kills_child():
    # a timeout that cannot possibly cover a python+jax startup must
    # report unusable (and must not raise or hang)
    assert runtime.probe_default_backend(timeout=0.01) == 0
