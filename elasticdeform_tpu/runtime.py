"""Backend probing and device selection for hostile runtime environments.

The library itself is backend-agnostic (everything is jit-compatible JAX),
but the *entry points* — benchmark harnesses, driver dry runs, training
scripts — must survive environments where the default JAX backend is
present but broken. Two failure shapes have been observed on the remote
TPU tunnel this library targets:

* the backend enumerates devices and then raises at the first transfer
  (libtpu client/terminal version mismatch surfacing in ``device_put``);
* the backend *blocks*: a wedged tunnel makes PJRT initialization hang
  ~25 minutes inside ``jax.devices()`` before raising. try/except cannot
  catch a hang, and a watchdog thread cannot dodge it either, because
  ``jax._src.xla_bridge.backends()`` initializes EVERY registered
  platform under one global lock — a thread stuck initializing the TPU
  plugin blocks ``jax.devices("cpu")`` in the main thread too.

So the probe runs in a *subprocess* with a hard deadline: the child
inherits the environment, initializes the default backend, and performs
one scalar transfer. If the child fails or times out, the parent pins
``jax_platforms`` to ``cpu`` *before* any backend initialization of its
own, so the wedged plugin is never entered in-process.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

_PROBE_SRC = (
    "import jax, numpy as np\n"
    "d = jax.devices()\n"
    "x = jax.device_put(np.float32(0), d[0])\n"
    "x.block_until_ready()\n"
    "print('PROBE_OK', len(d), d[0].platform)\n"
)


def probe_default_backend_info(timeout: float | None = None):
    """Probe the default backend out-of-process: ``(device_count,
    platform)``, or ``(0, None)`` if unusable.

    Usability is established in a child process (same environment) that
    must enumerate devices AND complete one host->device transfer within
    ``timeout`` seconds (default: ``ELASTICDEFORM_TPU_PROBE_TIMEOUT`` or
    60). A hung child is killed; the parent never touches the broken
    backend. The platform lets callers that require an accelerator
    reject a silent CPU fallback (jax falls back with only a warning
    when the preferred plugin fails fast and ``JAX_PLATFORMS`` is
    unset).
    """
    if timeout is None:
        timeout = float(
            os.environ.get("ELASTICDEFORM_TPU_PROBE_TIMEOUT", "60"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout,
        )
    except (subprocess.TimeoutExpired, OSError):
        return 0, None
    if proc.returncode != 0:
        return 0, None
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            parts = line.split()
            try:
                return int(parts[1]), (parts[2] if len(parts) > 2 else None)
            except (IndexError, ValueError):
                return 0, None
    return 0, None


def probe_default_backend(timeout: float | None = None) -> int:
    """Device count of the usable default backend, or 0 (see
    :func:`probe_default_backend_info`)."""
    return probe_default_backend_info(timeout)[0]


def _pin_cpu_if_uninitialized() -> None:
    """Restrict jax to the CPU platform if no backend is initialized yet.

    After ``backends()`` has run the platform set is frozen — updating the
    config then is at best a no-op, so only touch it beforehand. Uses the
    private ``_backends`` dict because there is no public "is initialized"
    predicate; guarded so a jax-internals change degrades to doing nothing
    (the caller still works whenever the default backend is merely slow
    rather than wedged).
    """
    import jax

    try:
        from jax._src import xla_bridge as _xb
        if not _xb._backends:
            jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def usable_devices(n_devices: int, timeout: float | None = None):
    """Pick ``n_devices`` usable devices, preferring the default backend.

    Probes the default backend out-of-process (bounded by ``timeout``;
    see :func:`probe_default_backend`). When the probe fails — or the
    default backend has fewer than ``n_devices`` devices — falls back to
    the CPU backend, which honours
    ``XLA_FLAGS=--xla_force_host_platform_device_count=N`` virtual
    devices. Raises ``RuntimeError`` if no backend can supply enough
    devices.
    """
    import jax

    try:
        from jax._src import xla_bridge as _xb
        initialized = bool(_xb._backends)
    except Exception:
        initialized = False
    if initialized:
        # backends already up in-process: the init-time hang can no longer
        # occur, so probe directly (and cheaply) instead of forking
        try:
            devices = jax.devices()
            if len(devices) >= n_devices:
                p = jax.device_put(np.float32(0), devices[0])
                p.block_until_ready()
                return list(devices[:n_devices])
        except Exception:
            pass
        count = -1  # fall through to the CPU backend, no pinning
    else:
        count = probe_default_backend(timeout)
    if count >= n_devices:
        try:
            devices = jax.devices()
            if len(devices) >= n_devices:
                p = jax.device_put(np.float32(0), devices[0])
                p.block_until_ready()
                return list(devices[:n_devices])
        except Exception:
            pass
    elif count == 0:
        _pin_cpu_if_uninitialized()
    devices = jax.devices("cpu")
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(devices)} on the CPU "
            "backend; set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices}")
    return list(devices[:n_devices])
