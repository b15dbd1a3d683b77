"""f32 compute-path parity (subprocess: the main suite pins x64 on).

The conformance suite runs float64 on CPU; the TPU computes in float32.
This test proves the float32 path itself meets the 1e-5 parity contract
(BASELINE.json north star) against the float64 oracle by running
``f32_parity_check.py`` in a clean process with ``JAX_ENABLE_X64=0``.
"""

import os
import subprocess
import sys


def test_f32_parity_subprocess():
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "f32_parity_check.py")],
        cwd=os.path.dirname(here), env=env, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "F32_PARITY_OK" in proc.stdout
