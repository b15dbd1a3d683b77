#!/bin/bash
# Round-3, third session: run the full on-TPU validation + bench refresh
# the moment the tunnel recovers. Sequential — one TPU job at a time.
# Covers this session's changes: runtime probe (exercised implicitly),
# scan-prefilter gates (compute path; defaults unchanged at bench sizes),
# batched shims (route through the existing kernels).
set -x
cd /root/repo

# 1. drive the README + shim flows on the chip
python - <<'PYEOF'
import numpy as np, jax
print(jax.devices(), flush=True)
import elasticdeform_tpu as ed
X = np.random.rand(200, 300)
print("README flow ok", ed.deform_random_grid(X, sigma=25, points=3).shape, flush=True)
# batched torch shim (new this session)
import torch
import elasticdeform_tpu.torch as edt
x = torch.rand(4, 32, 32, dtype=torch.float64, requires_grad=True)
g = torch.randn(4, 2, 3, 3, dtype=torch.float64) * 4
y = edt.deform_batch(x, g, order=3, mode='mirror')
y.sum().backward()
print("torch batch shim ok", bool(torch.isfinite(x.grad).all()), flush=True)
# scan-prefilter path on-chip (gate lowered): parity vs matrix path
import os
import jax.numpy as jnp
from elasticdeform_tpu.ops import prefilter as pf
xx = jnp.asarray(np.random.rand(9000, 16).astype(np.float32))
a = np.asarray(pf._apply_scan(xx, 3, 0))
w = pf.spline_filter1d_np(np.asarray(xx), 3, 0)
print("scan prefilter on-chip max err", float(np.abs(a - w).max()), flush=True)
PYEOF

# 2. full parity sweep (must print PASS)
python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

# 3. bench refresh + persist stage breakdown
python bench.py --all
python tools/profile_stages.py > bench_artifacts/stages_r3s3.json 2>&1 || true

# 4. Pallas toolchain re-probe (dynstore/dyngather status changes by
# session; record the current answer)
timeout 900 python tools/probe_pallas.py || true
echo ON_RECOVERY_DONE
