#!/bin/bash
# Round-3: verify (drive + parity) then refresh bench with landed defaults,
# then A/B the 512-lane (8,8,8) 3-D plan on the crop config.
# Sequential — one TPU job at a time.
set -x
cd /root/repo

python - <<'EOF'
import sys, numpy as np, jax
print(jax.devices(), flush=True)
import elasticdeform_tpu as ed
X = np.random.rand(200, 300)
Y = ed.deform_random_grid(X, sigma=25, points=3)
print("README flow ok", Y.shape, float(np.sum(Y)), flush=True)
img = np.random.rand(3, 64, 64); seg = (np.random.rand(64, 64) > .5).astype(np.float32)
d = np.random.randn(2, 3, 3) * 5
a, b = ed.deform_grid([img, seg], d, order=[3, 0], axis=[(1, 2), (0, 1)])
print("multi-input ok", a.shape, b.shape, flush=True)
out = ed.deform_grid(np.random.rand(40, 40), np.random.randn(2, 3, 3) * 3,
                     rotate=30, zoom=1.5)
print("rotate/zoom ok", out.shape, flush=True)
import torch
import elasticdeform_tpu.torch as edt
x = torch.rand(32, 32, requires_grad=True)
y = edt.deform_grid(x, torch.randn(2, 3, 3) * 3, order=3)
y.sum().backward()
print("torch shim ok", x.grad is not None and bool(torch.isfinite(x.grad).all()), flush=True)
EOF

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

python bench.py --all

# 512-lane plan A/B on the crop config (c3), then on c4/c5 pair configs
ELASTICDEFORM_TPU_PLAN3D=888 python bench.py c3
ELASTICDEFORM_TPU_PLAN3D=888 python bench.py c4
ELASTICDEFORM_TPU_PLAN3D=888 python bench.py c5
echo VERIFY_BENCH_DONE
