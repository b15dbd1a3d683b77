#!/bin/bash
# Round-3 campaign 9: batched fused build on TPU, streamed c4, 256^3
# robustness, full parity + bench refresh.
set -x
cd /root/repo

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

# batched 2-D fused build vs per-sample singles, on TPU
python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
import elasticdeform_tpu as ed
from elasticdeform_tpu.parallel.sharding import batched_deform
rng = np.random.default_rng(5)
X = jnp.asarray(rng.random((8, 50, 60), dtype=np.float32))
D = jnp.asarray(rng.standard_normal((8, 2, 3, 3)).astype(np.float32) * 6)
yb = batched_deform(X, D, order=3, mode='mirror')
errs = []
for i in range(8):
    yi = ed.deform(X[i], D[i], order=3, mode='mirror')
    errs.append(float(jnp.max(jnp.abs(yb[i] - yi))))
print("batched2d fused max err", max(errs), flush=True)
assert max(errs) < 1e-5, errs
# batched 2-D gradient
gy = jnp.asarray(rng.random((8, 50, 60), dtype=np.float32))
_, vjp = jax.vjp(lambda x: batched_deform(x, D, order=3, mode='mirror'), X)
(gx,) = vjp(gy)
print("batched2d grad finite", bool(jnp.all(jnp.isfinite(gx))), flush=True)
# 256^3 crop forward robustness (auto plan past the cap on both plans)
Xb = jnp.asarray(rng.random((256, 256, 256), dtype=np.float32))
db = jnp.asarray(rng.standard_normal((3, 3, 3, 3)).astype(np.float32) * 20)
y = ed.deform(Xb, db, order=3, mode='mirror',
              crop=(slice(64, 192),) * 3)
print("256^3 crop ok", y.shape, float(jnp.sum(y)), flush=True)
print("BATCHED2D_256_OK", flush=True)
EOF

python bench.py --all
python tools/profile_c1.py --json bench_artifacts/stages_c1.json
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
echo CAMPAIGN9_DONE
