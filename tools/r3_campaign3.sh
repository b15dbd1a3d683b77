#!/bin/bash
# Round-3 campaign 3: small-config plan/gate A/B on the real TPU.
# Sequential — one TPU job at a time. Waits for any prior TPU job first.
set -x
cd /root/repo

if [ -f /tmp/verify.pid ]; then
  tail --pid=$(cat /tmp/verify.pid) -f /dev/null || true
fi

# c1: 2D window plan A/B (+ unroll isolation on the old plan)
ELASTICDEFORM_TPU_PLAN2D=432 ELASTICDEFORM_TPU_UNROLL_CHUNKS=0 python bench.py c1
ELASTICDEFORM_TPU_PLAN2D=432 python bench.py c1
ELASTICDEFORM_TPU_PLAN2D=816 python bench.py c1

# c2: same 2D plan A/B
ELASTICDEFORM_TPU_PLAN2D=432 python bench.py c2
ELASTICDEFORM_TPU_PLAN2D=816 python bench.py c2

# c3: 3D plan x bf16x3 gate
ELASTICDEFORM_TPU_PLAN3D=448 python bench.py c3
ELASTICDEFORM_TPU_PLAN3D=555 python bench.py c3
ELASTICDEFORM_TPU_PLAN3D=448 ELASTICDEFORM_TPU_ONEHOT_BF16X3=1 python bench.py c3
ELASTICDEFORM_TPU_PLAN3D=555 ELASTICDEFORM_TPU_ONEHOT_BF16X3=1 python bench.py c3

echo CAMPAIGN3_DONE
