#!/bin/bash
# Round-3 campaign 5: generalized selection-matmul build.
# 1) full parity sweep (build default changed to auto/matmul for 2-D),
# 2) c3 A/B: {conv,matmul} x {448,888} (matmul 3-D is the new candidate),
# 3) c4/c5 batched matmul A/B,
# 4) c1/c2 confirmation under auto.
# Sequential — one TPU job at a time.
set -x
cd /root/repo

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

ELASTICDEFORM_TPU_BUILD=matmul python bench.py c3
ELASTICDEFORM_TPU_BUILD=matmul ELASTICDEFORM_TPU_PLAN3D=888 python bench.py c3
ELASTICDEFORM_TPU_PLAN3D=888 python bench.py c3
python bench.py c3

ELASTICDEFORM_TPU_BUILD=matmul python bench.py c4
ELASTICDEFORM_TPU_BUILD=matmul python bench.py c5

python bench.py c1
python bench.py c2
echo CAMPAIGN5_DONE
