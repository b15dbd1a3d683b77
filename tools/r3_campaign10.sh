#!/bin/bash
# Round-3 campaign 10: dense filter-fused build for split-class volumes
# (c3). Verify + A/B + refresh.
set -x
cd /root/repo

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

python bench.py c3
ELASTICDEFORM_TPU_FUSE_BUILD=0 python bench.py c3
python bench.py c1
python bench.py c2
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
echo CAMPAIGN10_DONE
