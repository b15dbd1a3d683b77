#!/bin/bash
# Round-3 campaign 4: re-verify after the matmul-build/chunk-cap edits,
# A/B the matmul table build on the small 2-D configs, and settle the
# c3 bf16x3 question with an explicit on/off/auto triple.
# Sequential — one TPU job at a time. Waits for the prior campaign.
set -x
cd /root/repo

if [ -f /tmp/r3vb.pid ]; then
  tail --pid=$(cat /tmp/r3vb.pid) -f /dev/null || true
fi

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

# c1/c2: matmul vs conv table build (both now single-chunk)
ELASTICDEFORM_TPU_BUILD=matmul python bench.py c1
python bench.py c1
ELASTICDEFORM_TPU_BUILD=matmul python bench.py c2
python bench.py c2

# c3: bf16x3 on/off/auto (auto should equal on after the 1<<21 gate)
ELASTICDEFORM_TPU_ONEHOT_BF16X3=1 python bench.py c3
ELASTICDEFORM_TPU_ONEHOT_BF16X3=0 python bench.py c3
python bench.py c3

# stage regen with the landed defaults
python tools/profile_c1.py --json bench_artifacts/stages_c1.json
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
echo CAMPAIGN4_DONE
