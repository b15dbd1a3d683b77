#!/bin/bash
# Round-3 campaign 8: fused filter+pad+expand build matmuls, fused
# grid-prefilter displacement, K=64 bench streams. Verify + full bench.
set -x
cd /root/repo

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

python bench.py --all

python tools/profile_c1.py --json bench_artifacts/stages_c1.json
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
echo CAMPAIGN8_DONE
