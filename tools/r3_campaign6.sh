#!/bin/bash
# Round-3 campaign 6: verify + bench the landed defaults —
# size-aware 3-D plan (888 for big single volumes), matmul build auto
# gate, fused prefilter+pad matmuls (fwd + transpose).
# Sequential — one TPU job at a time.
set -x
cd /root/repo

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

python bench.py --all

python tools/profile_c1.py --json bench_artifacts/stages_c1.json
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
python tools/profile_stages.py --json bench_artifacts/stages_448.json
echo CAMPAIGN6_DONE
