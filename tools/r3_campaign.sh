#!/bin/bash
# Round-3 sequential TPU measurement campaign. Run ONE at a time (the chip
# is shared); each step appends to the log. Compiles are slow through the
# remote helper today (~4-10 min per big graph) — be patient.
set -x
cd /root/repo
mkdir -p bench_artifacts

# 1. stage profile, current default plan (448) -> JSON record
python tools/profile_stages.py 64 64 --json bench_artifacts/stages_448.json

# 2. stage profile, candidate (5,5,5)/(2,2,2) plan
ELASTICDEFORM_TPU_PLAN3D=555 python tools/profile_stages.py 64 64 \
    --json bench_artifacts/stages_555.json

# 3. fold X3 speed (approximate-gradient opt-in): pair + scatter_fold only
ELASTICDEFORM_TPU_FOLD_X3=1 python tools/profile_stages.py 64 64 \
    --json bench_artifacts/stages_448_foldx3.json

echo CAMPAIGN_DONE
