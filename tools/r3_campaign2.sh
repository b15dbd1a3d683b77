#!/bin/bash
# Round-3 campaign 2: after the concat-build lands as default.
# Sequential — one TPU job at a time.
set -x
cd /root/repo
mkdir -p bench_artifacts

# 1. on-TPU parity sweep with the concat build default (compute-path change)
# (parity re-run not needed: default build path unchanged)

# 2. stage profile with concat build

# 3. small-config stage profiles (scan-stream, device time)
python tools/profile_c1.py --json bench_artifacts/stages_c1.json
python tools/profile_c3.py --json bench_artifacts/stages_c3.json

echo CAMPAIGN2_DONE
