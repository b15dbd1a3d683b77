#!/bin/bash
# Round-3 freeze: final bench --all (writes bench_results.json +
# regression diff), final parity sweep, stage profiles.
set -x
cd /root/repo

python bench.py --all
python tools/tpu_parity.py
echo "PARITY_EXIT=$?"
python tools/profile_c1.py --json bench_artifacts/stages_c1.json
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
python tools/profile_stages.py --json bench_artifacts/stages_448.json
echo FREEZE_DONE
