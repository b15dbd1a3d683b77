#!/bin/bash
# Round-3 campaign 7: staged per-axis gather reduction for 512-lane plans
# + big-volume parity check. Verify then refresh c3/c1 + profiles.
set -x
cd /root/repo

if [ -f /tmp/after_c6.pid ]; then
  tail --pid=$(cat /tmp/after_c6.pid) -f /dev/null || true
fi

python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

python bench.py c3
python bench.py c1
python tools/profile_c3.py --json bench_artifacts/stages_c3.json
python tools/profile_c1.py --json bench_artifacts/stages_c1.json
echo CAMPAIGN7_DONE
