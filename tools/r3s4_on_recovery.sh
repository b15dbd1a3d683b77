#!/bin/bash
# Round-3, fourth session: on-TPU validation + measurements to run the
# moment the tunnel recovers. Sequential — one TPU job at a time.
# Covers this session's new surface (map_coordinates / deform_field /
# batched / sharded-field warp) and the measurements ROADMAP queued.
set -x
cd /root/repo

# 0. the parity sweep and fuzz need the reference C extension (/tmp is
#    wiped between sessions)
bash tools/build_reference.sh

# 1. full parity sweep, now incl. map_coordinates blocks (must print PASS)
timeout 1800 python tools/tpu_parity.py
echo "PARITY_EXIT=$?"

# 2. randomized differential fuzz vs the reference C (40 configs)
timeout 1800 python tools/tpu_parity.py --fuzz 40
echo "FUZZ_EXIT=$?"

# 3. batched backward-only A/B: vmap pipeline vs native-batched vjp
#    (route core.deform_batch_gradient through the winner; ROADMAP "Next")
timeout 1200 python tools/probe_batched_bwd.py 64 64
echo "BATCHBWD_EXIT=$?"

# 4. prefilter matrix-vs-scan crossover on the chip (SCAN_MIN retune data)
timeout 1200 python tools/probe_prefilter_scan.py || true

# 5. bench refresh + persist stage breakdown
timeout 2400 python bench.py --all
timeout 900 python tools/profile_stages.py --json bench_artifacts/stages_r3s4.json || true

# 5b. supplementary resampler-surface benchmark (map_coordinates /
#     deform_field_batch — the session's new public surface)
timeout 1200 python tools/bench_mapcoords.py || true

# 6. Pallas toolchain re-probe (dynstore/dyngather status changes by
#    session; record the current answer)
timeout 900 python tools/probe_pallas.py || true
echo ON_RECOVERY_DONE
