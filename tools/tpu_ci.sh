#!/bin/bash
# tpu_ci.sh — the STANDING on-TPU regression gate (VERDICT r3 task 2).
#
# CI (.github/workflows) is CPU-only; two TPU-only numerics regressions
# have already occurred (the bf16x3 excess-precision elision, r2; the
# reduce_precision guard exists because of it). Run this at the START of
# every session on hardware — it proves the full differential contract on
# the chip and records a dated artifact the next session can diff against.
#
#   bash tools/tpu_ci.sh            # ~25-40 min (compiles dominate)
#   bash tools/tpu_ci.sh --quick    # parity sweep + guard only (~12 min)
#
# Writes bench_artifacts/tpu_ci_<UTCDATE>.json summarizing every step's
# exit code, plus the usual bench_results.json / stages json refreshes.
# Exit 0 iff every gating step passed (bench stage breakdown is recorded
# but non-gating — perf regressions warn via bench.py's own >10% check).
#
# One TPU job at a time; never foreground-kill a TPU client mid-RPC
# (see .claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."

# one gate at a time: a previous session's gate can survive that
# session's death and silently share the chip, pushing stage runtimes
# past their timeouts (both 2026-08-19 FAIL artifacts were exactly
# this). Refuse to start while a live gate pid exists.
PIDFILE=/tmp/tpu_ci.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "tpu_ci: another gate is already running (pid $(cat "$PIDFILE")); refusing to double-book the chip" >&2
    exit 2
fi
echo $$ > "$PIDFILE"

STAMP=$(date -u +%Y%m%d_%H%M%S)
ART="bench_artifacts/tpu_ci_${STAMP}.json"
QUICK=0
[ "${1:-}" = "--quick" ] && QUICK=1

declare -A RC

# 0. tunnel liveness (fail fast instead of wedging in PJRT init)
python - <<'EOF'
import sys
sys.path.insert(0, '.')
from elasticdeform_tpu.runtime import probe_default_backend_info
count, platform = probe_default_backend_info(120)
print(f"probe: count={count} platform={platform}", flush=True)
sys.exit(0 if (count > 0 and platform != 'cpu') else 1)
EOF
RC[probe]=$?
if [ "${RC[probe]}" -ne 0 ]; then
    echo "{\"stamp\": \"${STAMP}\", \"probe\": ${RC[probe]}, \"note\": \"TPU backend unusable — gate not run\"}" > "$ART"
    echo "tpu_ci: TPU down (probe rc=${RC[probe]}); wrote $ART"
    exit 1
fi

# 1. reference C extension (wiped with /tmp between sessions)
bash tools/build_reference.sh
RC[refbuild]=$?

# 2. full differential parity sweep vs the reference C (must print PASS).
# 3000 s: the sweep is compile-dominated and has grown with the ndimage
# tier — the 2026-08-20 01:06 run was all-ok but was timeout-killed at
# 1800 s before the distance/label checks (FAIL artifact, rc=124).
timeout 3000 python tools/tpu_parity.py
RC[parity]=$?

# 3. bf16x3 ordering/elision guard with the split FORCED ON
ELASTICDEFORM_TPU_ONEHOT_BF16X3=1 timeout 900 python tools/tpu_bf16x3_guard.py
RC[bf16x3]=$?

# 4. randomized differential fuzz (20 configs; seeds rotate by date)
timeout 1800 python tools/tpu_parity.py --fuzz 20
RC[fuzz]=$?

if [ "$QUICK" -eq 0 ]; then
    # 5. benchmark refresh (updates bench_results.json; warns on >10%
    #    per-config regressions vs the previous record)
    timeout 3600 python bench.py --all
    RC[bench]=$?

    # 6. stage breakdown (the per-round perf record; non-gating)
    timeout 1200 python tools/profile_stages.py --json "bench_artifacts/stages_${STAMP}.json"
    RC[stages]=$?
fi

# summarize
TPU_CI_RCS=""
for k in "${!RC[@]}"; do TPU_CI_RCS+="$k=${RC[$k]} "; done
export TPU_CI_RCS
python - "$ART" "$STAMP" <<'EOF'
import json, sys, os
art, stamp = sys.argv[1], sys.argv[2]
rcs = {}
for kv in os.environ.get("TPU_CI_RCS", "").split():
    k, v = kv.split("=")
    rcs[k] = int(v)
gating = [k for k in ("probe", "refbuild", "parity", "bf16x3", "fuzz",
                      "bench") if k in rcs]
ok = all(rcs[k] == 0 for k in gating)
out = {"stamp": stamp, "ok": ok, "rc": rcs}
try:
    with open("bench_results.json") as f:
        out["bench"] = json.load(f)
except OSError:
    pass
with open(art, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({"tpu_ci": "PASS" if ok else "FAIL", **rcs}))
sys.exit(0 if ok else 1)
EOF
exit $?
