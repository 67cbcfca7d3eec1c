#!/bin/bash
# Round-3e chip worklist — chains after r3d (waits for its DONE marker
# in /tmp/chip_r3d.log). Serial, generous timeouts, never kill
# mid-compile.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3e.log}
PREV=/tmp/chip_r3d.log

echo "=== waiting for WORKLIST_R3D DONE — $(date -u +%H:%M:%S)" >> "$LOG"
until grep -q "WORKLIST_R3D DONE" "$PREV" 2>/dev/null; do sleep 120; done
echo "=== r3d done, starting — $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. piecewise budget of the fused pipeline (sampler A/B, sort, fused
#    kernel, unsort, full step)
T=3600 run python scripts/profile_windowed4.py
# 2. long city run: resume from the newest r3d city checkpoint logdir
#    and extend to 12000 steps (mid-run checkpoints keep it resumable)
LATEST=$(ls -dt /tmp/cityscene_e2e/logs/*/ 2>/dev/null | head -1)
T=14000 CITY_CKP="$LATEST" run python scripts/city_run.py 12000
echo "WORKLIST_R3E DONE $(date -u)" >> "$LOG"
