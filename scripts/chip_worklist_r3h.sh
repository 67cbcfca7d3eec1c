#!/bin/bash
# Round-3h chip worklist — chains after r3g. Render-side permute-mode
# A/B (the renderer's unsort also rides the gather machinery) plus any
# follow-ups queued while the tunnel was down.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3h.log}
PREV=/tmp/chip_r3g.log

echo "=== waiting for WORKLIST_R3G DONE — $(date -u +%H:%M:%S)" >> "$LOG"
until grep -q "WORKLIST_R3G DONE" "$PREV" 2>/dev/null; do sleep 120; done
echo "=== r3g done, starting — $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# renderer chunk with the gather permutation machinery
T=2400 run env SCANERF_PERMUTE_MODE=gather python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather_narrow python scripts/bench_render.py 4
echo "WORKLIST_R3H DONE $(date -u)" >> "$LOG"
