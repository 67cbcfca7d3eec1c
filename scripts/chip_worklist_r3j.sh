#!/bin/bash
# Round-3j chip worklist — chains after r3i. Follow-ups for the "runs"
# permutation mode (run-length sort_pack, PERF.md round-3d) built while
# the tunnel was down:
#  - render-side A/B of the runs machinery (r3h covers gather/narrow)
#  - re-run the headline bench under the best TRAINING permute mode
#    measured by r3g's bench_permute_ab, so BENCH_CHIP_CACHE carries the
#    winner (the code default stays "sort" until the data is reviewed)
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3j.log}
PREV=/tmp/chip_r3i.log

echo "=== waiting for WORKLIST_R3I DONE — $(date -u +%H:%M:%S)" >> "$LOG"
until grep -q "WORKLIST_R3I DONE" "$PREV" 2>/dev/null; do sleep 120; done
echo "=== r3i done, starting — $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. renderer chunk with the run-length permutation machinery
T=2400 run env SCANERF_PERMUTE_MODE=runs python scripts/bench_render.py 4

# 2. headline bench under the fastest training permute mode from r3g
BEST=$(python - <<'EOF'
import re
best, best_ms = "sort", 1e18
try:
    for line in open("/tmp/chip_r3g.log"):
        m = re.match(r"permute=(\w+)\s*:\s*([0-9.]+) ms/step", line)
        if m and float(m.group(2)) < best_ms:
            best, best_ms = m.group(1), float(m.group(2))
except OSError:
    pass
print(best)
EOF
)
echo "=== best training permute mode: $BEST" >> "$LOG"
T=3600 run env SCANERF_PERMUTE_MODE="$BEST" python bench.py
echo "WORKLIST_R3J DONE $(date -u)" >> "$LOG"
