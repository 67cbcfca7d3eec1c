#!/bin/bash
# Round-3l follow-up: re-run the permute-mode A/B with the fixed
# multi-arm harness (r3k's run lost the gather/gather_narrow/runs arms
# to donated-state deletion — see bench_permute_ab.py fix), then refresh
# the headline bench under the winning mode. Waits for r3k to release
# the chip first (single-client tunnel).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3l.log}
R3K_LOG=${2:-/tmp/chip_r3k.log}
R3K_PID=${3:-}

echo "=== r3l waiting for r3k — $(date -u)" >> "$LOG"
while true; do
  grep -q "WORKLIST_R3K DONE" "$R3K_LOG" 2>/dev/null && break
  # fallback: r3k crashed without its marker
  if [ -n "$R3K_PID" ] && ! kill -0 "$R3K_PID" 2>/dev/null; then
    echo "=== r3k pid gone without DONE marker — proceeding" >> "$LOG"
    break
  fi
  sleep 60
done

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

echo "=== r3l start — $(date -u)" >> "$LOG"

# 1. the permute-mode decision run, fixed harness
T=6000 run python scripts/bench_permute_ab.py

# 2. headline bench under the best measured mode (sort already has a
#    fresh cached measurement from r3k step 1)
BEST=$(python - <<'EOF'
import re
best, best_ms = "sort", 1e18
try:
    for line in open("/tmp/chip_r3l.log"):
        m = re.search(r"permute=(\w+)\s*:\s*([0-9.]+) ms/step", line)
        if m and float(m.group(2)) < best_ms:
            best, best_ms = m.group(1), float(m.group(2))
except OSError:
    pass
print(best)
EOF
)
echo "=== best training permute mode: $BEST" >> "$LOG"
if [ "$BEST" != "sort" ]; then
  T=3600 run env SCANERF_PERMUTE_MODE="$BEST" python bench.py
fi
echo "WORKLIST_R3L DONE $(date -u)" >> "$LOG"
