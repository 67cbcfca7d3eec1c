#!/bin/bash
# Round-3q chip worklist — r3p re-prioritized for a short wall-clock
# window after the 2026-08-20 restart (logs/ was wiped; nothing from
# r3p ran). Highest-value first:
#  1. bench.py — refresh the chip cache at current HEAD (post pose-
#     export fix; driver replays this if the tunnel drops at round end).
#  2. city_run 4000 — fresh 8-tile city e2e incl. the QUALITY-GAP
#     train-eval vs standalone-render line with the refined-pose fix.
#  3. probe_sort_width / probe_dma_runs — informational fabric scalings.
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r3q.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r3q start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. refresh the bench chip cache at current HEAD
T=3600 run python bench.py

# 2. fresh 8-tile city e2e (4x2 tiles, 96 cams, 4000 steps) with the
#    QUALITY-GAP train-eval vs standalone-render line
T=10800 run python scripts/city_run.py 4000

# 3. informational probes for the PERF.md fabric table
T=2400 run python scripts/probe_sort_width.py
T=2400 run python scripts/probe_dma_runs.py

echo "WORKLIST_R3Q DONE $(date -u)" >> "$LOG"
