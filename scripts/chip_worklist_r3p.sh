#!/bin/bash
# Round-3p chip worklist — consolidates what the 2026-08-19/20 machine
# restart lost from r3o. The renderer permute A/B (r3o item 1) DID land
# in PERF.md before the restart; remaining, quick-first:
#  1. probe_sort_width / probe_dma_runs — informational scalings for
#     the PERF.md fabric table (clean re-measure of the row-gather tax).
#  2. bench.py — refresh the chip cache at current HEAD (post pose-
#     export fix; numbers should reproduce the 2026-08-19 measurement).
#  3. city_run 4000 — fresh 8-tile city e2e incl. the QUALITY-GAP
#     train-eval vs standalone-render line, now with the refined-pose
#     export fix (the previous city render was -3.5 dB from that bug).
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r3p.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r3p start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. informational probes for the PERF.md fabric table
T=2400 run python scripts/probe_sort_width.py
T=2400 run python scripts/probe_dma_runs.py

# 2. refresh the bench chip cache at current HEAD
T=3600 run python bench.py

# 3. fresh 8-tile city e2e (4x2 tiles, 96 cams, 4000 steps) with the
#    QUALITY-GAP train-eval vs standalone-render line
T=10800 run python scripts/city_run.py 4000

echo "WORKLIST_R3P DONE $(date -u)" >> "$LOG"
