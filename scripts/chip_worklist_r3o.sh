#!/bin/bash
# Round-3o chip worklist — the tail of r3n (its items 1-4 completed and
# landed in PERF.md before the 2026-08-19 restart; quality A/B result is
# in logs/chip_r3n.log). Remaining, quick-first:
#  1. bench_render under runs/gather permute modes — informational.
#  2. probe_sort_width / probe_dma_runs — informational scalings.
#  3. city_run 4000 — fresh 8-tile city e2e incl. QUALITY-GAP line.
# Serial: ONE chip job at a time; generous timeouts; NEVER kill a job
# mid-compile on this fabric.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r3o.log}
mkdir -p "$(dirname "$LOG")"

echo "=== r3o start — $(date -u)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. renderer chunk under the alternate permute modes (informational)
T=2400 run env SCANERF_PERMUTE_MODE=runs python scripts/bench_render.py 4
T=2400 run env SCANERF_PERMUTE_MODE=gather python scripts/bench_render.py 4

# 2. informational probes for the PERF.md fabric table
T=2400 run python scripts/probe_sort_width.py
T=2400 run python scripts/probe_dma_runs.py

# 3. fresh 8-tile city e2e (4x2 tiles, 96 cams, 4000 steps) with the
#    QUALITY-GAP train-eval vs standalone-render line
T=10800 run python scripts/city_run.py 4000

echo "WORKLIST_R3O DONE $(date -u)" >> "$LOG"
