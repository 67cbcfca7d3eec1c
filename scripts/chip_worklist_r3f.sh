#!/bin/bash
# Round-3f chip worklist — chains after r3e (waits for its DONE marker).
# The sort-tax decision data: payload-width/gather probe, run-length DMA
# probe, and the sort-vs-gather permutation A/B on the production step.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3f.log}
PREV=/tmp/chip_r3e.log

echo "=== waiting for WORKLIST_R3E DONE — $(date -u +%H:%M:%S)" >> "$LOG"
until grep -q "WORKLIST_R3E DONE" "$PREV" 2>/dev/null; do sleep 120; done
echo "=== r3e done, starting — $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  echo "=== exit $? — $(date -u +%H:%M:%S)" >> "$LOG"
}

# 1. sort payload-width scaling + true take()-gather rate
T=2400 run python scripts/probe_sort_width.py
# 2. DMA descriptor throughput (run-length-sort expansion feasibility)
T=2400 run python scripts/probe_dma_runs.py
# 3. sort vs gather permutation machinery on the full windowed step
T=3600 run python scripts/bench_permute_ab.py
echo "WORKLIST_R3F DONE $(date -u)" >> "$LOG"
