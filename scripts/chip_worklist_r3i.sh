#!/bin/bash
# Round-3i chip worklist — chains after r3h. Retries queued while the
# tunnel was down (2026-08-18):
#  - train_2p24 at LOG2=24: the 09:47 Aug 17 OOM predates the flat
#    [L, H*F] table layout (commit dbdf8bc); the 14 GB 8x-padding copy
#    of the table should be gone. Falls back to batch 2^11 on failure.
#  - quality_ab: died 09:26 Aug 17 on a Mosaic relayout error in one
#    backend variant; never retried post the round-3 kernel rework.
#  - final bench.py refresh so BENCH_CHIP_CACHE carries the
#    fused-decoder step measured on the latest tree.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/tmp/chip_r3i.log}
PREV=/tmp/chip_r3h.log

echo "=== waiting for WORKLIST_R3H DONE — $(date -u +%H:%M:%S)" >> "$LOG"
until grep -q "WORKLIST_R3H DONE" "$PREV" 2>/dev/null; do sleep 120; done
echo "=== r3h done, starting — $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout "${T:-2400}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. paper-default 2^24 single chip, post flat-layout (compile can top
#    17 min at this table size — generous timeout, never kill mid-compile)
if ! T=3600 run python scripts/train_2p24.py 8 12 24; then
  T=3600 run python scripts/train_2p24.py 8 11 24
fi
# 2. backend quality A/B (windowed / xla / stochastic + bf16 bwd)
T=6000 run python scripts/quality_ab.py
# 3. refresh the headline cache on the final tree
T=3600 run python bench.py
echo "WORKLIST_R3I DONE $(date -u)" >> "$LOG"
