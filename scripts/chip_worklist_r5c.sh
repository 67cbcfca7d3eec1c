#!/bin/bash
# Round-5c chip worklist (end-of-round session):
#
# 1. bench.py at HEAD — the committed BENCH_CHIP_CACHE (21,579 rays/s,
#    rev f110ee1) predates the WARP_TOP_K=5 recipe promotion
#    (9286f31); the r4d full-weight A/B measured the K=5 warp phase at
#    1.74x wall, so the full-recipe headline at HEAD should land well
#    above the cached number. Refreshing the cache makes the driver's
#    end-of-round record measure the promoted recipe.
# 2. Regenerate a small city export (the r5b one died with the
#    machine's gitignored logs/), then run the early-termination
#    opacity-sharpening sweep: bench_early_term.py with sigma
#    pre-activation scale k in {1, 2, 4, 8} maps speedup as a function
#    of frac(T_left < 1e-5) — the value curve for the reference's
#    break-on-transparency (rendering.py:341-345) without needing a
#    40K-step fully-saturated training run.
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=${1:-/root/repo/logs/chip_r5c.log}
mkdir -p "$(dirname "$LOG")"
echo "=== r5c start — $(date -u)" >> "$LOG"
run() {
  echo "=== $* — $(date -u +%H:%M:%S)" >> "$LOG"
  timeout --signal=TERM --kill-after=120 "${T:-3600}" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc — $(date -u +%H:%M:%S)" >> "$LOG"
  return $rc
}

# 1. headline refresh (writes BENCH_CHIP_CACHE.json at HEAD);
#    SKIP_BENCH=1 when it already ran this session
if [ -z "${SKIP_BENCH:-}" ]; then
  T=2500 run env BENCH_BUDGET_S=2400 python bench.py
fi

# 2. small export for the early-term sweep: 2 tiles, 64^2, 800 steps
export CITY_DIR=/root/repo/logs/cityscene_r5c
T=2400 run python scripts/city_run.py 800 2 1 48 64
LD=$(ls -d "$CITY_DIR"/logs/*/ 2>/dev/null | tail -1)
if [ -n "$LD" ]; then
  for K in 1 2 4 8; do
    T=1500 run python scripts/bench_early_term.py "$LD" 256 13 32 0 "$K"
  done
fi
echo "WORKLIST_R5C DONE $(date -u)" >> "$LOG"
