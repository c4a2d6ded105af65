#!/bin/bash
# Round-4 second TPU measurement queue: validate + A/B the alpha-as-matmul
# kernel mode (this round's kernel edit), then the F=512 decomposition.
# ONE job at a time (single-tenant compile service — CLAUDE.md).
#
# Usage: bash scripts/run_tpu_queue_r4b.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_queue_r4b_$(date +%H%M).log}
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- exit $rc" | tee -a "$LOG"
  return $rc
}

# 1. Mosaic lowering smoke (MANDATORY first: both kernels gained the
#    alpha_mm branch + shared pxl/pyl/mono tile setup)
TMO=1800 run python scripts/tpu_smoke.py || { echo "SMOKE FAILED — stop"; exit 1; }

# 2. alpha-as-matmul A/B at the bench config (baseline now = shift blur)
TMO=1800 run python bench.py
TMO=1800 run python bench.py --alpha_matmul

# 3. F=512: baseline vs alpha_matmul (VERDICT target <= 100 ms)
TMO=2400 run python bench.py --f_dim 512
TMO=2400 run python bench.py --f_dim 512 --alpha_matmul

echo "=== queue done: $LOG ==="
tail -5 "$LOG"
