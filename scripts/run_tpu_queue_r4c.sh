#!/bin/bash
# Round-4 third TPU queue: F=512 fusion-tail attribution + targeted A/B +
# clean long-run ratio. ONE job at a time (single-tenant service).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_queue_r4c.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- exit $rc" | tee -a "$LOG"
  return $rc
}

# 1. F=512 profile with working HLO attribution (compiled.as_text)
TMO=2400 run python scripts/profile_step.py --f_dim 512 --top 40 \
    --dump_hlo /tmp/hlo512b

# 2. blocked resize at F=512 (the MXU-flop regime, unlike the F=128 loss)
TMO=2400 run python bench.py --f_dim 512 --resize_impl blocked

# 3. clean long-run ratio (hardened harness: pre-sized slab, damped densify)
TMO=3600 run python scripts/bench_longrun.py

echo "=== queue done: $LOG ==="
