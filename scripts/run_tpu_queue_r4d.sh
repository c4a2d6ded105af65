#!/bin/bash
# Round-4 fourth TPU queue: F=512 levers + clean long-run ratio.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_queue_r4d.log}
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- exit $rc" | tee -a "$LOG"
  return $rc
}

# 1. pack-gather lane-width micro-bench (10.2 ms vs 3.9 roofline at 640)
TMO=1800 run python scripts/micro_pack.py

# 2. resize-precision A/B at F=512 (throughput mode, ~30 ms resize block)
TMO=2400 run python bench.py --f_dim 512 --resize_precision default
TMO=2400 run python bench.py --f_dim 512 --resize_precision highest

# 3. resize-precision at F=128 for the record
TMO=1800 run python bench.py --resize_precision default

# 4. clean long-run ratio (SH pre-bumped + pre-sized slab)
TMO=3600 run python scripts/bench_longrun.py

echo "=== queue done: $LOG ==="
