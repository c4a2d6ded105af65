#!/bin/bash
# Round-3 TPU measurement queue — run when the axon tunnel recovers.
# ONE job at a time (the tunneled compile service is single-tenant and
# wedges if clients overlap or die mid-compile — CLAUDE.md); generous
# timeouts; everything logs to $LOG. Stop at the first smoke failure.
#
# Usage: bash scripts/run_tpu_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_queue_$(date +%H%M).log}
run() {
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- exit $rc" | tee -a "$LOG"
  return $rc
}

# 1. Mosaic lowering smoke (MANDATORY first: backward kernel path changed
#    this round — poison_init arg, masked segment-sum, per-image row wrap;
#    now also covers rasterize_batch)
TMO=1800 run python scripts/tpu_smoke.py || { echo "SMOKE FAILED — stop"; exit 1; }

# 2. Baseline intact?
TMO=1800 run python bench.py

# 3. Loss-reformulation A/B (flip losses.py defaults if they win)
TMO=1800 run python bench.py --blur_impl shift
TMO=1800 run python bench.py --resize_impl blocked
TMO=1800 run python bench.py --blur_impl shift --resize_impl blocked

# 4. Segment-sum fused-gather micro-bench
TMO=1200 run python scripts/micro_segsum.py

# 5. Fusion-tail map (auto source attribution)
TMO=2400 run python scripts/profile_step.py --top 30 --dump_hlo /tmp/hlo128

# 6. F=512 decomposition (VERDICT target <= 100 ms)
TMO=2400 run python scripts/profile_step.py --f_dim 512 --top 30 --dump_hlo /tmp/hlo512

# 7. Batched inference
TMO=2400 run python scripts/bench_render.py --batch 1 --f_dims 128
TMO=2400 run python scripts/bench_render.py --batch 4 --f_dims 128

# 8. Long-run wall-vs-window ratio (round-3 dispatch-only maintenance fix;
#    VERDICT target <= 1.2x)
TMO=3600 run python scripts/bench_longrun.py --iters 1200 --warmup 500 \
    --sync_every 10 --densify_interval 100

echo "=== queue done: $LOG ==="
tail -5 "$LOG"
