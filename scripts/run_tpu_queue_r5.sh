#!/usr/bin/env bash
# Round-5 measurement queue (after the 32x16 tile + divisor-tpp defaults).
# ONE TPU job at a time; generous timeouts (compiles 1-4 min each).
set -u
cd "$(dirname "$0")/.."
LOG=docs/tpu_queue_r5.log
{
  echo "=== round-5 queue start $(date -u +%FT%TZ) ==="

  echo "--- [1] bench F=256 ---"
  timeout 1200 python bench.py --f_dim 256

  echo "--- [2] bench F=512 ---"
  timeout 1500 python bench.py --f_dim 512

  echo "--- [3] bench_render (inference FPS, F=128) ---"
  timeout 1200 python scripts/bench_render.py

  echo "--- [4] bench_scaling (sharded step, 1-device mesh) ---"
  timeout 1500 python scripts/bench_scaling.py

  echo "--- [5] bench_longrun (new auto-cap policy, 1200 it) ---"
  timeout 3000 python scripts/bench_longrun.py

  echo "=== round-5 queue done $(date -u +%FT%TZ) ==="
} >> "$LOG" 2>&1
