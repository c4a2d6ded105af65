"""Long-run wall-clock throughput: does densify maintenance stall the pipe?

Round 2 measured a 13.5K-iteration CLI run at ~240 ms/it wall vs ~85 ms/it
inside sync windows — the densify maintenance path cost ~4 s per 100-iter
window in pipeline drains + sequential blocked reads (docs/tpu_notes.md
"Long-run CLI throughput"). Round 3 rewrote the Trainer so densify reports
queue on device and fold into the NEXT sync point's single jax.device_get
(trainer.py _drain_reports). This bench proves the fix at bench scale:

  - synthetic 100K-Gaussian scene, 1216x800 RGB + 128-d features (the
    bench.py config), densify every 100 iters inside the measured region;
  - wall time stamped at every sync boundary (sync_every=10, the
    scripts/train.py default cadence);
  - reports overall wall ms/it over the measured region vs the median
    ms/it of sync spans that contain NO densify boundary ("in-window"),
    and their ratio — the VERDICT target is ratio <= 1.2x.

Wall clocks are the right meter HERE (unlike per-step kernel timing,
docs/tpu_notes.md): long-run throughput is exactly what real training
pays, RPC overheads included. Compile events (first step, first densify)
happen before the measured region; rasterizer capacities are sized so no
growth re-jit fires mid-measurement.

Usage: python scripts/bench_longrun.py [--iters 1200] [--sync_every 10]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GAUSS = 100_000
F_DIM = 128
W, H = 1216, 800


def build_scene(n_cams: int = 4):
    from feature3dgs_tpu.data.cameras import Camera
    from feature3dgs_tpu.data.dataset import SceneData

    rng = np.random.RandomState(0)
    pts = rng.uniform(-2.0, 2.0, (N_GAUSS, 3)).astype(np.float32)
    cols = rng.rand(N_GAUSS, 3).astype(np.float32)
    cams = []
    for i in range(n_cams):
        cams.append(Camera(
            uid=i, colmap_id=i, R=np.eye(3),
            T=np.array([0.1 * (i - n_cams / 2), 0.0, 5.0]),
            fovx=1.2, fovy=0.9,
            image=rng.rand(H, W, 3).astype(np.float32),
            image_name=f"cam{i}",
            semantic_feature=(rng.randn(H // 2, W // 2, F_DIM)
                              .astype(np.float32) * 0.1),
            width=W, height=H))
    return SceneData(train_cameras=cams, test_cameras=[], points=pts,
                     colors=cols,
                     nerf_norm={"translate": np.zeros(3), "radius": 4.0},
                     feature_dim=F_DIM, source_path="synthetic")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1200)
    ap.add_argument("--warmup", type=int, default=500,
                    help="iterations before the measured region (covers "
                         "first-step + first-densify compiles)")
    ap.add_argument("--sync_every", type=int, default=10)
    ap.add_argument("--densify_interval", type=int, default=100)
    ap.add_argument("--densify_grad_threshold", type=float, default=6e-4,
                    help="default is 3x the training default: random-GT "
                         "densification at 2e-4 grew the scene to 6.3M "
                         "instances in the round-4 run, firing a raster "
                         "capacity re-jit INSIDE the measured region")
    args = ap.parse_args(argv)
    if args.warmup <= 2 * args.densify_interval:
        ap.error("--warmup must exceed 2*--densify_interval so the "
                 "first-densify compile lands before the measured region")

    import jax
    from feature3dgs_tpu.ops import RasterConfig
    from feature3dgs_tpu.train.trainer import OptimizationConfig, Trainer

    scene = build_scene()
    ocfg = OptimizationConfig(
        iterations=args.iters,
        densify_from_iter=args.warmup - args.densify_interval * 2,
        densify_until_iter=args.iters + 1,
        densification_interval=args.densify_interval,
        densify_grad_threshold=args.densify_grad_threshold,
        opacity_reset_interval=100_000,  # keep the measured region uniform
    )
    # generous capacities: no growth re-jit mid-measurement (1<<21 rows =
    # 2.1 GB slab + d_slab; enough headroom for the damped densify rate)
    rcfg = RasterConfig(instance_capacity=1 << 21, tile_capacity=1 << 11,
                        chunk=128)
    tr = Trainer(scene, ocfg=ocfg, rcfg=rcfg, max_sh_degree=3,
                 capacity_headroom=8.0)
    # pre-activate the full SH degree: the schedule's bumps at iterations
    # 1000/2000/3000 change a STATIC field (re-jit, ~60 s each on the
    # tunnel) and would land inside the measured region — this bench
    # isolates densify-maintenance stalls, not one-off compile events
    # (round-4 run: ratio 1.43 of which ~everything beyond the densify
    # windows was the it-1000 SH re-jit)
    tr.ts = tr.ts.replace(
        gstate=tr.ts.gstate.replace(active_sh_degree=3))

    sync_marks = []          # (iteration, wall_time) at sync boundaries
    cap0 = None              # capacities at the start of the measured region
    t_start = time.time()
    for it in range(1, args.iters + 1):
        sync = (it % args.sync_every == 0)
        m = tr.step(sync=sync)
        if sync:
            sync_marks.append((it, time.time()))
            if cap0 is None and it >= args.warmup:
                cap0 = (tr.rcfg.instance_capacity, tr.ts.params.capacity)
            if it % 100 == 0:
                print(f"  it {it}: loss={m['loss']:.4f} "
                      f"wall={time.time() - t_start:.1f}s", flush=True)
    tr.flush_maintenance(drain=True)

    # measured region: sync spans fully past the warmup
    spans = []  # (it_hi, ms_per_it, has_densify)
    for (i0, t0), (i1, t1) in zip(sync_marks, sync_marks[1:]):
        if i0 < args.warmup:
            continue
        ms_it = (t1 - t0) * 1000.0 / (i1 - i0)
        # maintenance for iteration k dispatches at the START of k+1, so a
        # densify boundary at k stalls the span (k, k+sync_every]
        has_densify = any(
            k > ocfg.densify_from_iter and k % args.densify_interval == 0
            for k in range(i0, i1))
        spans.append((i1, ms_it, has_densify))

    if not spans:
        sys.exit("warmup >= iters: nothing measured")
    clean = sorted(ms for _, ms, d in spans if not d)
    dirty = sorted(ms for _, ms, d in spans if d)
    in_window = clean[len(clean) // 2] if clean else float("nan")
    # anchor numerator and denominator to the SAME first mark past warmup
    i_base, t_base = next((i, t) for i, t in sync_marks if i >= args.warmup)
    total_it = spans[-1][0] - i_base
    overall = (sync_marks[-1][1] - t_base) * 1000.0 / total_it
    print(json.dumps({
        "metric": "long-run wall ms/it vs in-window ms/it",
        "value": round(overall / in_window, 3),
        "unit": "ratio (target <= 1.2)",
        "detail": {
            "overall_ms_it": round(overall, 1),
            "in_window_median_ms_it": round(in_window, 1),
            "densify_window_median_ms_it": round(
                dirty[len(dirty) // 2], 1) if dirty else None,
            "measured_iters": total_it,
            "spans": len(spans), "densify_spans": len(dirty),
            "num_active": float(np.asarray(
                jax.device_get(tr.ts.gstate.num_active))),
            # growth re-jits inside the run invalidate the ratio (a ~65 s
            # compile lands in one span) — surface it instead of hiding it
            "capacity_regrew": (tr.rcfg.instance_capacity,
                                tr.ts.params.capacity) != cap0,
        },
    }))


if __name__ == "__main__":
    main()
