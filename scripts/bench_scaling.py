#!/usr/bin/env python
"""Multi-chip scaling-efficiency harness (BASELINE.md config 5).

Runs the dp x sp sharded train step (the PALLAS kernel path under
shard_map) on 1, 2, 4, ... devices of the current platform and reports
step time + parallel efficiency vs the single-device run. On real
multi-chip TPU hardware this measures true ICI scaling; under
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`` it
validates the sharded program end-to-end (CPU timings are NOT a scaling
claim — the driver's real-hardware run is).

On one device this also cross-checks that the shard_map wrapper costs
nothing: its step_ms should match bench.py's within noise.

Prints one JSON line per mesh size:
  {"devices": D, "mesh": [dp, sp], "step_ms": .., "efficiency": ..,
   "step_ms_ratio_vs_1dev": .., "hlo_gflops_per_device": ..,
   "replicated_work_fraction": ..}

The ratio/flops fields make collective-structure regressions visible
WITHOUT multi-chip hardware (round-2/3 VERDICT): the per-device HLO flop
count of the compiled SPMD module tells how much of the per-image work
failed to shard. With work-per-image r(d) = flops_dev(d)*d/n_data
normalized by the 1-device total, a perfectly sharded step has r=1 and a
fully replicated one r=d; replicated_work_fraction = (r-1)/(d-1) estimates
the replicated share (the ~25 ms preprocess/binning/segment-sum floor of
docs/roofline.md "Multi-chip scaling ceiling").
"""
from __future__ import annotations

import json
import math
import os
import sys
import time
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_inputs(n_gauss, f_dim, w, h, n_data, capacity):
    import jax.numpy as jnp
    from feature3dgs_tpu.core import transforms
    from feature3dgs_tpu.core.projection import CameraView
    from feature3dgs_tpu.model import gaussians as G, optim
    from feature3dgs_tpu.train.trainer import TrainState

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.5, 1.5, (n_gauss, 3)).astype(np.float32)
    params, state = G.create_from_pcd(
        pts, rng.rand(n_gauss, 3).astype(np.float32), max_sh_degree=3,
        feature_dim=f_dim, capacity=capacity,
        knn_mean_dists=np.full(n_gauss, 1e-3, np.float32))
    params = params.replace(semantic_feature=jnp.asarray(
        rng.randn(params.capacity, 1, f_dim).astype(np.float32) * 0.1))
    state = state.replace(active_sh_degree=3)
    ts = TrainState(params=params, gstate=state, adam=optim.init_adam(params),
                    decoder=None, decoder_adam=None)

    cams = []
    for i in range(n_data):
        th = i * 0.3
        view = transforms.world_to_view(
            np.eye(3), np.array([math.sin(th), 0.0, 4.0 + math.cos(th)]))
        proj = transforms.projection_matrix(0.01, 100.0, 1.0, 0.8) @ view
        cams.append(CameraView(
            view=jnp.asarray(view), proj=jnp.asarray(proj),
            campos=jnp.asarray(
                transforms.camera_center_from_view(view).astype(np.float32)),
            tan_fovx=jnp.float32(math.tan(0.5)),
            tan_fovy=jnp.float32(math.tan(0.4)), width=w, height=h))
    gt_images = jnp.asarray(rng.rand(n_data, h, w, 3).astype(np.float32))
    gt_features = jnp.asarray(
        rng.randn(n_data, h // 2, w // 2, f_dim).astype(np.float32))
    return ts, cams, gt_images, gt_features


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--n_gauss", type=int, default=100_000)
    parser.add_argument("--f_dim", type=int, default=128)
    parser.add_argument("--width", type=int, default=1216)
    parser.add_argument("--height", type=int, default=800)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--instance_capacity", type=int, default=393216)
    parser.add_argument("--tile_capacity", type=int, default=1 << 11)
    parser.add_argument("--backend", type=str, default="auto")
    parser.add_argument("--small", action="store_true",
                        help="tiny shapes for CPU-mesh validation runs")
    parser.add_argument("--cost_only", action="store_true",
                        help="skip the timing loops; emit only the "
                             "compiled-module structural metrics (flops + "
                             "bytes per device) — the fast way to compare "
                             "sharding modes on the virtual CPU mesh")
    parser.add_argument("--shard_gaussians", action="store_true",
                        help="row-shard params/Adam over all mesh devices "
                             "(gather-in, reduce-scatter-out; the memory-"
                             "scaling mode) instead of replicating them")
    parser.add_argument("--shard_instances", action="store_true",
                        help="also shard the O(N) binning/sort/pack/"
                             "segment-sum stages via the tile-owner "
                             "instance exchange (implies/requires "
                             "--shard_gaussians; pallas backend only)")
    args = parser.parse_args(argv)
    if args.small:
        args.n_gauss, args.f_dim = 2_000, 16
        args.width, args.height = 256, 192
        args.instance_capacity, args.tile_capacity = 1 << 14, 1 << 9

    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.bench_utils import profiled_step_ms
    from feature3dgs_tpu.ops import RasterConfig
    from feature3dgs_tpu.parallel import make_mesh, sharded_train_step
    from feature3dgs_tpu.parallel.sharded import stack_cameras
    from feature3dgs_tpu.train.trainer import OptimizationConfig

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    cfg = RasterConfig(instance_capacity=args.instance_capacity,
                       tile_capacity=args.tile_capacity, chunk=128,
                       backend=args.backend)
    ocfg = OptimizationConfig()
    bg = jnp.zeros(3)
    base_ms = None

    for d in sizes:
        n_data = 2 if d % 2 == 0 and d > 1 else 1
        n_tile = d // n_data
        mesh = make_mesh((n_data, n_tile), ("data", "tile"),
                         devices=jax.devices()[:d])
        ts, cams, gt_i, gt_f = build_inputs(
            args.n_gauss, args.f_dim, args.width, args.height, n_data,
            args.n_gauss)
        cam_arrays = stack_cameras(cams)

        state = {"ts": ts}
        step_kwargs = dict(
            mesh=mesh, ocfg=ocfg, rcfg=cfg,
            shard_gaussians=(args.shard_gaussians or args.shard_instances)
            and d > 1,
            shard_instances=args.shard_instances and d > 1)

        def step_and_block():
            state["ts"], m = sharded_train_step(
                state["ts"], cam_arrays, gt_i, gt_f, bg, jnp.int32(1),
                **step_kwargs)
            jax.block_until_ready(m["loss"])

        # per-DEVICE flops of the compiled SPMD module: the structural
        # sharding metric (independent of CPU-thread timing noise)
        gflops_dev = None
        try:
            with jax.set_mesh(mesh):
                cost = sharded_train_step.lower(
                    ts, cam_arrays, gt_i, gt_f, bg, jnp.int32(1),
                    **step_kwargs).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            gflops_dev = float(cost["flops"]) / 1e9
            # bytes accessed: the structural metric for the flop-free
            # stages (sort/scatter/gather/pack/segment-sum) that the
            # instance exchange shards
            gbytes_dev = float(cost.get("bytes accessed", 0.0)) / 1e9
        except Exception as e:  # cost model availability varies by backend
            gbytes_dev = None
            print(f"# cost_analysis unavailable: {e}", file=sys.stderr)

        if args.cost_only:
            step_ms = float("nan")
        else:
            with jax.set_mesh(mesh):
                step_and_block()  # compile (uncommitted inputs)
                step_and_block()  # recompile: outputs come back committed
                if platform in ("tpu", "axon"):
                    step_ms = profiled_step_ms(step_and_block, n=args.iters)
                else:
                    t0 = time.time()
                    for _ in range(args.iters):
                        step_and_block()
                    step_ms = (time.time() - t0) / args.iters * 1000
        # pixels processed per step scales with the data axis
        per_img_ms = step_ms / n_data
        if base_ms is None:
            base_ms, base_step_ms = per_img_ms, step_ms
            base_gflops, base_gbytes = gflops_dev, gbytes_dev
        rec = {
            "devices": d, "mesh": [n_data, n_tile],
            "images_per_step": n_data,
            "platform": platform,
            "backend": cfg.backend,
        }
        if not args.cost_only:
            rec.update({
                "step_ms": round(step_ms, 2),
                "step_ms_ratio_vs_1dev": round(step_ms / base_step_ms, 4),
                "efficiency_vs_1dev": round(base_ms / per_img_ms / d, 4),
            })
        if gflops_dev is not None and base_gflops:
            rec["hlo_gflops_per_device"] = round(gflops_dev, 3)
            # work-per-image vs the 1-device total: 1 = fully sharded,
            # d = fully replicated
            r = gflops_dev * d / n_data / base_gflops
            rec["work_per_image_ratio"] = round(r, 4)
            if d > 1:
                rec["replicated_work_fraction"] = round(
                    max(0.0, (r - 1.0) / (d - 1.0)), 4)
        if gbytes_dev is not None and base_gbytes:
            rec["hlo_gbytes_per_device"] = round(gbytes_dev, 3)
            rb = gbytes_dev * d / n_data / base_gbytes
            rec["bytes_per_image_ratio"] = round(rb, 4)
            if d > 1:
                rec["replicated_bytes_fraction"] = round(
                    max(0.0, (rb - 1.0) / (d - 1.0)), 4)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
