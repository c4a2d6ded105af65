#!/usr/bin/env python
"""Multi-chip scaling-efficiency harness (BASELINE.md config 5).

Runs the dp x sp sharded train step on 1, 2, 4, ... devices of the current
platform and reports steps/s + parallel efficiency vs the single-device
run. On real multi-chip TPU hardware this measures true ICI scaling; under
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`` it
validates the sharded program end-to-end (CPU timings are NOT a scaling
claim — the driver's real-hardware run is).

Prints one JSON line per mesh size:
  {"devices": D, "mesh": [dp, sp], "step_ms": .., "efficiency": ..}
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

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.5, 1.5, (n_gauss, 3)).astype(np.float32)
    params, state = G.create_from_pcd(
        pts, rng.rand(n_gauss, 3).astype(np.float32), max_sh_degree=3,
        feature_dim=f_dim, capacity=capacity,
        knn_mean_dists=np.full(n_gauss, 1e-3, np.float32))
    params = params.replace(semantic_feature=jnp.asarray(
        rng.randn(params.capacity, 1, f_dim).astype(np.float32) * 0.1))
    state = state.replace(active_sh_degree=3)

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
    return params, state, optim.init_adam(params), cams, gt_images, gt_features


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--n_gauss", type=int, default=50_000)
    parser.add_argument("--f_dim", type=int, default=32)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--instance_capacity", type=int, default=1 << 18)
    parser.add_argument("--tile_capacity", type=int, default=1 << 10)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.model import optim
    from feature3dgs_tpu.ops import RasterConfig
    from feature3dgs_tpu.parallel import make_mesh, sharded_train_step
    from feature3dgs_tpu.parallel.sharded import stack_cameras

    n_dev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    cfg = RasterConfig(instance_capacity=args.instance_capacity,
                       tile_capacity=args.tile_capacity, chunk=64)
    lrs = optim.group_lrs(optim.LRConfig(), 1, 1.0)
    bg = jnp.zeros(3)
    base_ms = None

    for d in sizes:
        n_data = 2 if d % 2 == 0 and d > 1 else 1
        n_tile = d // n_data
        mesh = make_mesh((n_data, n_tile), ("data", "tile"),
                         devices=jax.devices()[:d])
        params, state, adam, cams, gt_i, gt_f = build_inputs(
            args.n_gauss, args.f_dim, args.width, args.height, n_data,
            args.n_gauss)

        def one_step(p, a):
            return sharded_train_step(
                p, state, a, {}, stack_cameras(cams[:n_data]),
                gt_i[:n_data], gt_f[:n_data], bg, lrs, mesh=mesh,
                config=cfg, width=args.width, height=args.height)

        with jax.set_mesh(mesh):
            p, a, m, _ = one_step(params, adam)
            jax.block_until_ready(m["loss"])
            t0 = time.time()
            for _ in range(args.iters):
                p, a, m, _ = one_step(p, a)
            jax.block_until_ready(m["loss"])
        # pixels processed per step scales with the data axis
        step_ms = (time.time() - t0) / args.iters * 1000
        per_px_ms = step_ms / n_data
        if base_ms is None:
            base_ms = per_px_ms
        eff = base_ms / (per_px_ms * d) * 1  # ideal: per-image time / d
        print(json.dumps({
            "devices": d, "mesh": [n_data, n_tile],
            "step_ms": round(step_ms, 2),
            "images_per_step": n_data,
            "efficiency_vs_1dev": round(base_ms / per_px_ms / d, 4),
            "platform": jax.devices()[0].platform,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
