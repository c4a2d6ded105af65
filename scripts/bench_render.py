#!/usr/bin/env python
"""Inference (forward-render) throughput — the FPS half of the reference's
performance story ("significantly faster to both train and render",
README.md:13; the CVPR paper headlines real-time semantic rendering).

Renders RGB + F-dim features + depth forward-only at the bench scene scale
and prints FPS per configuration as JSON lines (profiler device spans, same
methodology as bench.py).
"""
from __future__ import annotations

import json
import math
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = ArgumentParser()
    ap.add_argument("--n_gauss", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--f_dims", type=int, nargs="+", default=[16, 128, 256])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1,
                    help="frames per batched render call "
                         "(renderer.render_batch; amortizes the per-frame "
                         "preprocess/binning fixed cost)")
    ap.add_argument("--instance_capacity", type=int, default=393216)
    ap.add_argument("--tile_capacity", type=int, default=1 << 11)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from feature3dgs_tpu.bench_utils import profiled_step_ms
    from feature3dgs_tpu.core import transforms
    from feature3dgs_tpu.core.projection import CameraView
    from feature3dgs_tpu.model import gaussians as G
    from feature3dgs_tpu.ops import RasterConfig
    from feature3dgs_tpu.render import renderer

    rng = np.random.RandomState(0)
    pts = rng.uniform(-2.0, 2.0, (args.n_gauss, 3)).astype(np.float32)
    view = transforms.world_to_view(np.eye(3), np.array([0.0, 0.0, 5.0]))
    proj = transforms.projection_matrix(0.01, 100.0, 1.2, 0.9) @ view
    cam = CameraView(
        view=jnp.asarray(view), proj=jnp.asarray(proj),
        campos=jnp.asarray(
            transforms.camera_center_from_view(view).astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(0.6)),
        tan_fovy=jnp.float32(math.tan(0.45)),
        width=args.width, height=args.height)
    rcfg = RasterConfig(instance_capacity=args.instance_capacity,
                        tile_capacity=args.tile_capacity, chunk=128)
    platform = jax.devices()[0].platform

    if args.batch > 1:
        # distinct viewpoints: orbit the camera around z by small angles
        def orbit(theta):
            c, s = math.cos(theta), math.sin(theta)
            R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
            v = transforms.world_to_view(R, np.array([0.0, 0.0, 5.0]))
            return CameraView(
                view=jnp.asarray(v),
                proj=jnp.asarray(
                    transforms.projection_matrix(0.01, 100.0, 1.2, 0.9) @ v),
                campos=jnp.asarray(transforms.camera_center_from_view(
                    v).astype(np.float32)),
                tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
                width=args.width, height=args.height)
        import jax as _jax
        cam = _jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[orbit(0.05 * i) for i in range(args.batch)])

    for f_dim in args.f_dims:
        params, state = G.create_from_pcd(
            pts, rng.rand(args.n_gauss, 3).astype(np.float32),
            max_sh_degree=3, feature_dim=f_dim, capacity=args.n_gauss,
            knn_mean_dists=np.full(args.n_gauss, 2e-4, np.float32))
        params = params.replace(
            semantic_feature=jnp.asarray(
                rng.randn(args.n_gauss, 1, f_dim).astype(np.float32) * 0.1),
            opacity=jnp.zeros((args.n_gauss, 1)))
        state = state.replace(active_sh_degree=3)

        @jax.jit
        def render(params, state=state):
            fn = renderer.render_batch if args.batch > 1 else renderer.render
            out = fn(params, state, cam, config=rcfg)
            return out.color, out.feature, out.depth

        outs = render(params)
        jax.block_until_ready(outs)

        def step():
            jax.block_until_ready(render(params))

        if platform in ("tpu", "axon"):
            ms = profiled_step_ms(step, n=args.iters)
        else:
            import time
            t0 = time.time()
            for _ in range(args.iters):
                step()
            ms = (time.time() - t0) / args.iters * 1000
        print(json.dumps({
            "metric": "forward-render FPS (RGB+feat+depth)",
            "f_dim": f_dim, "render_ms": round(ms / args.batch, 2),
            "fps": round(1000.0 * args.batch / ms, 1),
            "batch": args.batch,
            "image": [args.width, args.height], "n_gauss": args.n_gauss,
            "platform": platform,
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
