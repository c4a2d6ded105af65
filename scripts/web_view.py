#!/usr/bin/env python
"""Built-in browser viewer — interactive orbit viewing of a trained scene
without the external SIBR app (counterpart of /root/reference's
SIBR_remoteGaussian_app; see viewer/web.py).

    python scripts/web_view.py -m <model_path> [--iteration N] [--port 8090]

then open http://127.0.0.1:8090 (port-forward when the model lives on a
TPU VM). Drag = orbit, wheel = zoom, shift-drag = pan; all render channels
(RGB/Depth/Edge/Normal/Curvature/Feature-PCA) and the Gaussian scaling
slider of the SIBR protocol are available.
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = ArgumentParser(description="Web viewer parameters")
    from feature3dgs_tpu import config as C
    C.add_model_args(parser)
    C.add_pipeline_args(parser)
    C.add_raster_args(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8090)
    args = C.combine_with_saved(parser, argv)
    mcfg = C.extract_model(args)
    rcfg = C.extract_raster(args)

    import jax.numpy as jnp
    from feature3dgs_tpu.model.ply_io import load_gaussians_ply
    from feature3dgs_tpu.render import renderer
    from feature3dgs_tpu.viewer.web import WebViewer, estimate_up

    iteration = args.iteration
    if iteration == -1:
        pc_dir = os.path.join(mcfg.model_path, "point_cloud")
        iteration = max(int(d.split("_")[-1]) for d in os.listdir(pc_dir))
    params, state = load_gaussians_ply(
        os.path.join(mcfg.model_path, "point_cloud",
                     f"iteration_{iteration}", "point_cloud.ply"),
        max_sh_degree=mcfg.sh_degree)
    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if mcfg.white_background else [0.0, 0.0, 0.0])

    alive = np.asarray(state.alive)
    xyz = np.asarray(params.xyz)[alive]
    center = xyz.mean(axis=0)
    radius = float(np.percentile(np.linalg.norm(xyz - center, axis=1), 90))

    cams_json = None
    cams_path = os.path.join(mcfg.model_path, "cameras.json")
    if os.path.exists(cams_path):
        with open(cams_path) as f:
            cams_json = json.load(f)

    def render_fn(cam, scaling_modifier):
        out = renderer.render(params, state, cam.to_view(), bg=bg,
                              config=rcfg, scaling_modifier=scaling_modifier)
        return {"color": np.asarray(out.color),
                "feature": np.asarray(out.feature),
                "depth": np.asarray(out.depth)}

    viewer = WebViewer(
        render_fn, center=center, radius=max(radius, 1e-3),
        up=estimate_up(cams_json), n_gaussians=int(state.num_active),
        feature_dim=int(params.semantic_feature.shape[-1]),
        source=mcfg.source_path or mcfg.model_path,
        host=args.ip, port=args.port)
    print(f"Serving {int(state.num_active)} gaussians at "
          f"http://{args.ip}:{viewer.port}/  (ctrl-c to stop)")
    viewer.serve_forever()


if __name__ == "__main__":
    main()
