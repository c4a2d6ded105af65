#!/usr/bin/env python
"""Standalone viewer server — counterpart of /root/reference/view.py.

Loads a trained scene and serves the SIBR remote viewer protocol without
training (view.py:9-35).
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = ArgumentParser(description="Viewing script parameters")
    from feature3dgs_tpu import config as C
    C.add_model_args(parser)
    C.add_pipeline_args(parser)
    C.add_raster_args(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    args = C.combine_with_saved(parser, argv)
    mcfg = C.extract_model(args)
    rcfg = C.extract_raster(args)

    import jax.numpy as jnp
    from feature3dgs_tpu.model.ply_io import load_gaussians_ply
    from feature3dgs_tpu.render import renderer
    from feature3dgs_tpu.render.modes import RENDER_ITEMS, render_net_image
    from feature3dgs_tpu.viewer.network_gui import NetworkGUI

    iteration = args.iteration
    if iteration == -1:
        pc_dir = os.path.join(mcfg.model_path, "point_cloud")
        iteration = max(int(d.split("_")[-1]) for d in os.listdir(pc_dir))
    params, state = load_gaussians_ply(
        os.path.join(mcfg.model_path, "point_cloud",
                     f"iteration_{iteration}", "point_cloud.ply"),
        max_sh_degree=mcfg.sh_degree)
    bg = jnp.asarray([1.0, 1.0, 1.0] if mcfg.white_background else [0.0, 0.0, 0.0])

    gui = NetworkGUI(args.ip, args.port)
    print(f"Serving {int(state.num_active)} gaussians on {args.ip}:{args.port}")
    while True:
        if gui.conn is None:
            gui.try_connect(list(RENDER_ITEMS))
            continue
        try:
            cam = gui.receive()
            img = None
            if cam is not None:
                out = renderer.render(params, state, cam.to_view(), bg=bg,
                                      config=rcfg,
                                      scaling_modifier=cam.scaling_modifier)
                pkg = {"color": np.asarray(out.color),
                       "feature": np.asarray(out.feature),
                       "depth": np.asarray(out.depth)}
                img = render_net_image(pkg, list(RENDER_ITEMS),
                                       cam.render_mode, cam.proj_full)
            gui.send(img, mcfg.source_path,
                     {"#": int(state.num_active), "loss": 0.0})
        except (ConnectionError, OSError):
            gui.disconnect()


if __name__ == "__main__":
    main()
