"""Built-in web viewer: HTTP round-trip on a synthetic model (all render
modes return PNGs), plus orbit-camera geometry sanity."""
import json
import os
import sys
import urllib.request

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.utils import random_gaussians
from feature3dgs_tpu.ops import RasterConfig, rasterize
from feature3dgs_tpu.viewer.web import WebViewer, orbit_camera, estimate_up


def test_orbit_camera_looks_at_center():
    """The orbit target must project to the image center with positive
    view depth, for several az/el and world-up choices."""
    center = np.array([0.3, -0.2, 1.0])
    for up in ([0, -1, 0], [0, 0, 1]):
        for az, el in [(0.0, 0.0), (1.1, 0.4), (-2.0, -0.7)]:
            cam = orbit_camera(center, 2.5, az, el, 64, 48,
                               np.deg2rad(50), np.asarray(up, np.float64))
            view = cam.view
            c_cam = view[:3, :3] @ center + view[:3, 3]
            assert c_cam[2] > 2.4, c_cam           # forward, ~radius away
            assert abs(c_cam[0]) < 1e-6 and abs(c_cam[1]) < 1e-6, c_cam
            # camera center sits on the sphere
            assert abs(np.linalg.norm(cam.camera_center - center) - 2.5) < 1e-6


def test_estimate_up():
    # identity c2w rotation -> camera up is -y
    entries = [{"rotation": np.eye(3).tolist()}] * 3
    np.testing.assert_allclose(estimate_up(entries), [0, -1, 0], atol=1e-12)
    np.testing.assert_allclose(estimate_up(None), [0, -1, 0])


def test_web_viewer_http_roundtrip():
    gt = random_gaussians(n=80, f_dim=4, seed=5, max_sh_degree=2)
    rcfg = RasterConfig(instance_capacity=1 << 12, tile_capacity=1 << 9,
                        chunk=16)

    def render_fn(cam, scaling_modifier):
        out = rasterize(gt["means3d"], gt["opacities"], gt["feat"],
                        cam.to_view(), scales=gt["scales"] * scaling_modifier,
                        rotations=gt["rotations"], shs=gt["shs"],
                        sh_degree=2, config=rcfg)
        return {"color": np.asarray(out.color),
                "feature": np.asarray(out.feature),
                "depth": np.asarray(out.depth)}

    viewer = WebViewer(render_fn, center=[0, 0, 0], radius=4.0,
                       n_gaussians=80, feature_dim=4, port=0)
    viewer.serve_background()
    base = f"http://127.0.0.1:{viewer.port}"
    try:
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "feature3dgs_tpu" in page and "/render?" in page

        info = json.loads(urllib.request.urlopen(base + "/info").read())
        assert info["n_gaussians"] == 80
        assert info["modes"][0] == "RGB" and len(info["modes"]) == 6

        for mode in range(6):
            resp = urllib.request.urlopen(
                base + f"/render?az=0.5&el=0.3&r=4&w=64&h=48&mode={mode}")
            png = resp.read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n", (mode, png[:8])
            assert float(resp.headers["X-Render-Ms"]) > 0
        # scaling modifier changes the image
        a = urllib.request.urlopen(
            base + "/render?w=64&h=48&scaling=1.0").read()
        b = urllib.request.urlopen(
            base + "/render?w=64&h=48&scaling=0.3").read()
        assert a != b
    finally:
        viewer.close()
