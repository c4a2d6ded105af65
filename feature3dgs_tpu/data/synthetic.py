"""Tiny in-memory synthetic scenes (no files) for dry runs and tests.

Deterministic given the seed, so independently-constructed copies on
different hosts are bitwise identical — the multi-host tests rely on that.
"""
from __future__ import annotations

import math

import numpy as np


def synthetic_scene(n_cams=6, w=64, h=48, n_pts=256, f_dim=8, seed=0):
    """A small SceneData: cameras fanned around the origin looking at a
    random point cloud, random GT images + half-res feature maps."""
    from feature3dgs_tpu.data.cameras import Camera
    from feature3dgs_tpu.data.dataset import SceneData
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-1.5, 1.5, (n_pts, 3)).astype(np.float32)
    cols = rng.rand(n_pts, 3).astype(np.float32)
    cams = []
    for i in range(n_cams):
        ang = 0.15 * (i - n_cams / 2)
        R = np.array([[math.cos(ang), 0, math.sin(ang)],
                      [0, 1, 0],
                      [-math.sin(ang), 0, math.cos(ang)]], np.float32)
        cams.append(Camera(
            uid=i, colmap_id=i, R=R, T=np.array([0.0, 0.0, 4.0], np.float32),
            fovx=1.0, fovy=0.8,
            image=rng.rand(h, w, 3).astype(np.float32),
            image_name=f"synth_{i}",
            semantic_feature=rng.randn(h // 2, w // 2, f_dim).astype(
                np.float32) * 0.1,
            width=w, height=h))
    return SceneData(train_cameras=cams, test_cameras=[], points=pts,
                     colors=cols, nerf_norm={"radius": 4.0},
                     feature_dim=f_dim, source_path="<synthetic>")
