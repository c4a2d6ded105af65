"""Shared test helpers: synthetic scenes and cameras."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from feature3dgs_tpu.core import transforms
from feature3dgs_tpu.core.projection import CameraView


def make_camera(width=64, height=48, fovx=1.0, fovy=0.8, cam_z=-4.0):
    """Camera at (0,0,cam_z) looking down +z at the origin."""
    R = np.eye(3)
    t = np.array([0.0, 0.0, -cam_z])
    view = transforms.world_to_view(R, t)
    proj = transforms.projection_matrix(0.01, 100.0, fovx, fovy) @ view
    campos = transforms.camera_center_from_view(view)
    return CameraView(
        view=jnp.asarray(view),
        proj=jnp.asarray(proj),
        campos=jnp.asarray(campos),
        tan_fovx=jnp.float32(np.tan(fovx / 2)),
        tan_fovy=jnp.float32(np.tan(fovy / 2)),
        width=width,
        height=height,
    )


def random_gaussians(n=200, f_dim=8, seed=0, spread=1.5, scale_lo=-3.5,
                     scale_hi=-1.5, max_sh_degree=2):
    rng = np.random.RandomState(seed)
    m = (max_sh_degree + 1) ** 2
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return {
        "means3d": jnp.asarray(rng.uniform(-spread, spread, (n, 3)).astype(np.float32)),
        "scales": jnp.asarray(np.exp(rng.uniform(scale_lo, scale_hi, (n, 3))).astype(np.float32)),
        "rotations": jnp.asarray(q.astype(np.float32)),
        "opacities": jnp.asarray(rng.uniform(0.2, 0.95, (n,)).astype(np.float32)),
        "shs": jnp.asarray(rng.randn(n, m, 3).astype(np.float32) * 0.3),
        "feat": jnp.asarray(rng.randn(n, f_dim).astype(np.float32)),
    }
