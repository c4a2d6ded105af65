"""Viewer/debug render modes: depth colormap, edges, normals, curvature,
feature-PCA — behavior of /root/reference/utils/image_utils.py:27-161.

All functions take HWC float arrays (jnp or np) and return HWC float images
in [0, 1] (colormap returns RGB).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

RENDER_ITEMS = ["RGB", "Depth", "Edge", "Normal", "Curvature", "Feature Map"]


def gradient_map(image: jnp.ndarray) -> jnp.ndarray:
    """Sobel edge magnitude (image_utils.py:60-69). HWC in, HW1 out."""
    sx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 4
    sy = sx.T
    x = image.transpose(2, 0, 1)[:, None]  # C,1,H,W
    gx = jax.lax.conv_general_dilated(x, sx[None, None], (1, 1),
                                      [(1, 1), (1, 1)])
    gy = jax.lax.conv_general_dilated(x, sy[None, None], (1, 1),
                                      [(1, 1), (1, 1)])
    mag = jnp.sqrt(gx ** 2 + gy ** 2)[:, 0]           # C,H,W
    return jnp.linalg.norm(mag, axis=0)[..., None]     # H,W,1


def depth_to_points(depth: jnp.ndarray, proj_full: jnp.ndarray,
                    znear=0.01, zfar=100.0) -> jnp.ndarray:
    """Unproject a rendered (view-space z) depth map to world points.

    Reference: image_utils.py:95-132. Our depth buffer stores view z
    (forward.cu:366); NDC z = (A z + B)/z with A = zfar/(zfar-znear),
    B = -zfar*znear/(zfar-znear) (transforms.projection_matrix).
    """
    h, w = depth.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    X, Y = jnp.meshgrid(xs, ys)
    xn = (X / (w - 1)) * 2 - 1
    yn = (Y / (h - 1)) * 2 - 1
    a = zfar / (zfar - znear)
    b = -zfar * znear / (zfar - znear)
    z_safe = jnp.maximum(depth, 1e-8)
    ndc_z = (a * z_safe + b) / z_safe
    ndc = jnp.stack([xn, yn, ndc_z, jnp.ones_like(xn)], axis=-1)  # H,W,4
    # clip coords = ndc * w_clip, and w_clip = view z for our projection
    clip = ndc * z_safe[..., None]
    inv = jnp.linalg.inv(proj_full)
    world = clip @ inv.T
    return world[..., :3] / jnp.maximum(jnp.abs(world[..., 3:]), 1e-8) * jnp.sign(world[..., 3:])


def depth_to_normal(depth: jnp.ndarray, proj_full: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference cross-product normals (image_utils.py:71-93)."""
    pts = depth_to_points(depth, proj_full)
    padded = jnp.zeros((pts.shape[0] + 1, pts.shape[1] + 1, 3), pts.dtype)
    padded = padded.at[:-1, :-1].set(pts)
    p1 = padded[:-1, :-1]
    p2 = padded[1:, :-1]
    p3 = padded[:-1, 1:]
    n = jnp.cross(p2 - p1, p3 - p1)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)


def colormap(x: jnp.ndarray, cmap: str = "turbo") -> np.ndarray:
    """Min-max normalize + matplotlib colormap (image_utils.py:134-139)."""
    import matplotlib.cm as cm
    x = np.asarray(x).squeeze()
    x = (x - x.min()) / max(float(x.max() - x.min()), 1e-12)
    colors = np.asarray(cm.get_cmap(cmap).colors if hasattr(cm.get_cmap(cmap), "colors")
                        else cm.get_cmap(cmap)(np.linspace(0, 1, 256))[:, :3])
    idx = np.clip(np.round(x * (len(colors) - 1)).astype(int), 0, len(colors) - 1)
    return colors[idx].astype(np.float32)


def feature_pca_vis(feature: jnp.ndarray, stride: int = 3,
                    seed: int = 42) -> np.ndarray:
    """3-component PCA visualization of an HWC feature map, matching
    render.py:38-53 (L2-normalize channels, PCA on every 3rd pixel,
    1/99-percentile contrast stretch)."""
    f = np.asarray(feature, np.float64)
    h, w, c = f.shape
    flat = f.reshape(-1, c)
    norm = np.linalg.norm(flat, axis=1, keepdims=True)
    flat = flat / np.maximum(norm, 1e-12)
    samples = flat[::stride]
    mean = samples.mean(0)
    centered = samples - mean
    # PCA via SVD (sklearn PCA equivalent up to component sign)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    comps = vt[:3]
    transformed = centered @ comps.T
    q1, q99 = np.percentile(transformed, [1, 99])
    vis = (flat - mean) @ comps.T
    vis = (vis - q1) / max(q99 - q1, 1e-12)
    return np.clip(vis, 0.0, 1.0).reshape(h, w, 3).astype(np.float32)


def render_net_image(render_pkg: dict, render_items, render_mode: int,
                     proj_full) -> np.ndarray:
    """Select + post-process a GUI channel (image_utils.py:141-161).
    render_pkg uses our HWC conventions: keys color [H,W,3],
    feature [H,W,F], depth [H,W]."""
    output = render_items[render_mode].lower()
    if output == "depth":
        return colormap(render_pkg["depth"])
    if output == "edge":
        return colormap(gradient_map(render_pkg["color"]))
    if output == "normal":
        n = depth_to_normal(jnp.asarray(render_pkg["depth"]), jnp.asarray(proj_full))
        return np.asarray((n + 1) / 2)
    if output == "curvature":
        n = (depth_to_normal(jnp.asarray(render_pkg["depth"]),
                             jnp.asarray(proj_full)) + 1) / 2
        return colormap(gradient_map(n))
    if output == "feature map":
        return feature_pca_vis(render_pkg["feature"])
    return np.asarray(render_pkg["color"])
