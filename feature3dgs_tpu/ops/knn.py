"""3-nearest-neighbor mean squared distance for Gaussian scale init.

Replaces the reference's simple-knn CUDA extension
(/root/reference/submodules/simple-knn/simple_knn.cu:185-221, exposed as
``distCUDA2``). This runs once at scene setup on the host, so the TPU-native
choice is a fast native/host implementation, not a device kernel:

  1. C++ grid/Morton KNN from feature3dgs_tpu.native (preferred, same
     algorithmic family as simple-knn);
  2. scipy cKDTree fallback;
  3. brute-force numpy for tiny inputs / missing deps.

Note the reference computes the mean of SQUARED distances to the 3 nearest
neighbors (simple_knn.cu boxMeanDist accumulates squared dists / 3).
"""
from __future__ import annotations

import numpy as np


def _brute(points: np.ndarray) -> np.ndarray:
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    k = min(3, points.shape[0] - 1)
    if k <= 0:
        return np.full((points.shape[0],), 1e-6, np.float32)
    nearest = np.sort(d2, axis=1)[:, :k]
    return nearest.mean(axis=1).astype(np.float32)


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    """[N,3] -> [N] mean squared distance to each point's 3 nearest neighbors."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    if n <= 4:
        return _brute(points)
    try:
        from feature3dgs_tpu.native import loader as native
        if native.available():
            return native.knn_mean_sq_dist(points)
    except Exception:
        pass
    try:
        from scipy.spatial import cKDTree
        tree = cKDTree(points)
        dists, _ = tree.query(points, k=4, workers=-1)  # self + 3 NN
        return (dists[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    except ImportError:
        pass
    return _brute(points)
