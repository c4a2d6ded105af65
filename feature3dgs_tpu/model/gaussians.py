"""Gaussian scene parameters as a functional pytree.

The JAX redesign of the reference's stateful ``GaussianModel``
(/root/reference/scene/gaussian_model.py:24-160). Parameters and training
statistics are immutable pytrees; density control returns new ones.

Static-capacity design: all arrays are padded to a fixed ``capacity`` so
every train step jits once; ``alive`` marks real rows. Dead rows have
opacity activation forced to 0 and are additionally culled before binning
(rasterize's valid mask), so they cost no compositing work. When
densification needs more rows, the host grows capacity in buckets and the
step re-jits (rare; geometric growth).

Parameter layout matches the reference exactly (scene/gaussian_model.py:44-60,
133-160): xyz [P,3]; features_dc [P,1,3]; features_rest [P,M-1,3] (SH rest
coefficients, M=(max_sh_degree+1)^2); scaling [P,3] log-space; rotation [P,4]
unnormalized quaternions; opacity [P,1] logit-space; semantic_feature [P,1,F].
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from feature3dgs_tpu.core.sh import num_sh_coeffs, rgb_to_sh_dc


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@struct.dataclass
class GaussianParams:
    """Learnable parameters (the 7 Adam groups of gaussian_model.py:168-176)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    semantic_feature: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        return int(round((1 + self.features_rest.shape[1]) ** 0.5)) - 1

    @property
    def feature_dim(self) -> int:
        return self.semantic_feature.shape[-1]


@struct.dataclass
class GaussianState:
    """Non-learnable training state (densification statistics + liveness)."""

    alive: jnp.ndarray               # [P] bool
    max_radii2d: jnp.ndarray         # [P]
    xyz_gradient_accum: jnp.ndarray  # [P]
    denom: jnp.ndarray               # [P]
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    spatial_lr_scale: float = struct.field(pytree_node=False, default=1.0)

    @property
    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))


# ---------------------------------------------------------------------------
# activations (gaussian_model.py:26-41)
# ---------------------------------------------------------------------------

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    # rsqrt of a clamped square-norm: jnp.linalg.norm has a NaN gradient at
    # exactly-zero rows (d|x|/dx = x/|x|), and capacity-padding rows are
    # all-zero — their zero cotangent times NaN would poison the rotation
    # (and via preprocess every geometric) gradient of dead rows each step.
    sq = jnp.sum(p.rotation * p.rotation, axis=-1, keepdims=True)
    return p.rotation * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


def get_opacity(p: GaussianParams, alive: jnp.ndarray | None = None) -> jnp.ndarray:
    op = jax.nn.sigmoid(p.opacity[:, 0])
    if alive is not None:
        op = jnp.where(alive, op, 0.0)
    return op


def get_features(p: GaussianParams) -> jnp.ndarray:
    """[P, M, 3] full SH coefficient stack (DC first)."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def get_semantic(p: GaussianParams) -> jnp.ndarray:
    """[P, F] flattened semantic feature vectors."""
    return p.semantic_feature[:, 0, :]


# ---------------------------------------------------------------------------
# construction
# ---------------------------------------------------------------------------

def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    *,
    max_sh_degree: int = 3,
    feature_dim: int = 128,
    speedup: bool = False,
    capacity: int | None = None,
    knn_mean_dists: np.ndarray | None = None,
) -> tuple[GaussianParams, GaussianState]:
    """Initialize from a point cloud (gaussian_model.py:133-160).

    * initial scale = log sqrt(mean squared distance of the 3 nearest
      neighbors), clamped below at 1e-7 (reference :146-147);
    * identity quaternions, opacity = inverse_sigmoid(0.1);
    * SH DC from RGB, higher bands zero; semantic features zero
      (divided by 4 when the speed-up decoder is active, :141-143).
    """
    n = points.shape[0]
    if capacity is None:
        capacity = n
    if capacity < n:
        raise ValueError(f"capacity {capacity} < number of points {n}")
    if speedup:
        feature_dim = feature_dim // 4
    m = num_sh_coeffs(max_sh_degree)

    if knn_mean_dists is None:
        from feature3dgs_tpu.ops.knn import mean_sq_dist_3nn
        knn_mean_dists = mean_sq_dist_3nn(points)
    dist2 = np.maximum(np.asarray(knn_mean_dists), 1e-7)

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out)

    scales = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1)
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    dc = np.asarray(rgb_to_sh_dc(colors.astype(np.float32)))[:, None, :]

    params = GaussianParams(
        xyz=pad(points.astype(np.float32)),
        features_dc=pad(dc),
        features_rest=pad(np.zeros((n, m - 1, 3), np.float32)),
        scaling=pad(scales.astype(np.float32)),
        rotation=pad(rots),
        opacity=pad(np.full((n, 1), float(np.log(0.1 / 0.9)), np.float32)),
        semantic_feature=pad(np.zeros((n, 1, feature_dim), np.float32)),
    )
    alive = np.zeros((capacity,), bool)
    alive[:n] = True
    state = GaussianState(
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
        active_sh_degree=0,
        spatial_lr_scale=1.0,
    )
    return params, state


def grow_capacity(params: GaussianParams, state: GaussianState,
                  new_capacity: int,
                  opt_state: Any | None = None):
    """Pad all arrays to a larger capacity (host-side, triggers re-jit)."""
    old = params.capacity
    if new_capacity <= old:
        return (params, state) if opt_state is None else (params, state, opt_state)
    pad_n = new_capacity - old

    def pad(x):
        if not hasattr(x, "ndim") or x.ndim == 0 or x.shape[0] != old:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad_n,) + x.shape[1:], x.dtype)], axis=0)

    params = jax.tree.map(pad, params)
    state = state.replace(
        alive=jnp.concatenate([state.alive, jnp.zeros((pad_n,), bool)]),
        max_radii2d=pad(state.max_radii2d),
        xyz_gradient_accum=pad(state.xyz_gradient_accum),
        denom=pad(state.denom),
    )
    if opt_state is None:
        return params, state
    opt_state = jax.tree.map(pad, opt_state)
    return params, state, opt_state


def one_up_sh_degree(state: GaussianState, max_degree: int) -> GaussianState:
    if state.active_sh_degree < max_degree:
        return state.replace(active_sh_degree=state.active_sh_degree + 1)
    return state
