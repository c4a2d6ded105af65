"""Gaussian scene PLY snapshots, schema-compatible with the reference.

Field order and names exactly match construct_list_of_attributes
(/root/reference/scene/gaussian_model.py:192-229): x y z, nx ny nz (zeros),
f_dc_{0..2}, f_rest_{...} (channel-major: the [M-1, 3] block is transposed to
[3, M-1] then flattened, matching the reference's ``transpose(1, 2).flatten``
on its [N, M-1, 3] tensors), opacity, scale_{0..2}, rot_{0..3},
semantic_{0..F-1}. A PLY written here loads in the reference codebase and
vice versa.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from feature3dgs_tpu.data.ply import read_ply, write_ply
from feature3dgs_tpu.model.gaussians import GaussianParams, GaussianState


def save_gaussians_ply(path: str, params: GaussianParams,
                       state: GaussianState | None = None):
    if state is not None:
        keep = np.asarray(state.alive)
    else:
        keep = np.ones((params.capacity,), bool)
    xyz = np.asarray(params.xyz)[keep]
    n = xyz.shape[0]
    f_dc = np.asarray(params.features_dc)[keep]          # [n,1,3]
    f_rest = np.asarray(params.features_rest)[keep]      # [n,M-1,3]
    opacity = np.asarray(params.opacity)[keep][:, 0]
    scaling = np.asarray(params.scaling)[keep]
    rotation = np.asarray(params.rotation)[keep]
    sem = np.asarray(params.semantic_feature)[keep]      # [n,1,F]

    fields: dict[str, np.ndarray] = {}
    for i, ax in enumerate("xyz"):
        fields[ax] = xyz[:, i].astype(np.float32)
    for ax in ("nx", "ny", "nz"):
        fields[ax] = np.zeros(n, np.float32)
    dc_t = f_dc.transpose(0, 2, 1).reshape(n, -1)        # channel-major
    for i in range(dc_t.shape[1]):
        fields[f"f_dc_{i}"] = dc_t[:, i].astype(np.float32)
    rest_t = f_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(rest_t.shape[1]):
        fields[f"f_rest_{i}"] = rest_t[:, i].astype(np.float32)
    fields["opacity"] = opacity.astype(np.float32)
    for i in range(scaling.shape[1]):
        fields[f"scale_{i}"] = scaling[:, i].astype(np.float32)
    for i in range(rotation.shape[1]):
        fields[f"rot_{i}"] = rotation[:, i].astype(np.float32)
    sem_t = sem.transpose(0, 2, 1).reshape(n, -1)
    for i in range(sem_t.shape[1]):
        fields[f"semantic_{i}"] = sem_t[:, i].astype(np.float32)
    write_ply(path, fields)


def load_gaussians_ply(path: str, *, max_sh_degree: int = 3,
                       capacity: int | None = None):
    """Load a reference-schema PLY (gaussian_model.py:236-281).

    Returns (GaussianParams, GaussianState) with active_sh_degree set to
    max_sh_degree like the reference loader (:281).
    """
    cols = read_ply(path)
    n = cols["x"].shape[0]
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < {n}")

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    opacity = cols["opacity"][:, None]
    dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)  # [n,3]
    m = (max_sh_degree + 1) ** 2
    rest_names = sorted((k for k in cols if k.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    if len(rest_names) != 3 * (m - 1):
        raise ValueError(
            f"{path}: expected {3 * (m - 1)} f_rest fields, got {len(rest_names)}")
    rest = np.stack([cols[k] for k in rest_names], axis=1).reshape(n, 3, m - 1)
    sem_names = sorted((k for k in cols if k.startswith("semantic_")),
                       key=lambda s: int(s.split("_")[-1]))
    sem = np.stack([cols[k] for k in sem_names], axis=1)[:, None, :] \
        if sem_names else np.zeros((n, 1, 0), np.float32)
    scale_names = sorted((k for k in cols if k.startswith("scale_")),
                         key=lambda s: int(s.split("_")[-1]))
    scaling = np.stack([cols[k] for k in scale_names], axis=1)
    rot_names = sorted((k for k in cols if k.startswith("rot_")),
                       key=lambda s: int(s.split("_")[-1]))
    rotation = np.stack([cols[k] for k in rot_names], axis=1)

    def pad(x):
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = GaussianParams(
        xyz=pad(xyz),
        features_dc=pad(dc.transpose(0, 1)[:, None, :]),          # [n,1,3]
        features_rest=pad(rest.transpose(0, 2, 1)),               # [n,M-1,3]
        scaling=pad(scaling),
        rotation=pad(rotation),
        opacity=pad(opacity),
        semantic_feature=pad(sem),
    )
    alive = np.zeros((cap,), bool)
    alive[:n] = True
    state = GaussianState(
        alive=jnp.asarray(alive),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_gradient_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
        active_sh_degree=max_sh_degree,
        spatial_lr_scale=1.0,
    )
    return params, state
