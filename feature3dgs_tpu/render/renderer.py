"""High-level render binding: GaussianParams -> rasterizer.

The functional analog of /root/reference/gaussian_renderer/__init__.py:173-261
— applies activations (exp scaling, normalized quaternion, sigmoid opacity),
selects the SH or precomputed-color path, optionally precomputes cov3D
"in python" (here: outside the compositing custom_vjp — it is all one XLA
program either way; the flags exist for parity/testing), and calls rasterize.
"""
from __future__ import annotations

import jax.numpy as jnp

from feature3dgs_tpu.core import sh as sh_lib
from feature3dgs_tpu.core.projection import CameraView, build_cov3d
from feature3dgs_tpu.model import gaussians as G
from feature3dgs_tpu.ops import (RasterConfig, RasterOutput, rasterize,
                                 rasterize_batch)


def render(
    params: G.GaussianParams,
    state: G.GaussianState,
    cam: CameraView,
    *,
    bg: jnp.ndarray | None = None,
    config: RasterConfig = RasterConfig(),
    scaling_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
    override_opacity: jnp.ndarray | None = None,
    override_sh: jnp.ndarray | None = None,
    convert_shs_outside: bool = False,
    compute_cov3d_outside: bool = False,
    ndc_offset: jnp.ndarray | None = None,
) -> RasterOutput:
    opacity = (override_opacity if override_opacity is not None
               else G.get_opacity(params))
    opacity = jnp.where(state.alive, opacity, 0.0)

    scales = rotations = cov3d = None
    if compute_cov3d_outside:
        cov3d = build_cov3d(G.get_scaling(params), G.get_rotation(params),
                            scaling_modifier)
    else:
        scales = G.get_scaling(params)
        rotations = G.get_rotation(params)

    shs = colors = None
    if override_color is not None:
        colors = override_color
    else:
        sh_stack = override_sh if override_sh is not None else G.get_features(params)
        if convert_shs_outside:
            colors = sh_lib.sh_to_rgb(state.active_sh_degree, sh_stack,
                                      params.xyz, cam.campos)
        else:
            shs = sh_stack

    return rasterize(
        params.xyz, opacity, G.get_semantic(params), cam,
        scales=scales, rotations=rotations, cov3d_precomp=cov3d,
        shs=shs, sh_degree=state.active_sh_degree, colors_precomp=colors,
        bg=bg, scale_modifier=scaling_modifier, ndc_offset=ndc_offset,
        active_mask=state.alive, config=config)


def render_batch(
    params: G.GaussianParams,
    state: G.GaussianState,
    cams: CameraView,
    *,
    bg: jnp.ndarray | None = None,
    config: RasterConfig = RasterConfig(),
    scaling_modifier: float = 1.0,
    override_opacity: jnp.ndarray | None = None,
) -> RasterOutput:
    """Forward-only batched render of B stacked same-resolution views —
    ops.rasterize_batch with the model activations applied once (the
    per-frame preprocess/binning fixed cost amortizes across the batch;
    image fields come back with a leading [B] axis)."""
    opacity = (override_opacity if override_opacity is not None
               else G.get_opacity(params))
    opacity = jnp.where(state.alive, opacity, 0.0)
    return rasterize_batch(
        params.xyz, opacity, G.get_semantic(params), cams,
        scales=G.get_scaling(params), rotations=G.get_rotation(params),
        shs=G.get_features(params), sh_degree=state.active_sh_degree,
        bg=bg, scale_modifier=scaling_modifier,
        active_mask=state.alive, config=config)
